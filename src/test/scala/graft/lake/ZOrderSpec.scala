package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("string rank is monotonic in unsigned byte order of the prefix") {
    // first bytes 0x01, 0x41 ('A'), 0x7A ('z'), 0xC3 ('é' in UTF-8): with a
    // rank that drops the top 2 prefix bits (ADVICE r01), "\u0001x" and "Ax"
    // alias — they differ only in bit 6 of the first byte
    val strs = Seq("\u0001x", "Ax", "zx", "éx")
    val docs = strs.toDF("s")
    val z = docs.withColumn("z", ZOrder.zValue(spark, docs, Seq("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def firstByte(s: String) = s.getBytes("UTF-8")(0) & 0xff
    assert(z.values.toSeq.distinct.size == 4, s"aliased ranks: $z")
    assert(strs.sortBy(z) == strs.sortBy(firstByte),
      s"rank order ${strs.sortBy(z)} != byte order ${strs.sortBy(firstByte)}")
  }

  test("multi-column z-value interleaves both dimensions") {
    val df = (0 until 256).map(i => (i.toLong, (255 - i).toLong))
      .toDF("x", "y")
    val z = df.withColumn("z", ZOrder.zValue(spark, df, Seq("x", "y")))
    // z must not be simply ordered by either single axis
    val ordered = z.orderBy("z").select("x").as[Long].collect()
    assert(ordered.toSeq != ordered.sorted.toSeq)
    assert(z.select(countDistinct("z")).as[Long].head() > 200)
  }
}
