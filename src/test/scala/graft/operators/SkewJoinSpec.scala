package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly what the plain join returns") {
    val rnd = new scala.util.Random(5)
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (rnd.nextDouble() < 0.9) 7L else rnd.nextLong(100), i))
      .toDF("k", "lv")
    val right = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "rv")

    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
        .select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val salted = SkewJoin.saltedJoin(left, right, Seq("k"),
          saltFactor = 8, joinType = jt)
        .select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(salted == plain, s"join type $jt")
    }
  }

  test("salting spreads the hot key across partitions") {
    val left = (1 to 1000).map(i => (7L, i)).toDF("k", "lv") // all one key
    val right = Seq((7L, "x")).toDF("k", "rv")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltFactor = 4)
    // post-join rows originated from 4 distinct salt groups: verify the
    // pre-join salted left had all 4 salts populated
    val salts = left.withColumn("__salt",
        pmod(xxhash64(left.columns.map(col): _*), lit(4)))
      .groupBy("__salt").count().collect()
    assert(salts.length == 4)
    assert(salts.map(_.getLong(1)).max < 1000) // no single group holds all
    assert(salted.count() == 1000)
  }
}
