package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QnormSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: per-source CDF in ppm, ties share the upper step") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("b", 5L, 10L), ("b", 6L, 100L))
      .toDF("source", "doc_id", "score")
    val r = Qnorm.quantileNormalize(df, "source", "score")
      .orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("q_ppm")))
    // source a (n=4): 10 -> 1/4, both 20s -> 3/4, 30 -> 4/4
    // source b (n=2): 10 -> 1/2, 100 -> 2/2 — same raw 10, different ppm
    assert(r.toSeq === Seq((1L, 250000L), (2L, 750000L), (3L, 750000L),
      (4L, 1000000L), (5L, 500000L), (6L, 1000000L)))
  }

  test("normalization is a pure function of the (source, score) multiset") {
    val df = spark.range(0, 500).select(
      concat(lit("s"), pmod(col("id"), lit(4))).as("source"),
      col("id").as("doc_id"),
      pmod(xxhash64(col("id")), lit(50)).as("score"))
    val a = Qnorm.quantileNormalize(df, "source", "score")
      .orderBy("doc_id").collect().toSeq
    val b = Qnorm.quantileNormalize(df.repartition(13), "source", "score")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // every source's max score lands exactly at 10^6
    val tops = Qnorm.quantileNormalize(df, "source", "score")
      .groupBy("source").agg(max("q_ppm").as("m")).collect()
    assert(tops.forall(_.getAs[Long]("m") === 1000000L))
  }
}
