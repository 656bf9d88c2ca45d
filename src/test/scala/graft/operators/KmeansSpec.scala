package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Seq[Long])*) =
    rows.toDF("vec_id", "q")

  test("hand case: two rounds of Lloyd converge to the known partition") {
    val p = pts(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)), (2L, Seq(1L, 0L)),
      (3L, Seq(9L, 0L)), (4L, Seq(5L, 3L)))
    val (assign, cents) = Kmeans.lloyd(p, k = 2, iters = 2)
    val a = assign.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // round 1: id4 ties (34 vs 34) -> min cid 0; means [2,1] and [9,0]
    // round 2 re-assigns against those, dists 5,1,2,0,13
    assert(a.toSeq === Seq((0L, 0, 5L), (1L, 1, 1L), (2L, 0, 2L),
      (3L, 1, 0L), (4L, 0, 13L)))
    assert(cents.map { case (c, v) => (c, v.toSeq) } ===
      Seq((0, Seq(2L, 1L)), (1, Seq(9L, 0L))))
  }

  test("empty cluster carries the previous centroid forward") {
    // duplicate init centroids: every tie -> cid 0, cluster 1 empties in
    // round 1 and must keep [0]; round 2 then re-captures the origin pts
    val p = pts((0L, Seq(0L)), (1L, Seq(0L)), (2L, Seq(7L)))
    val (assign, cents) = Kmeans.lloyd(p, k = 2, iters = 2)
    val a = assign.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // round-1 mean of all three is 7/3 = 2; carried c1 = [0] wins ids 0,1
    assert(a === Seq((0L, 1), (1L, 1), (2L, 0)))
    assert(cents.map { case (c, v) => (c, v.toSeq) } ===
      Seq((0, Seq(7L)), (1, Seq(0L))))
  }

  test("quantize floors float*1000 exactly (float widening, not rounding)") {
    val e = Seq((0L, Seq(-0.2f, 0.25f))).toDF("vec_id", "embedding")
    val q = Kmeans.quantize(e).collect().head.getSeq[Long](1)
    // -0.2f widens to -0.20000000298..., so floor(-200.000003) = -201
    assert(q === Seq(4000L - 201L, 4000L + 250L))
  }

  test("deterministic under repartition; summary accounts every point") {
    val emb = spark.range(0, 200).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        j => pmod(xxhash64(col("id") * 8 + j), lit(1000)).cast("double")
          / 1000.0 - 0.5).cast("array<float>").as("embedding"))
    val s1 = Kmeans.clusterSummary(spark, emb, k = 4, iters = 2)
      .orderBy("cid").collect().toSeq
    val s2 = Kmeans.clusterSummary(spark, emb.repartition(7), k = 4,
        iters = 2)
      .orderBy("cid").collect().toSeq
    assert(s1 === s2)
    assert(s1.map(_.getAs[Long]("n")).sum === 200L)
    assert(s1.map(_.getAs[Int]("cid")) === Seq(0, 1, 2, 3))
  }
}
