package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive between-join") {
    val rnd = new scala.util.Random(23)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "p")
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 20)
    }.toDF("iid", "lo", "hi")

    val naive = points.join(ivs,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (w <- Seq(0.5, 5.0, 50.0)) {
      val bucketed = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(bucketed == naive, s"bucketWidth $w")
    }
  }

  test("plan is an equi-join on the bucket, not a nested-loop join") {
    val points = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "p")
    val ivs = (1 to 10).map(i => (i.toLong, i * 10.0, i * 10.0 + 15))
      .toDF("iid", "lo", "hi")
    val naivePlan = points.join(ivs,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      "premise: the naive between-join nested-loops")
    val plan = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    assert(plan.contains("Join") && plan.contains("__bucket"))
  }

  test("boundary points, negative domains and degenerate intervals") {
    val points = Seq((1L, -10.0), (2L, 0.0), (3L, 10.0)).toDF("pid", "p")
    val ivs = Seq(
      (1L, -10.0, 0.0),   // closed ends: catches -10 and 0
      (2L, 0.0, 10.0),    // shares boundary 0 with iv 1, 10 with iv 3
      (3L, 10.0, 10.0),   // degenerate single-point interval
      (4L, 5.0, 4.0)      // inverted: dropped, never matches
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 3.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L), (3L, 3L)))
  }
}
