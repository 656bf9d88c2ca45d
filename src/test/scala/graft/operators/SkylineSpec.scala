package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def frontierIds(rows: Seq[(Long, Long, Long)],
                          buckets: Int = 32): Set[Long] =
    Skyline.frontier(rows.toDF("id", "x", "y"), "x", "y", buckets)
      .select("id").as[Long].collect().toSet

  test("textbook frontier on a known set") {
    // (1,5) (2,3) (4,1) form the staircase; (3,4) is beaten by (2,3);
    // (5,5) by everything
    val ids = frontierIds(Seq(
      (1L, 1L, 5L), (2L, 2L, 3L), (3L, 3L, 4L), (4L, 4L, 1L), (5L, 5L, 5L)))
    assert(ids === Set(1L, 2L, 4L))
  }

  test("duplicate frontier points are both kept; ties on one axis prune") {
    val ids = frontierIds(Seq(
      (1L, 1L, 5L), (2L, 1L, 5L),  // identical pair — mutually non-dominated
      (3L, 1L, 7L),                // same x, worse y — dominated by 1/2
      (4L, 0L, 5L)))               // same y as 1/2, better x — dominates them
    assert(ids === Set(4L))
  }

  test("matches the brute-force dominance test on seeded random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map(i =>
      (i, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = rows.toDF("id", "x", "y")
    val q = df.select(col("id").as("qid"), col("x").as("qx"),
      col("y").as("qy"))
    val brute = df.join(q,
        col("qx") <= col("x") && col("qy") <= col("y") &&
          (col("qx") < col("x") || col("qy") < col("y")), "left_anti")
      .select("id").as[Long].collect().toSet
    // bucket counts that exercise 1-band, balanced and degenerate widths
    for (b <- Seq(1, 4, 32, 1000))
      assert(frontierIds(rows, b) === brute, s"buckets=$b")
  }

  test("empty and single-row inputs") {
    assert(frontierIds(Nil) === Set.empty[Long])
    assert(frontierIds(Seq((7L, 3L, 3L))) === Set(7L))
  }

  test("plan carries no cartesian product and no unpartitioned window") {
    val df = (1L to 100L).map(i => (i, i % 17, i % 13)).toDF("id", "x", "y")
    val plan = Skyline.frontier(df, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only global-ordering window is the P-row bucket prefix —
    // per-row windows must all be partitioned by the band column
    val winLines = plan.linesIterator.filter(_.contains("Window")).toList
    assert(winLines.forall(l => !l.contains("windowspecdefinition(x#") ||
      l.contains("__b")), winLines.mkString("\n"))
  }
}
