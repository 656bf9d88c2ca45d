package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch: the point-query upper-bound guarantee against exact
  * counts, grid-size bound, and sketch mergeability (cell-wise addition).
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  // zipfian-ish occurrences: term_i appears 200/(i+1) times
  private def occ(lo: Int, hi: Int) =
    (lo until hi).flatMap(i => Seq.fill(200 / (i + 1))(s"term$i"))
      .toDF("term")

  test("estimates never underestimate; exact when the grid is wide") {
    val o = occ(0, 30)
    val probes = (0 until 30).map(i => s"term$i")
    val exact = o.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tight grid (width 8): upper bound must hold for EVERY probe
    val tight = Cms.estimate(Cms.sketch(o, width = 8, depth = 4),
      probes, width = 8, depth = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach(t => assert(tight(t) >= exact(t),
      s"$t: est ${tight(t)} < exact ${exact(t)}"))
    // wide grid (width 4096, 30 terms): collisions are possible but the
    // depth-4 min makes a wrong estimate on every row vanishingly
    // unlikely for this fixed hash family — pin exactness
    val wide = Cms.estimate(Cms.sketch(o, width = 4096, depth = 4),
      probes, width = 4096, depth = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach(t => assert(wide(t) == exact(t)))
    // an absent term estimates 0 on a wide grid
    val miss = Cms.estimate(Cms.sketch(o, width = 4096, depth = 4),
      Seq("never-seen"), width = 4096, depth = 4).head.getLong(1)
    assert(miss == 0L)
  }

  test("grid is bounded by depth x width and conserves total mass per row") {
    val o = occ(0, 30)
    val total = o.count()
    val grid = Cms.sketch(o, width = 8, depth = 3)
    assert(grid.count() <= 3 * 8)
    val perRow = grid.groupBy("row_i").agg(sum("cnt")).collect()
      .map(r => r.getLong(1))
    assert(perRow.length == 3 && perRow.forall(_ == total))
  }

  test("sketch of a union equals the cell-wise sum of the sketches") {
    val a = occ(0, 15)
    val b = occ(10, 30)
    val merged = Cms.sketch(a.unionAll(b), width = 16, depth = 4)
    val summed = Cms.sketch(a, width = 16, depth = 4)
      .unionAll(Cms.sketch(b, width = 16, depth = 4))
      .groupBy("row_i", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.except(summed).count() == 0 &&
      summed.except(merged).count() == 0)
  }
}
