package graft.operators

import graft.SparkSpec

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int,
                  rounds: Int = 5) =
    Dbscan.cluster(pts.toDF("id", "x", "y"), eps, minPts, rounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap

  test("core / border / noise verdicts on a hand layout") {
    // two 4-point blobs (every point has 3 eps-neighbors → core at
    // minPts=4), one border point bridging both, one noise point
    val pts = Seq(
      (0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 1L), // blob A
      (4L, 5L, 0L), (5L, 6L, 0L), (6L, 5L, 1L), (7L, 6L, 1L), // blob B
      (8L, 3L, 0L),   // dist 2 to (1,0) and (5,0): border of BOTH
      (9L, 20L, 20L)) // noise
    val r = run(pts, eps = 2, minPts = 4)
    (0L to 3L).foreach(i => assert(r(i) == ((0L, 1))))
    (4L to 7L).foreach(i => assert(r(i) == ((4L, 1))))
    assert(r(8L) == ((0L, 0))) // min adjacent core cluster wins the tie
    assert(r(9L) == ((-1L, 0)))
  }

  test("neighbors straddling a cell boundary are found") {
    // eps=60: x=59 (cell 0) and x=61 (cell 1), distance 2 — the pair
    // must surface through the 9-cell probe
    val pts = Seq((0L, 59L, 0L), (1L, 61L, 0L), (2L, 60L, 50L))
    val r = run(pts, eps = 60, minPts = 3)
    assert(r.values.forall(_ == ((0L, 1))), s"expected one cluster: $r")
  }

  test("min-label flooding advances one hop per round (fixed-round pin)") {
    // chain of cores 2 apart; labels flood toward id 0 one hop per round
    val pts = Seq((0L, 0L, 0L), (1L, 2L, 0L), (2L, 4L, 0L), (3L, 6L, 0L))
    val r2 = run(pts, eps = 2, minPts = 2, rounds = 2)
    assert(Seq(r2(0L)._1, r2(1L)._1, r2(2L)._1, r2(3L)._1) ==
      Seq(0L, 0L, 0L, 1L))
    val r3 = run(pts, eps = 2, minPts = 2, rounds = 3)
    assert(r3.values.forall(_._1 == 0L))
  }

  test("synthesized layout: nonnegative, deterministic, blobs dense") {
    val embs = (0L until 500L).toDF("vec_id")
    val pts = Dbscan.synthesizePoints(embs)
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 500)
    assert(rows.forall { case (_, x, y) => x >= 0 && y >= 0 })
    val again = Dbscan.synthesizePoints(embs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // non-noise points sit inside their blob's 81-wide square
    rows.filter(_._1 % 17 != 0).foreach { case (id, x, y) =>
      assert(x / 1000 == (id % 8) % 4 && y / 1000 == (id % 8) / 4)
      assert(x % 1000 < 81 && y % 1000 < 81)
    }
  }

  test("full pipeline deterministic under repartition") {
    val embs = (0L until 300L).toDF("vec_id")
    val a = Dbscan.cluster(Dbscan.synthesizePoints(embs), 60, 4, 5)
      .orderBy("id").collect()
    val b = Dbscan.cluster(
        Dbscan.synthesizePoints(embs).repartition(7), 60, 4, 5)
      .orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
