package graft.operators

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vs: IndexedSeq[Long]): Long =
    (for { i <- vs.indices; j <- i + 1 until vs.length }
      yield java.lang.Long.signum(vs(j) - vs(i)).toLong).sum

  test("hand cases: monotone, flat, ties, a known mixed series") {
    assert(Trend.mannKendallS(IndexedSeq(1L, 2L, 3L, 4L)) === 6L)
    assert(Trend.mannKendallS(IndexedSeq(4L, 3L, 2L, 1L)) === -6L)
    assert(Trend.mannKendallS(IndexedSeq(7L, 7L, 7L)) === 0L)
    assert(Trend.mannKendallS(IndexedSeq(5L)) === 0L)
    assert(Trend.mannKendallS(IndexedSeq.empty) === 0L)
    // (3,1,4,1,5): pairs — (3,1)-1 (3,4)+1 (3,1)-1 (3,5)+1 (1,4)+1
    // (1,1)0 (1,5)+1 (4,1)-1 (4,5)+1 (1,5)+1 → S = 3
    assert(Trend.mannKendallS(IndexedSeq(3L, 1L, 4L, 1L, 5L)) === 3L)
  }

  test("merge-sort counting ≡ the all-pairs definition, ties included") {
    // deterministic pseudo-random with heavy ties (values mod 13)
    var x = 12345L
    val vs = IndexedSeq.fill(500) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      math.floorMod(x >> 33, 13L)
    }
    assert(Trend.mannKendallS(vs) === brute(vs))
    // and a no-ties permutation
    val perm = vs.zipWithIndex.map { case (v, i) => v * 1000 + i }
    assert(Trend.mannKendallS(perm) === brute(perm))
  }

  test("the DataFrame face orders by (t, v) and scales by tau_ppm") {
    val rows = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L), ("up", 4L, 40L),
      ("dn", 1L, 9L), ("dn", 2L, 5L), ("dn", 3L, 1L))
    val out = Trend.mannKendall(rows.toDF("k2", "t", "v"), "k2", "t", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("up") === ((4L, 6L, 1000000L)))
    assert(out("dn") === ((3L, -3L, -1000000L)))
  }
}
