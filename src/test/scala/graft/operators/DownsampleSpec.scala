package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  test("short series pass through; first and last are always kept") {
    val pts = (0L to 5L).map(t => (t, t * 2)).toIndexedSeq
    assert(Downsample.lttbSelect(pts, 10) === pts)
    val long = (0L to 99L).map(t => (t, t % 7)).toIndexedSeq
    val sel = Downsample.lttbSelect(long, 10)
    assert(sel.length === 10)
    assert(sel.head === long.head && sel.last === long.last)
    // selections are in series order and are a subset of the input
    assert(sel === sel.sortBy(p => (p._1, p._2)))
    assert(sel.forall(long.contains))
  }

  test("hand case: the largest-triangle point wins its bucket") {
    // 5 points, k=3 → ONE interior bucket (positions 1..3), anchor = the
    // last point. prev = (0,0), anchor = (40,0): the triangle area is
    // maximized by the point farthest off the prev→anchor baseline —
    // the v=100 spike, not its flat neighbors.
    val pts = IndexedSeq((0L, 0L), (10L, 1L), (20L, 100L), (30L, 1L),
      (40L, 0L))
    assert(Downsample.lttbSelect(pts, 3) ===
      IndexedSeq((0L, 0L), (20L, 100L), (40L, 0L)))
  }

  test("spikes survive where uniform sampling would drop them") {
    // a flat series with one huge spike at a position uniform k-sampling
    // (every n/k-th point) would skip
    val n = 1000
    val pts = (0 until n).map(i =>
      (i.toLong, if (i == 457) 100000L else (i % 3).toLong)).toIndexedSeq
    val sel = Downsample.lttbSelect(pts, 20)
    assert(sel.exists(_._2 == 100000L), "the spike must be kept")
    assert(sel.length === 20)
  }

  test("the DataFrame face groups per key and matches the core") {
    val rows = for {
      k <- Seq("a", "b"); i <- 0 until 200
    } yield (k, i.toLong * 1000L,
      if (k == "a" && i == 77) 9999L else (i % 5).toLong)
    val df = rows.toDF("k2", "t", "v")
    val out = Downsample.lttb(df, "k2", "t", "v", buckets = 12)
      .orderBy("k2", "t")
      .as[(String, Long, Long)].collect()
    assert(out.count(_._1 == "a") === 12)
    assert(out.count(_._1 == "b") === 12)
    // matches the pure core per key
    val aPts = rows.filter(_._1 == "a").map(r => (r._2, r._3))
      .sortBy(identity).toIndexedSeq
    assert(out.filter(_._1 == "a").map(r => (r._2, r._3)).toIndexedSeq
      === Downsample.lttbSelect(aPts, 12))
    // the planted spike survives
    assert(out.exists(r => r._1 == "a" && r._3 == 9999L))
  }
}
