package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Time-series downsampling for visualization — Largest-Triangle-Three-
  * Buckets (Steinarsson 2013, the plot-downsampler Grafana/Plotly
  * standardized on): keep first and last points, split the interior
  * into k−2 buckets, and from each bucket keep the point forming the
  * LARGEST triangle with the previously kept point and the NEXT
  * bucket's centroid — preserving visual extremes that uniform
  * sampling flattens.
  *
  * Exactness: with integer (t, v) every triangle-area comparison is
  * exact integer arithmetic — the next-bucket centroid (Σt/m, Σv/m)
  * enters CROSS-MULTIPLIED by m, so
  * `score = |(m·t_p − Σt)(v_c − v_p) − (t_p − t_c)(Σv − m·v_p)|`
  * with ties broken by smaller t then input order; products run in
  * BigInt (microsecond t × cent-scaled v exceeds 64 bits).
  *
  * Scale shape: one shuffle groups each series to its key, then the
  * selection is a single O(n) pass per series inside an executor —
  * LTTB's prev-point recursion is inherently sequential per series, and
  * per-series memory is the contract every server-side plot
  * downsampler accepts (series that don't fit get pre-bucketed by a
  * coarser aggregate first). Selection cost never touches other
  * series; k·#series rows come back.
  */
object Downsample {

  final case class TPoint(t: Long, v: Long)

  /** The pure selection core over a (t, v)-sorted series. `k < 3` or
    * `n ≤ k` returns the series unchanged. */
  def lttbSelect(pts: IndexedSeq[(Long, Long)], k: Int)
      : IndexedSeq[(Long, Long)] = {
    val n = pts.length
    if (k < 3 || n <= k) return pts
    val interior = n - 2
    val kb = k - 2
    def lo(i: Int): Int = 1 + ((i.toLong * interior) / kb).toInt
    val out = IndexedSeq.newBuilder[(Long, Long)]
    out += pts(0)
    var prev = pts(0)
    var i = 0
    while (i < kb) {
      val blo = lo(i)
      val bhi = lo(i + 1)
      // next anchor: the following bucket's centroid sums, or the last
      // point itself for the final bucket (m = 1)
      val (sx, sy, m): (BigInt, BigInt, Long) =
        if (i == kb - 1) (BigInt(pts(n - 1)._1), BigInt(pts(n - 1)._2), 1L)
        else {
          val nlo = lo(i + 1); val nhi = lo(i + 2)
          var x = BigInt(0); var y = BigInt(0)
          var j = nlo
          while (j < nhi) { x += pts(j)._1; y += pts(j)._2; j += 1 }
          (x, y, (nhi - nlo).toLong)
        }
      var best = pts(blo)
      var bestScore = BigInt(-1)
      var c = blo
      while (c < bhi) {
        val (tc, vc) = pts(c)
        val score =
          ((BigInt(m) * prev._1 - sx) * BigInt(vc - prev._2) -
            BigInt(prev._1 - tc) * (sy - BigInt(m) * prev._2)).abs
        if (score > bestScore) { best = pts(c); bestScore = score }
        c += 1
      }
      out += best
      prev = best
      i += 1
    }
    out += pts(n - 1)
    out.result()
  }

  /** Per-key LTTB: `tCol`/`vCol` must be (castable to) integers for the
    * exactness contract; rows come back as (key, t, v) with ≤ `buckets`
    * points per key. */
  def lttb(df: DataFrame, keyCol: String, tCol: String, vCol: String,
           buckets: Int): DataFrame = {
    require(buckets >= 3, "LTTB needs at least first + last + one bucket")
    val sel = udf((pts: Seq[Row]) =>
      lttbSelect(pts.map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq,
        buckets).map { case (t, v) => TPoint(t, v) })
    df.select(col(keyCol), col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .groupBy(col(keyCol))
      // struct sort = (t, v) lexicographic — the canonical series order
      .agg(sort_array(collect_list(struct(col("__t"), col("__v"))))
        .as("__pts"))
      .select(col(keyCol), explode(sel(col("__pts"))).as("__p"))
      .select(col(keyCol), col("__p.t").as(tCol), col("__p.v").as(vCol))
  }
}
