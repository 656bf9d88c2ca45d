package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mann–Kendall trend detection (Mann 1945 / Kendall's S) — the
  * standard nonparametric monotone-trend test a metrics pipeline runs
  * beside [[Changepoint]]'s level-shift CUSUM: over a time-ordered
  * series, `S = Σ_{i<j} sign(v_j − v_i)`; strongly positive S means a
  * rising trend, near 0 none, with no distributional assumptions and
  * full robustness to outliers (only signs enter). S is a pure INTEGER
  * statistic — exactly replayable cross-engine; the normal-approx
  * z-score needs a square root, so callers compare S² against
  * z²·Var(S) offline (the q_abtest cross-multiplication recipe) or use
  * the S/n(n−1)/2 ratio (Kendall's tau numerator) this emits in ppm.
  *
  * Scale shape: the textbook definition is all-pairs, but S decomposes
  * as `concordant − discordant`, both countable in O(n log n) by
  * merge-sorting the value sequence and counting inversions — the
  * implementation here, run per series inside an executor after one
  * key shuffle (the [[Downsample]] per-series contract). Ties
  * contribute 0 automatically (they are neither inversions nor
  * in-order pairs).
  */
object Trend {

  /** Exact S via inversion counting: S = (#in-order pairs) −
    * (#inverted pairs), ties excluded from both. O(n log n). */
  def mannKendallS(vs: IndexedSeq[Long]): Long = {
    val n = vs.length
    if (n < 2) return 0L
    // count (inversions, ties) with a merge sort; in-order pairs are
    // the remainder of n(n−1)/2
    var inversions = 0L
    var ties = 0L
    def merge(a: Array[Long], lo: Int, mid: Int, hi: Int,
              tmp: Array[Long]): Unit = {
      var i = lo; var j = mid; var k = lo
      while (i < mid && j < hi) {
        if (a(i) < a(j)) { tmp(k) = a(i); i += 1 }
        else if (a(i) == a(j)) {
          // equal heads: count a(i)'s ties against the right run's
          // EQUAL PREFIX, then emit the left element — each later equal
          // left element re-counts the same prefix, so every cross tie
          // pair is counted exactly once
          var jj = j
          while (jj < hi && a(jj) == a(i)) { ties += 1; jj += 1 }
          tmp(k) = a(i); i += 1
        } else {
          // a(i) > a(j): since the left run is sorted, EVERY remaining
          // left element strictly exceeds a(j) — (mid − i) inversions,
          // no equals possible among them
          inversions += (mid - i).toLong
          tmp(k) = a(j); j += 1
        }
        k += 1
      }
      while (i < mid) { tmp(k) = a(i); i += 1; k += 1 }
      while (j < hi) { tmp(k) = a(j); j += 1; k += 1 }
      System.arraycopy(tmp, lo, a, lo, hi - lo)
    }
    def sort(a: Array[Long], lo: Int, hi: Int, tmp: Array[Long]): Unit =
      if (hi - lo > 1) {
        val mid = lo + (hi - lo) / 2
        sort(a, lo, mid, tmp); sort(a, mid, hi, tmp)
        merge(a, lo, mid, hi, tmp)
      }
    val arr = vs.toArray
    sort(arr, 0, n, new Array[Long](n))
    val total = n.toLong * (n - 1) / 2
    val inOrder = total - inversions - ties
    inOrder - inversions
  }

  /** Per-key Mann–Kendall over (t, v): emits (key, n, s,
    * tau_ppm = S·10⁶ div (n(n−1)/2)) — the Kendall-tau numerator ratio
    * in exact integer ppm (negative for falling trends; `div`
    * truncates toward zero in both engines). */
  def mannKendall(df: DataFrame, keyCol: String, tCol: String,
                  vCol: String): DataFrame = {
    val mk = udf((pts: Seq[Row]) => {
      val vs = pts.map(r => (r.getLong(0), r.getLong(1)))
        .sorted.map(_._2).toIndexedSeq
      val n = vs.length.toLong
      val s = mannKendallS(vs)
      val denom = n * (n - 1) / 2
      (n, s, if (denom == 0) 0L else s * 1000000L / denom)
    })
    df.select(col(keyCol), col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__t"), col("__v"))))
        .as("__pts"))
      .select(col(keyCol), mk(col("__pts")).as("__mk"))
      .select(col(keyCol), col("__mk._1").as("n"), col("__mk._2").as("s"),
        col("__mk._3").as("tau_ppm"))
  }
}
