package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-cardinality sketch — the mergeable counting
  * structure for "how many distinct urls / tokens / shingles" questions
  * when the exact `countDistinct` exchange (one row per distinct value)
  * is the bottleneck at vocabulary scale. The reference engine has no
  * sketch surface; judged pipeline extension, sibling of [[Cms]] (point
  * frequencies) and Misra–Gries (heavy hitters): together the three cover
  * the classic streaming-summary triad. Flajolet et al., AofA 2007.
  *
  * Why a sketch instead of countDistinct: exact distinct shuffles the
  * full distinct domain (billions of rows at 100 TB); HLL's map-side
  * partial aggregate collapses every partition into ≤ m (register, rho)
  * pairs before the only exchange, so the wire cost is m rows per
  * partition REGARDLESS of cardinality, and per-group sketches are
  * register-wise max-mergeable across shards/days (the property that lets
  * a continuous crawl keep one running sketch per source).
  *
  * Exactness/portability: the hash is the repo's PORTABLE 60-bit md5 key
  * (`conv(md5[:15hex])`, the same family [[Cms]] reduces mod p — HLL
  * keeps all 60 bits); register index = key mod m,
  * rank input w = key div m (a 60−b bit value), and
  * rho = (60−b)+1 − length(bin(w)) — pure integer/string ops any engine
  * replays bit-for-bit. The harmonic sum is kept in EXACT integer units:
  * sum_j 2^(maxRho − M_j) ≤ m·2^maxRho < 2^63, so the oracle face carries
  * integer (s_scaled, zero_regs) anchors; only the final estimate touches
  * doubles (identical IEEE ops both engines, round(6)).
  */
object Hll {

  /** Max rho for b index bits over the 60-bit key: (60-b) value bits +1. */
  def maxRho(b: Int): Int = 61 - b

  /** Raw portable 60-bit md5 key (no mod-p reduction — HLL consumes all
    * bits: low b index, high 60−b rank). */
  private def rawKey(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-group register table: one row per (group…, idx) with the max
    * rank observed — ≤ groups×m rows cross the only exchange (map-side
    * partial max collapses first). Registers never observed are ABSENT
    * (semantically rho 0); [[estimate]] accounts for them.
    * Mergeable: union register tables from shards and re-apply
    * (groupBy idx → max(rho)) — see HllSpec's merge property. */
  def registers(df: DataFrame, valueCol: String, b: Int,
                groupCols: Seq[String] = Nil): DataFrame = {
    require(b >= 4 && b <= 16, s"b=$b out of range")
    val m = 1L << b
    val mr = maxRho(b)
    val rho = when(col("w") === 0, lit(mr))
      .otherwise(lit(mr) - length(bin(col("w"))))
    df.select((groupCols.map(col) :+ rawKey(col(valueCol)).as("key")): _*)
      .select((groupCols.map(col) :+ (col("key") % lit(m)).as("idx")
        :+ expr(s"key div ${m}L").as("w")): _*)
      .select((groupCols.map(col) :+ col("idx")
        :+ rho.cast("int").as("rho")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  /** Cardinality estimate per group from a register table.
    * Integer anchors: `s_scaled` = Σ_j 2^(maxRho − M_j) over all m
    * registers (absent ⇒ M_j = 0 ⇒ term 2^maxRho) — exact in a long;
    * `zero_regs` = count of absent registers. Estimate = the classic
    * α_m·m²/Σ2^(−M_j) with the small-range linear-counting correction
    * (E ≤ 2.5m and V>0 ⇒ m·ln(m/V)); both branches are the same IEEE
    * double ops on integer inputs in any engine. */
  def estimate(regs: DataFrame, b: Int,
               groupCols: Seq[String] = Nil): DataFrame = {
    val m = 1L << b
    val alpha = m match {
      case 16L => 0.673
      case 32L => 0.697
      case 64L => 0.709
      case _   => 0.7213 / (1.0 + 1.079 / m.toDouble)
    }
    val mr = maxRho(b)
    val term = expr(s"cast(shiftleft(cast(1 as bigint), $mr - rho) as bigint)")
    val grouped =
      if (groupCols.isEmpty)
        regs.agg(sum(term).as("s_present"), count(lit(1)).as("n_present"))
      else regs.groupBy(groupCols.map(col): _*)
        .agg(sum(term).as("s_present"), count(lit(1)).as("n_present"))
    val sScaled = col("s_present") + (lit(m) - col("n_present")) * lit(1L << mr)
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
      pow(lit(2.0), lit(mr.toDouble)) / col("s_scaled").cast("double")
    grouped
      .withColumn("s_scaled", sScaled)
      .withColumn("zero_regs", (lit(m) - col("n_present")).cast("long"))
      .withColumn("est", round(
        when(raw <= lit(2.5 * m.toDouble) && col("zero_regs") > 0,
          lit(m.toDouble) *
            log(lit(m.toDouble) / col("zero_regs").cast("double")))
          .otherwise(raw), 6))
      .select((groupCols.map(col) :+ col("s_scaled") :+ col("zero_regs")
        :+ col("est")): _*)
  }

  /** registers → estimate in one call. */
  def distinctEstimate(df: DataFrame, valueCol: String, b: Int,
                       groupCols: Seq[String] = Nil): DataFrame =
    estimate(registers(df, valueCol, b, groupCols), b, groupCols)
}
