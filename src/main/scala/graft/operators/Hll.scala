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
  * integer (s_scaled, zero_regs, est_milli) anchors. `est_milli` is the
  * RAW formula only (multiply/divide/floor — deterministic IEEE in any
  * engine); the linear-counting branch of `est` uses ln(), which Java
  * and DuckDB libm round differently on ~0.2% of inputs (measured: 3 of
  * 1341 (m,V) pairs differ by 1 ulp), so the corrected estimate is the
  * USER face, never the hashed one — its branch logic is pinned by
  * HllSpec and its inputs (s_scaled, zero_regs) are fully hashed.
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
    require(!groupCols.exists(Set("idx", "rho")),
      "groupCols collide with the register output columns idx/rho")
    val m = 1L << b
    val mr = maxRho(b)
    val rho = when(col("__hll_w") === 0, lit(mr))
      .otherwise(lit(mr) - length(bin(col("__hll_w"))))
    df.select((groupCols.map(col)
        :+ rawKey(col(valueCol)).as("__hll_key")): _*)
      .select((groupCols.map(col) :+ (col("__hll_key") % lit(m)).as("idx")
        :+ expr(s"__hll_key div ${m}L").as("__hll_w")): _*)
      .select((groupCols.map(col) :+ col("idx")
        :+ rho.cast("int").as("rho")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  /** Cardinality estimate per group from a register table.
    * Integer anchors: `s_scaled` = Σ_j 2^(maxRho − M_j) over all m
    * registers (absent ⇒ M_j = 0 ⇒ term 2^maxRho) — exact in a long;
    * `zero_regs` = count of absent registers; `est_milli` =
    * ⌊1000·α_m·m²·2^maxRho/s_scaled⌋ — the raw formula in floor-scaled
    * integer units, deterministic IEEE multiply/divide in any engine
    * (this is the hashable face). `est` is the USER estimate: raw with
    * the small-range linear-counting correction (E ≤ 2.5m and V>0 ⇒
    * m·ln(m/V)) — ln() is 1-ulp engine-dependent, so `est` must stay
    * out of cross-engine hashes (see the object scaladoc). */
  def estimate(regs: DataFrame, b: Int,
               groupCols: Seq[String] = Nil): DataFrame = {
    require(!groupCols.exists(Set("s_scaled", "zero_regs", "est",
      "est_milli")), "groupCols collide with the estimate output columns")
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
        regs.agg(sum(term).as("__hll_sp"), count(lit(1)).as("__hll_np"))
      else regs.groupBy(groupCols.map(col): _*)
        .agg(sum(term).as("__hll_sp"), count(lit(1)).as("__hll_np"))
    val sScaled = col("__hll_sp") + (lit(m) - col("__hll_np")) * lit(1L << mr)
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
      pow(lit(2.0), lit(mr.toDouble)) / col("s_scaled").cast("double")
    grouped
      .withColumn("s_scaled", sScaled)
      .withColumn("zero_regs", (lit(m) - col("__hll_np")).cast("long"))
      .withColumn("est_milli", floor(raw * lit(1000.0)).cast("long"))
      .withColumn("est",
        when(raw <= lit(2.5 * m.toDouble) && col("zero_regs") > 0,
          lit(m.toDouble) *
            log(lit(m.toDouble) / col("zero_regs").cast("double")))
          .otherwise(raw))
      .select((groupCols.map(col) :+ col("s_scaled") :+ col("zero_regs")
        :+ col("est_milli") :+ col("est")): _*)
  }

  /** registers → estimate in one call. */
  def distinctEstimate(df: DataFrame, valueCol: String, b: Int,
                       groupCols: Seq[String] = Nil): DataFrame =
    estimate(registers(df, valueCol, b, groupCols), b, groupCols)
}
