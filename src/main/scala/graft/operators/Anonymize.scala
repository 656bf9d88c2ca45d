package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity by stepped global recoding (Samarati/Sweeney): generalize
  * quasi-identifier columns up a fixed ladder until every equivalence
  * class holds ≥ k rows (after suppressing a bounded residue) — the
  * privacy gate a dataset passes before leaving the curation pipeline,
  * sitting beside [[Redact]] (PII spans) and [[graft.lake.Forget]]
  * (erasure) in the privacy family.
  *
  * Each quasi-identifier carries a LADDER of SQL generalization
  * expressions, finest first (`value → band → '*'`); step `s` applies
  * level `min(s, depth-1)` to every column (uniform stepping — the
  * deterministic, replayable member of the generalization-lattice
  * family; full lattice search is NP-hard and data-order-dependent).
  * The chosen step is the FIRST whose under-k residue is within
  * `maxSuppressedPpm` of the corpus; if none qualifies the coarsest
  * step wins. Suppression = dropping the residue rows, the standard
  * k-anonymity escape hatch for outlier classes.
  *
  * Scale shape: one map-side-combinable aggregate per ladder step
  * (steps ≤ ladder depth, a constant), each reducing to the QI-domain
  * cardinality, and TWO LONGS per step cross to the driver — the step
  * choice is metadata-priced, never a row funnel. The output is the
  * chosen step's class table (bounded by the generalized QI domain),
  * not row-level data.
  */
object Anonymize {

  /** One quasi-identifier: output name + generalization exprs, finest
    * first. Every level expr must yield a STRING-castable value and be
    * exactly replayable (integer bands, constants — no floats). */
  final case class Ladder(name: String, levels: Seq[String])

  /** Returns the chosen step's equivalence classes of size ≥ k as
    * (step, <QI names>..., n). Rows in under-k classes are suppressed;
    * their count is bounded by `maxSuppressedPpm` at the chosen step. */
  def kAnonymize(df: DataFrame, k: Long, ladders: Seq[Ladder],
                 maxSuppressedPpm: Long = 10000L): DataFrame = {
    require(ladders.nonEmpty && k >= 1)
    val steps = ladders.map(_.levels.length).max
    def qiAt(s: Int) = ladders.map(l =>
      expr(l.levels(math.min(s, l.levels.length - 1)))
        .cast("string").as(l.name))
    val names = ladders.map(_.name)
    def classesAt(s: Int) =
      df.select(qiAt(s): _*)
        .groupBy(names.map(col): _*).agg(count(lit(1)).as("n"))
    // per-step residue: one aggregate, two longs to the driver
    val chosen = (0 until steps).find { s =>
      val Array(r) = classesAt(s).agg(
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L)).as("viol"),
        coalesce(sum(col("n")), lit(0L)).as("tot")).collect()
      r.getLong(0) * 1000000L <= r.getLong(1) * maxSuppressedPpm
    }.getOrElse(steps - 1)
    classesAt(chosen).where(col("n") >= k)
      .withColumn("step", lit(chosen))
      .select((col("step") +: names.map(col)) :+ col("n"): _*)
  }

  /** k-anonymity AND t-closeness (Li, Li, Venkatasubramanian ICDE'07):
    * a class's sensitive-value DISTRIBUTION must sit within Earth
    * Mover's Distance `t` of the global one — l-diversity's fix for the
    * homogeneity attack still leaks by skew (a class that is 95% one
    * diagnosis "has 3 distinct values"); t-closeness bounds how far any
    * class's distribution drifts from the corpus.
    *
    * The sensitive attribute is ORDERED (an integer expression), where
    * EMD has the closed form (1/(m−1))·Σᵢ|Σ_{j≤i}(cⱼ/n − gⱼ/N)| over the
    * m ordered values. Everything stays EXACT integer arithmetic by
    * cross-multiplication: class passes ⟺
    * `Σᵢ|N·Cᵢ − n·Gᵢ| · 10⁶ ≤ t_ppm · n · N · (m−1)` with C/G cumulative
    * counts — products run in DECIMAL(38) (N·C ≤ N², safe past 10⁹
    * rows), the reported `emd_ppm` is the exact integral `div`.
    *
    * Scale shape: the global distribution is ONE m-row aggregate; each
    * step's check is one (QI-domain × m) grid — classes cross-joined
    * with the BROADCAST m-row distribution, cumulative windows
    * partitioned per class (m rows each; the only unpartitioned window
    * runs over the m global rows) — and two longs per step reach the
    * driver. Domain-priced throughout, never a row funnel.
    */
  def tCloseness(df: DataFrame, k: Long, tPpm: Long, ladders: Seq[Ladder],
                 sensitiveExpr: String,
                 maxSuppressedPpm: Long = 10000L): DataFrame = {
    require(ladders.nonEmpty && k >= 1 && tPpm >= 0)
    import org.apache.spark.sql.expressions.Window
    val steps = ladders.map(_.levels.length).max
    val names = ladders.map(_.name)
    def qiAt(s: Int) = ladders.map(ld =>
      expr(ld.levels(math.min(s, ld.levels.length - 1)))
        .cast("string").as(ld.name))
    val sens = expr(sensitiveExpr).cast("long").as("__sens")
    val glob = df.select(sens).groupBy("__sens")
      .agg(count(lit(1)).as("__g"))
      // NB: "__G" would silently REPLACE "__g" — Spark resolves column
      // names case-insensitively, so withColumn("__G") overwrites the
      // per-value count and sum("__g") then reads the cumulative
      .withColumn("__cg", sum("__g").over(Window.orderBy("__sens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // m rows, read once per ladder step
    val mRow = glob.agg(count(lit(1)), sum("__g")).collect()(0)
    val m = mRow.getLong(0)
    val bigN = mRow.getLong(1)
    require(m >= 2, "t-closeness needs ≥ 2 distinct sensitive values")
    def classesAt(s: Int): DataFrame = {
      val cs = df.select(qiAt(s) :+ sens: _*)
        .groupBy((names :+ "__sens").map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
      val sizes = cs.groupBy(names.map(col): _*).agg(sum("__cnt").as("n"))
      val grid = sizes.crossJoin(broadcast(glob))
        .join(cs, names :+ "__sens", "left")
        .na.fill(0L, Seq("__cnt"))
        .withColumn("__C", sum("__cnt").over(
          Window.partitionBy(names.map(col): _*).orderBy("__sens")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val term = abs(col("__C").cast("decimal(38,0)") * bigN -
        col("n").cast("decimal(38,0)") * col("__cg"))
      grid.groupBy(names.map(col) :+ col("n"): _*)
        .agg(sum(term).as("__D"))
        // exact integral division — decimal `/` rounds at its result
        // scale and a HALF_UP tick across an integer boundary would
        // corrupt floor(); `div` never rounds
        .withColumn("emd_ppm", expr(
          s"(__D * 1000000) div (CAST(n AS DECIMAL(38,0)) * $bigN * ${m - 1})"))
    }
    def ok = col("n") >= k && col("emd_ppm") <= tPpm
    val chosen = (0 until steps).find { s =>
      val Array(r) = classesAt(s).agg(
        coalesce(sum(when(!ok, col("n"))), lit(0L)).as("viol"),
        coalesce(sum(col("n")), lit(0L)).as("tot")).collect()
      r.getLong(0) * 1000000L <= r.getLong(1) * maxSuppressedPpm
    }.getOrElse(steps - 1)
    classesAt(chosen).where(ok)
      .withColumn("step", lit(chosen))
      .select((col("step") +: names.map(col)) ++
        Seq(col("n"), col("emd_ppm")): _*)
  }

  /** k-anonymity AND distinct l-diversity (Machanavajjhala et al.,
    * ICDE'06): a class additionally needs ≥ l DISTINCT values of the
    * sensitive column — k alone leaves the homogeneity attack open (a
    * class of 50 rows that all share one diagnosis identifies nothing
    * and discloses everything). Same stepped search, same budget; the
    * residue now counts rows failing EITHER bar. Output adds the
    * class's distinct-sensitive count. Scale shape unchanged: the
    * distinct count rides the same QI-domain aggregate
    * (count_distinct is map-side partial too). */
  def lDiversify(df: DataFrame, k: Long, l: Long, ladders: Seq[Ladder],
                 sensitiveCol: String,
                 maxSuppressedPpm: Long = 10000L): DataFrame = {
    require(ladders.nonEmpty && k >= 1 && l >= 1)
    val steps = ladders.map(_.levels.length).max
    def qiAt(s: Int) = ladders.map(ld =>
      expr(ld.levels(math.min(s, ld.levels.length - 1)))
        .cast("string").as(ld.name))
    val names = ladders.map(_.name)
    def classesAt(s: Int) =
      df.select(qiAt(s) :+ col(sensitiveCol).as("__sens"): _*)
        .groupBy(names.map(col): _*)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("__sens")).as("n_sens"))
    def ok = col("n") >= k && col("n_sens") >= l
    val chosen = (0 until steps).find { s =>
      val Array(r) = classesAt(s).agg(
        coalesce(sum(when(!ok, col("n"))), lit(0L)).as("viol"),
        coalesce(sum(col("n")), lit(0L)).as("tot")).collect()
      r.getLong(0) * 1000000L <= r.getLong(1) * maxSuppressedPpm
    }.getOrElse(steps - 1)
    classesAt(chosen).where(ok)
      .withColumn("step", lit(chosen))
      .select((col("step") +: names.map(col)) ++
        Seq(col("n"), col("n_sens")): _*)
  }
}
