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
