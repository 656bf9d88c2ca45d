package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization of quality scores — the
  * calibration step a mixed-corpus curation pipeline needs before it
  * can compare or threshold scores across heterogeneous sources (a
  * "7" from one scorer distribution is not a "7" from another; CCNet
  * makes the same move with per-language perplexity buckets). Each
  * document's score maps to its source-conditional CDF position in
  * integer ppm: `q_ppm = ⌊10⁶ · |{score' ≤ score}| / n_source⌋`. Equal
  * scores share a ppm by construction (ties take the upper CDF step),
  * so the result is a pure function of the (source, score) multiset.
  *
  * Scale shape — the point of this implementation: NO per-row rank
  * window. Scores aggregate to (source, score, count) first (map-side
  * combinable; cardinality = value domain, not corpus), the running
  * CDF is a window over THOSE aggregated rows (per source, #distinct
  * scores rows — bounded however large the corpus), and documents get
  * their ppm back via one hash join on (source, score). A
  * percent_rank over raw rows would be a per-source global sort of
  * the corpus; this is the histogram-CDF form of the same answer.
  */
object Qnorm {

  /** Attach `q_ppm` (source-conditional CDF position in ppm) to every
    * row. `scoreCol` must be integral for exact replay. */
  def quantileNormalize(df: DataFrame, keyCol: String, scoreCol: String)
      : DataFrame = {
    val hist = df.groupBy(keyCol, scoreCol)
      .agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cle",
      sum("__c").over(Window.partitionBy(keyCol).orderBy(scoreCol)))
    val ns = df.groupBy(keyCol).agg(count(lit(1)).as("__n"))
    df.join(cum.select(col(keyCol), col(scoreCol), col("__cle")),
        Seq(keyCol, scoreCol))
      .join(ns, Seq(keyCol))
      .withColumn("q_ppm", expr("__cle * 1000000L div __n"))
      .drop("__cle", "__n")
  }
}
