package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold-sweep evaluation of a scoring model — the
  * precision/recall curve a pipeline owner reads before picking the
  * quality-filter cutoff (a filter that keeps 99% at threshold t and
  * 40% at t' is a corpus-size decision, not a tuning detail). Completes
  * the in-engine evaluation family (q_ann_recall for retrieval,
  * q_dedup_eval for candidate generation) with the classifier loop.
  *
  * Exactness: thresholds cut the raw decision SCORE (the classifier's
  * margin — an affine map of the features in IEEE doubles, which
  * +,-,*,/ reproduce bit-for-bit on any engine), NOT the sigmoid
  * probability: `exp` is libm, and q_hll measured cross-engine libm
  * disagreeing by 1 ulp — a hazard this operator refuses to put under
  * a comparison. Counts are integers; the derived precision/recall are
  * exact parts-per-million via integer division (−1 sentinel for the
  * empty denominator, the ANSI-safe convention q_dedup_eval set).
  *
  * Scale shape: ONE pass over the scored corpus — each row fans out to
  * #thresholds (a literal array explode, no join), and the aggregate
  * carries #thresholds × 4 counters through the exchange. A 100 TB
  * eval prices as the scan plus a metadata-sized shuffle.
  */
object ModelEval {

  /** Confusion counts + precision/recall per threshold. `scored` needs
    * a boolean `labelCol` (ground truth) and a double `scoreCol`;
    * predicted-positive is `score >= t`. Returns one row per threshold:
    * (threshold, tp, fp, fn, tn, precision_ppm, recall_ppm).
    */
  def confusionSweep(scored: DataFrame, labelCol: String,
                     scoreCol: String,
                     thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty)
    val t = array(thresholds.map(lit): _*)
    scored
      .select(col(labelCol).as("__y"), col(scoreCol).as("__s"),
        explode(t).as("threshold"))
      .groupBy("threshold")
      .agg(
        sum(when(col("__y") && col("__s") >= col("threshold"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(!col("__y") && col("__s") >= col("threshold"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__y") && col("__s") < col("threshold"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(!col("__y") && col("__s") < col("threshold"), 1L)
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000L div (tp + fp)")).otherwise(lit(-1L))
          .as("precision_ppm"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000L div (tp + fn)")).otherwise(lit(-1L))
          .as("recall_ppm"))
  }
}
