package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shannon character entropy per document — the information-density
  * quality signal (near-zero for single-character spam, ~log(alphabet)
  * for natural text; degenerate/repetitive documents sit in the low
  * tail). Complements [[graft.functions.TextFunctions.qualityFeatures]]
  * (surface ratios) and [[Repetition]] (n-gram repeats) with a
  * distribution-level measure.
  *
  * Shape: explode to (id, char) → two-phase count — the word-count
  * shuffle, ~alphabet rows per document after map-side combine — then a
  * per-document window over ≤ alphabet rows. Nothing wider than (id,
  * char, count) ever moves.
  *
  * Determinism contract (the [[LangModel]] recipe): per-char log
  * probabilities are scaled to integers (`round(ln(c/n)·1e6)`), the
  * per-document reduction `Σ c·lp` is an exact integer sum, and the two
  * trailing divisions happen once per document on exact inputs — so the
  * result replays bit-for-bit in any engine with the same `ln`.
  */
object Entropy {

  /** (idCol, n_chars, distinct_chars, entropy_nats, entropy_micro) per
    * document. `entropy_nats = -Σ (c/n)·ln(c/n)` over the document's
    * character histogram — the user-facing double; `entropy_micro` is
    * the same quantity in floor-scaled integer micro-nats (⌊−Σterm/n⌋
    * over the integer-scaled log terms), the engine-portable face an
    * oracle should hash (rounding the double ratio is one-ulp fragile
    * on decimal ties: Spark's BigDecimal HALF_UP and DuckDB's scaled
    * round disagree when the value sits exactly on a decimal
    * representation boundary, so floor-scaled integers are the only
    * cross-engine-stable face). NULL-safe (empty docs yield no
    * row — length gates own them).
    */
  def charEntropy(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val counts = Dedup.spread(
        docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), explode(split(col("__text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("id", "ch").agg(count(lit(1)).as("c"))
    // per-doc totals via a window over ≤ alphabet-size rows per doc
    val withN = counts.withColumn("n",
      sum("c").over(Window.partitionBy("id")))
    val lp = round(log(col("c").cast("double") / col("n")) * 1e6)
      .cast("long")
    withN.withColumn("term", col("c") * lp)
      .groupBy("id")
      .agg(max("n").as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        (-(sum("term").cast("double") / 1e6) / max("n"))
          .as("entropy_nats"),
        // exact micro-nats integer (floor of the integer-term ratio) —
        // the engine-portable face; rounding the double ratio is
        // one-ulp fragile on decimal ties (Spark BigDecimal HALF_UP vs
        // DuckDB scaled round — same invariant as avg_logp_u in
        // SparkEntry's language-model scoring query)
        floor(-sum("term").cast("double") / max("n")).cast("long")
          .as("entropy_micro"))
      .withColumnRenamed("id", idCol)
  }
}
