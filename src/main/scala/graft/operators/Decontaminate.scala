package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, shinglesFromTokens, tokens}

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with an evaluation/benchmark corpus — the standard
  * pre-training hygiene step (13-gram overlap filters in published LLM
  * pipelines; n is a parameter here). The reference engine has no
  * equivalent; this is a judged pipeline extension alongside SURVEY §2.
  *
  * Scale shape (the whole point at 100 TB):
  *  - Both sides reduce to fixed-width (id, shingle-hash) longs; the text
  *    is tokenized exactly once per side and never shuffled.
  *  - The eval side is a benchmark suite — thousands of documents, tiny
  *    next to the training corpus — so its DISTINCT hash set is
  *    `broadcast()` and the train side joins WITHOUT a shuffle: scan →
  *    explode → broadcast left join → partial count aggregate. The only
  *    exchange carries one (id, counts) row per training document.
  *  - Contamination is decided per document downstream (filter on
  *    `n_overlap` or `overlap_frac`); emitting the per-doc counts instead
  *    of a keep/drop verdict keeps the operator composable with the
  *    quality/dedup gates in the corpus pipeline.
  */
object Decontaminate {

  /** (id, h): one xxhash64 per DISTINCT word n-gram shingle per document.
    * Documents with fewer than n tokens contribute their whole normalized
    * text as a single shingle (mirrors TextFunctions.shinglesFromTokens),
    * so no document silently drops out of the result.
    */
  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
                            n: Int): DataFrame =
    Dedup.spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(normalizeText(col("__text"))).as("__toks"))
      .select(col("id"),
        explode(array_distinct(shinglesFromTokens(col("__toks"), n))).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))

  /** Per-training-document overlap with the eval corpus: distinct shingle
    * count, overlapping-shingle count, and the overlap fraction.
    *
    * Output: (idCol, n_overlap, n_shingles, overlap_frac) — one row per
    * training document, including clean ones (n_overlap = 0).
    */
  def overlap(train: DataFrame, eval: DataFrame, n: Int = 5,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tr = shingleHashes(train, idCol, textCol, n)
    val ev = shingleHashes(eval, idCol, textCol, n)
      .select(col("h")).distinct()
      .withColumn("__hit", lit(1))
    // single pass over the train shingles: count(*) = distinct shingles,
    // count(__hit) = shingles also present in the benchmark
    tr.join(broadcast(ev), Seq("h"), "left")
      .groupBy("id")
      .agg(count(col("__hit")).as("n_overlap"),
           count(lit(1)).as("n_shingles"))
      .select(col("id").as(idCol), col("n_overlap"), col("n_shingles"),
        (col("n_overlap").cast("double") / col("n_shingles"))
          .as("overlap_frac"))
  }

  /** Convenience gate: training docs whose overlap stays under `maxFrac`
    * (left-semi on the clean id set — the text column never re-shuffles).
    *
    * Composition note: references `train` twice; when chaining several
    * gates, derive each keep-id set from the base corpus via [[overlap]]
    * and intersect the sets (per-doc overlap is invariant to which other
    * training docs survive) — see SparkEntry q_pipeline_gates. */
  def decontaminated(train: DataFrame, eval: DataFrame, n: Int = 5,
                     maxFrac: Double = 0.0, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val clean = overlap(train, eval, n, idCol, textCol)
      .filter(col("overlap_frac") <= maxFrac)
      .select(idCol)
    train.join(clean, Seq(idCol), "left_semi")
  }
}
