package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation mining — the statistically-associated word pairs a
  * corpus-curation pipeline extracts for tokenizer-vocabulary seeding,
  * boilerplate detection (navigation phrases repeat with near-1
  * confidence) and domain profiling. The reference engine has no text
  * operator family; this extends the judged text-analysis surface
  * ([[TfIdf]], [[Dsir]], heavy hitters) with the pairwise signal.
  *
  * Association measure: CONFIDENCE, conf(w1→w2) = P(w2 | w1) =
  * count(w1 w2) / count(w1), reported in exact parts-per-million via
  * integer division. PMI would need a cross-engine `ln` (the 1-ulp
  * libm hazard q_hll measured) or a three-way count product that
  * overflows 64-bit at web scale; confidence needs one
  * `pair·10⁶ div c1` — overflow-free to ~9·10¹² occurrences of a pair,
  * exact on any engine.
  *
  * Scale shape: bigrams are formed ARRAY-SIDE (slice + zip_with inside
  * one projection — the token array never explodes into a row per
  * position just to re-pair adjacent rows), so the only exchanges are
  * the word-count-shaped unigram/bigram groupBys and a vocabulary-keyed
  * join of pair counts to their left-word counts. Text never moves.
  */
object Collocations {

  /** Lowercased alphanumeric tokens, empties dropped. Bound as a real
    * column by callers so downstream slices evaluate it once (higher-
    * order lambdas re-evaluate referenced subtrees per element).
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Top-k adjacent word pairs by confidence: (w1, w2, pair_n, w1_n,
    * conf_ppm), pairs below `minCount` dropped, ties broken by the pair
    * itself for a deterministic total order.
    */
  def topByConfidence(docs: DataFrame, textCol: String = "text",
                      minCount: Long = 5L, k: Int = 20): DataFrame = {
    val toks = docs.select(tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("w1_n"))
    val pairs = toks.filter(size(col("t")) >= 2)
      .withColumn("l", expr("slice(t, 1, size(t) - 1)"))
      .withColumn("r", expr("slice(t, 2, size(t) - 1)"))
      .select(explode(zip_with(col("l"), col("r"),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    bi.join(uni.withColumnRenamed("w", "w1"), "w1")
      .select(col("w1"), col("w2"), col("pair_n"), col("w1_n"),
        expr("pair_n * 1000000L div w1_n").as("conf_ppm"))
      .orderBy(col("conf_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
