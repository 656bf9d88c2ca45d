package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, tokens}

/** Dataset-card generation — the per-source summary table a data team
  * publishes with a corpus release (docs, tokens, duplication, length
  * and quality profile per source): the descriptive face of the whole
  * curation surface, produced in ONE aggregation pass.
  *
  * Exactness: every column is an integer. Rates are ppm via integer
  * division, means are ×100 floor-scaled (`floor(sum·100 / n)` — the
  * avg_logp_u convention: a decimal-rounded mean is one-ulp fragile
  * across engines, a floor-scaled integer is not). The quality column
  * counts frozen-model margin ≥ 0 decisions (IEEE affine map — exact),
  * and duplication is `n_docs − distinct md5(text)` per source.
  *
  * Scale shape: one projection computes (source, n_tok, dup key,
  * margin), then ONE partial/final hash-aggregate pair keyed by source
  * — the distinct-count rides the same exchange. A 100 TB card costs
  * the scan.
  */
object DatasetCard {

  /** One row per source. `marginCol` must already be on `docs` (the
    * frozen quality model's raw margin, or any IEEE-exact score). */
  def perSource(docs: DataFrame, marginCol: Column,
                sourceCol: String = "source",
                textCol: String = "text"): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"),
      size(tokens(normalizeText(col(textCol)))).cast("long").as("__nt"),
      md5(col(textCol)).as("__fp"),
      marginCol.as("__m"))
    base.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        (count(lit(1)) - countDistinct("__fp")).as("n_dup_docs"),
        expr("sum(__nt) * 100L div count(1)").as("mean_tokens_x100"),
        expr("sum(CASE WHEN __nt >= 64 THEN 1L ELSE 0L END) * 1000000L" +
          " div count(1)").as("long_doc_ppm"),
        expr("sum(CASE WHEN __m >= 0.0 THEN 1L ELSE 0L END) * 1000000L" +
          " div count(1)").as("quality_keep_ppm"))
  }
}
