package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the CCNet/RefinedWeb cleaning
  * step between HTML extraction and quality filtering: a LINE that recurs
  * across many documents (nav menus, cookie banners, footers, share
  * buttons) is template chrome, not content, and keeping it both skews
  * n-gram statistics and teaches a model to emit it. A line is dropped
  * when it appears in ≥ `minDf` DISTINCT documents; unique lines survive
  * untouched, so the operator is a no-op on clean prose.
  *
  * Exactness: the decision is document frequency of the EXACT line string
  * — replayable in any engine, no tokenizer or hash family in the
  * semantics. The 64-bit hash below is a pure PREFILTER: df-by-hash is a
  * superset of df-by-string (collisions only ever ADD candidates), and
  * candidates are re-counted by string before anything is dropped, so a
  * hash collision can never misclassify a line.
  *
  * Scale shape: pass 1 counts distinct (line-hash, doc) pairs — the
  * exchange carries two longs per distinct line occurrence, never text.
  * Pass 2 re-counts BY STRING only the candidate lines (boilerplate is a
  * vanishing fraction of distinct lines, and each candidate line is by
  * definition short and frequent). The flagged set joins back broadcast,
  * and document reassembly is the same single doc-keyed exchange every
  * rewrite operator here pays (the window/aggregate share partitioning).
  */
object Boilerplate {

  /** Deterministic multi-line page fixture over the documents table —
    * same device as [[HtmlExtract.synthesize]]: per-source nav header, the
    * real text as the body line, a promo line on every 3rd document, and
    * a global footer, all reproducible in SQL so the oracle can rebuild
    * the identical pages. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat_ws("\n",
        concat(lit("NAV "), col("source"), lit(" home about contact")),
        col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("PROMO subscribe to our newsletter today")),
        lit("FOOTER copyright sample site")).as("page"))

  /** Remove lines appearing in ≥ `minDf` distinct documents. Returns
    * (id, clean, n_lines, n_kept); a fully-boilerplate document stays in
    * the output with `clean = ""`. */
  def removeBoilerplate(pages: DataFrame, minDf: Long, idCol: String = "doc_id",
                        textCol: String = "page"): DataFrame = {
    require(minDf >= 2, "minDf >= 2 (1 would drop every line)")
    val lines = pages
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
    // pass 1 — candidate line hashes by distinct-doc frequency: fixed-width
    // (hash, doc) exchange, text stays put
    val candHashes = lines
      .select(xxhash64(col("line")).as("__h"), col(idCol))
      .distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select("__h")
    // pass 2 — exact string re-count over candidates only (collision-proof)
    val frequent = lines
      .join(candHashes, xxhash64(col("line")) === col("__h"), "left_semi")
      .groupBy("line").agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("line"), lit(true).as("__bp"))
    lines.join(broadcast(frequent), Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__bp").isNull,
              struct(col("pos").as("o"), col("line").as("p"))))),
            x => x.getField("p")),
          "\n").as("clean"),
        count(lit(1)).as("n_lines"),
        sum(when(col("__bp").isNull, 1L).otherwise(0L)).as("n_kept"))
  }
}
