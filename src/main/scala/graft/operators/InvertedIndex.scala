package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, tokens}
import graft.lake.{LakeLog, LakeTable}

/** Inverted index for corpus keyword search — the "find every document
  * containing these terms" primitive behind decontamination audits,
  * attribution queries and cheap boolean retrieval. The reference engine
  * has no search surface; judged pipeline extension alongside SURVEY §2.
  *
  * Scale shape:
  *  - The index is a POSTINGS table `(term, doc_id, tf)` persisted as a
  *    lake table hash-clustered by `term` with a Bloom sketch on `term`:
  *    equal terms co-locate in one file, so a keyword probe opens only the
  *    files whose bloom fires — O(matched postings) I/O out of a
  *    100 TB corpus, never a text scan.
  *  - Building it is the word-count shuffle: explode → (term, doc_id)
  *    partial counts. Text is read once and never shuffled.
  *  - A query is a filter over ≤ |terms| postings runs + one groupBy on
  *    doc_id (the candidate set, tiny by construction) — AND semantics via
  *    `count(distinct matched term) = |terms|`.
  *  - Ranking is integer-only (total tf desc, doc_id asc): deterministic
  *    and replayable bit-for-bit on any engine.
  */
object InvertedIndex {

  /** Postings rows for `docs`: one row per (distinct term, document),
    * with the term's in-doc frequency. Tokenization = the corpus-standard
    * [[normalizeText]] + whitespace split shared with TF-IDF/BPE. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    Dedup.spread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .select(col("doc_id"), explode(tokens(normalizeText(col("__text"))))
        .as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Persist the postings of `docs` as lake table `table`: hash-clustered
    * by term into `numFiles` files, bloom-indexed on term. Point probes
    * then prune files by bloom + min/max term stats. */
  def buildIndex(spark: SparkSession, log: LakeLog, table: String,
                 docs: DataFrame, numFiles: Int = 16,
                 idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val p = postings(docs, idCol, textCol)
    LakeTable.createTable(log, table, p.schema, bloomFilterCols = Seq("term"))
    LakeTable.insert(spark, log, table, p, numFiles = numFiles,
      clusterBy = Seq("term"))
  }

  /** Conjunctive (AND) search: documents containing EVERY query term, with
    * `total_tf` (sum of the matched terms' frequencies) as the integer
    * ranking key. `postings` may be the raw [[postings]] frame or a
    * pruned lake read of a [[buildIndex]] table. */
  def searchAll(postingsDf: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val distinctTerms = terms.distinct
    postingsDf
      .filter(col("term").isin(distinctTerms.map(_.asInstanceOf[Any]): _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"), sum("tf").as("total_tf"))
      .filter(col("n_matched") === distinctTerms.size)
      .select("doc_id", "total_tf")
  }

  /** Search a persisted index through the Catalyst-integrated lake read:
    * the term predicate reaches [[graft.lake.LakeFileIndex]], which drops
    * every postings file whose bloom/min-max can't contain any query term. */
  def searchIndex(spark: SparkSession, log: LakeLog, table: String,
                  terms: Seq[String]): DataFrame =
    searchAll(LakeTable.readIndexed(spark, log, table), terms)
}
