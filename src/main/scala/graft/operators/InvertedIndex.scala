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

  /** Incremental APPEND of a new crawl batch's postings — the
    * continuous-ingest face ([[graft.operators.DedupIndex.appendToIndex]]
    * / IVF-PQ append set the pattern): only the BATCH is tokenized, its
    * postings land as new term-clustered bloom-indexed files, committed
    * files untouched. Probes see the union; per-(term, doc) rows from
    * different batches coexist (a doc re-ingested across batches counts
    * per batch — dedup the corpus before indexing it, not the index).
    */
  def appendToIndex(spark: SparkSession, log: LakeLog, table: String,
                    docs: DataFrame, numFiles: Int = 16,
                    idCol: String = "doc_id",
                    textCol: String = "text"): Unit = {
    LakeTable.insert(spark, log, table, postings(docs, idCol, textCol),
      numFiles = numFiles, clusterBy = Seq("term"))
    ()
  }

  /** Incremental APPEND for the positional index ([[buildPhraseIndex]]):
    * the batch's positional postings land as new clustered files. */
  def appendToPhraseIndex(spark: SparkSession, log: LakeLog,
                          table: String, docs: DataFrame,
                          numFiles: Int = 16, idCol: String = "doc_id",
                          textCol: String = "text"): Unit = {
    LakeTable.insert(spark, log, table,
      positionalPostings(docs, idCol, textCol),
      numFiles = numFiles, clusterBy = Seq("term"))
    ()
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

  /** POSITIONAL postings `(term, doc_id, pos)` — the phrase-query index
    * shape: one row per token OCCURRENCE with its 0-based position (the
    * same 8-extra-bytes-per-posting trade [[postingsWithLen]] makes for
    * BM25's dl, spent here on adjacency instead of length). */
  def positionalPostings(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    Dedup.spread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .select(col("doc_id"),
        posexplode(tokens(normalizeText(col("__text"))))
          .as(Seq("pos", "term")))
      .select("term", "doc_id", "pos")

  /** Persist a positional index: [[positionalPostings]] hash-clustered
    * by term with a term bloom — probes prune to the phrase's terms'
    * files exactly like [[buildIndex]]'s. */
  def buildPhraseIndex(spark: SparkSession, log: LakeLog, table: String,
                       docs: DataFrame, numFiles: Int = 16,
                       idCol: String = "doc_id",
                       textCol: String = "text"): Unit = {
    val p = positionalPostings(docs, idCol, textCol)
    LakeTable.createTable(log, table, p.schema, bloomFilterCols = Seq("term"))
    LakeTable.insert(spark, log, table, p, numFiles = numFiles,
      clusterBy = Seq("term"))
  }

  /** Exact-phrase search: documents containing the terms ADJACENTLY in
    * order. Each occurrence of term i is rebased to its implied anchor
    * position (pos − i); a phrase match is an anchor surviving every
    * rebase join. Returns (doc_id, n_matches) with the occurrence count.
    *
    * Scale shape: the postings frame is filtered to the phrase's terms
    * BEFORE any join (≤ |phrase| clustered runs off a [[buildPhraseIndex]]
    * table — bloom/min-max pruned), and the |phrase|−1 joins are keyed
    * on (doc_id, anchor) over those occurrence runs only: work is
    * O(occurrences of the phrase's terms), the corpus never moves.
    * Repeated terms in the phrase are handled by the rebase itself
    * ("the the" anchors only where positions differ by exactly 1).
    */
  def phraseSearch(postingsDf: DataFrame,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val runs = postingsDf
      .filter(col("term").isin(phrase.distinct.map(_.asInstanceOf[Any]): _*))
      .select("term", "doc_id", "pos")
    val anchor = runs.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(runs.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("p0")),
          Seq("doc_id", "p0"))
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** Phrase search over a persisted positional index: the term In-filter
    * reaches the lake scan and file-prunes before the rebase joins. */
  def phraseSearchIndex(spark: SparkSession, log: LakeLog, table: String,
                        phrase: Seq[String]): DataFrame =
    phraseSearch(LakeTable.readIndexed(spark, log, table), phrase)

  /** Proximity (NEAR/w) search: documents where `t1` and `t2` occur
    * within `window` token positions of each other, ANY order — the
    * relevance signal between bag-of-words AND (q_search_index) and the
    * exact phrase ([[phraseSearch]]). Returns (doc_id, n_pairs) with the
    * qualifying occurrence-pair count.
    *
    * Scale shape: two bloom-prunable single-term postings runs equi-join
    * on doc_id and filter on |Δpos| — fan-out is per-doc occurrence
    * products of TWO specific terms (bounded small), never a corpus
    * structure. Same-term NEAR degenerates sensibly: pairs of distinct
    * positions.
    */
  def proximitySearch(postingsDf: DataFrame, t1: String, t2: String,
                      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val runs = postingsDf
      .filter(col("term").isin(Seq(t1, t2).distinct
        .map(_.asInstanceOf[Any]): _*))
    val a = runs.filter(col("term") === t1)
      .select(col("doc_id"), col("pos").as("p1"))
    val b = runs.filter(col("term") === t2)
      .select(col("doc_id"), col("pos").as("p2"))
    a.join(b, Seq("doc_id"))
      .filter(abs(col("p1") - col("p2")) <= window &&
        (lit(t1 != t2) || col("p1") < col("p2")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_pairs"))
  }

  /** Keyword-in-context (KWIC) snippets — the attribution / audit UX
    * over positions: every occurrence of `term` with its ±`window`
    * surrounding tokens. Returns (doc_id, pos, snippet).
    *
    * Scale shape: occurrences come from the (prunable) positional
    * postings; the token arrays joined back are ONLY the matched
    * documents' (left-semi against the match set before the arrays
    * materialize) — snippet assembly shuffles O(occurrences) rows plus
    * the matched docs' arrays, never the corpus.
    */
  def keywordInContext(docs: DataFrame, term: String, window: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(window >= 1)
    val matches = positionalPostings(docs, idCol, textCol)
      .filter(col("term") === term)
      .select(col("doc_id"), col("pos"))
    val toks = Dedup.spread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .join(matches.select("doc_id").distinct(), Seq("doc_id"),
        "left_semi")
      .select(col("doc_id"),
        tokens(normalizeText(col("__text"))).as("__tk"))
    matches.join(toks, "doc_id")
      .withColumn("__s0", greatest(col("pos") - window, lit(0)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        array_join(slice(col("__tk"), col("__s0") + 1,
          col("pos") + lit(window + 1) - col("__s0")), " ")
          .as("snippet"))
  }

  /** Proximity search over a persisted positional index (file-pruned). */
  def proximitySearchIndex(spark: SparkSession, log: LakeLog,
                           table: String, t1: String, t2: String,
                           window: Int): DataFrame =
    proximitySearch(LakeTable.readIndexed(spark, log, table), t1, t2,
      window)

  /** Postings with the document length DENORMALIZED onto every row:
    * (term, doc_id, tf, dl). Impact-ordered search indexes store exactly
    * this — 8 extra bytes per posting buys BM25 scoring without joining
    * the corpus-sized doc-length table at query time (which would shuffle
    * the whole length table against a handful of candidate postings).
    * `dl` = token count of the document under the corpus tokenizer. */
  def postingsWithLen(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    Dedup.spread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .select(col("doc_id"),
        tokens(normalizeText(col("__text"))).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), min("dl").as("dl"))

  /** Corpus stats BM25 needs: one row (n_docs, avgdl). Computed with a
    * single aggregate over the postings (build-time cost); production
    * persists this row next to the index rather than recomputing per
    * query — [[bm25Search]] accepts it as a DataFrame so either source
    * plugs in. */
  def bm25Stats(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(min("dl").as("__dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum("__dl").cast("double") / count(lit(1))).as("avgdl"))

  /** Disjunctive (OR) BM25 ranking: every document matching ≥ 1 query
    * term, scored Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with the Lucene idf  ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Scale shape: the term filter prunes to ≤ |terms| postings runs
    * (bloom + min-max file skipping on a clustered index); `df` is a
    * tiny per-term aggregate over those candidates, broadcast back; the
    * stats row is a broadcast scalar. One candidate-sized groupBy on
    * doc_id is the only exchange — the corpus itself never moves.
    * Returns (doc_id, score) unrounded/unordered; callers round before
    * ranking so ties break identically on every engine. */
  /** Persist the BM25 impact index: [[postingsWithLen]] as a lake table
    * hash-clustered by term with a term bloom, PLUS the one-row corpus
    * stats table `<table>_stats` (n_docs, avgdl) written at build time.
    * Query time then touches the CORPUS never and the stats table for
    * one metadata-sized row — the production split [[bm25Stats]]'s
    * scaladoc promises, pinned by InvertedIndexSpec (probe plan reads
    * only index tables) and oracle-checked end-to-end by
    * q_search_bm25_indexed. */
  def buildBm25Index(spark: SparkSession, log: LakeLog, table: String,
                     docs: DataFrame, numFiles: Int = 16,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Unit = {
    val p = postingsWithLen(docs, idCol, textCol)
    LakeTable.createTable(log, table, p.schema, bloomFilterCols = Seq("term"))
    LakeTable.insert(spark, log, table, p, numFiles = numFiles,
      clusterBy = Seq("term"))
    // stats computed from the postings just written (one aggregate at
    // build time), persisted beside the index
    val st = bm25Stats(LakeTable.read(spark, log, table))
    LakeTable.createTable(log, s"${table}_stats", st.schema)
    LakeTable.insert(spark, log, s"${table}_stats", st, numFiles = 1)
  }

  /** BM25 over a [[buildBm25Index]] table: candidates come through the
    * bloom/stat-pruned lake read, (n_docs, avgdl) from the persisted
    * stats row — zero corpus access at query time. */
  def bm25SearchIndex(spark: SparkSession, log: LakeLog, table: String,
                      terms: Seq[String], k1: Double = 1.2,
                      b: Double = 0.75): DataFrame =
    bm25Search(LakeTable.readIndexed(spark, log, table),
      LakeTable.read(spark, log, s"${table}_stats"), terms, k1, b)

  def bm25Search(postings: DataFrame, stats: DataFrame, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val distinctTerms = terms.distinct
    val cand = postings
      .filter(col("term").isin(distinctTerms.map(_.asInstanceOf[Any]): _*))
    val df_ = cand.groupBy("term").agg(count(lit(1)).as("df"))
    cand.join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) +
            (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("__s"))
      .groupBy("doc_id").agg(sum("__s").as("score"))
  }
}
