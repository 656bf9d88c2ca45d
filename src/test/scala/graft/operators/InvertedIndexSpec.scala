package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{LakeLog, LakeTable}

/** Inverted-index search: postings correctness, AND semantics vs a
  * brute-force recompute, and file pruning on a persisted index.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark shuffle hash join"),
    (1L, "hash hash table scan"),
    (2L, "spark hash aggregate"),
    (3L, "window sort  spark"),
    (4L, "SPARK Hash")) // case-folds into terms spark+hash
    .toDF("doc_id", "text")

  test("postings carry per-doc term frequencies") {
    val p = InvertedIndex.postings(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(p.contains(("hash", 1L, 2L)))
    assert(p.contains(("spark", 0L, 1L)))
    // normalization folds case
    assert(p.contains(("spark", 4L, 1L)) && p.contains(("hash", 4L, 1L)))
  }

  test("AND search equals the brute-force token-set recompute") {
    val got = InvertedIndex.searchAll(InvertedIndex.postings(docs),
      Seq("spark", "hash")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 2L), (2L, 2L), (4L, 2L)))
    // duplicate query terms must not double-count matches
    val dup = InvertedIndex.searchAll(InvertedIndex.postings(docs),
      Seq("spark", "spark")).collect().map(_.getLong(0)).toSet
    assert(dup == Set(0L, 2L, 3L, 4L))
  }

  test("bm25: hand-computed scores on a 3-doc corpus") {
    val corpus = Seq(
      (0L, "x x y"), (1L, "x z z z"), (2L, "y y y y y"))
      .toDF("doc_id", "text")
    val posts = InvertedIndex.postingsWithLen(corpus)
    // dl rides on every posting row
    val dls = posts.select("doc_id", "dl").distinct().collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(dls == Map(0L -> 3L, 1L -> 4L, 2L -> 5L))
    val stats = InvertedIndex.bm25Stats(posts)
    val st = stats.head
    assert(st.getLong(0) == 3L && st.getDouble(1) == 4.0)
    // independent recompute of the same closed-form (k1=1.2, b=0.75)
    def term(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
      idf * (tf * (1.2 + 1)) / (tf + 1.2 * (0.25 + 0.75 * dl / 4.0))
    }
    val got = InvertedIndex.bm25Search(posts, stats, Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // OR semantics: every doc holds x or y
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(math.abs(got(0L) - (term(2, 2, 3) + term(1, 2, 3))) < 1e-12)
    assert(math.abs(got(1L) - term(1, 2, 4)) < 1e-12)
    assert(math.abs(got(2L) - term(5, 2, 5)) < 1e-12)
  }

  test("bm25 ranking properties: rarity, saturation, length norm") {
    // 10 filler docs make 'rare' rare and 'common' common
    val corpus = ((0L until 10L).map(i => (i, "common pad pad")) ++
      Seq((10L, "rare pad pad"), (11L, "common pad pad pad pad pad")))
      .toDF("doc_id", "text")
    val posts = InvertedIndex.postingsWithLen(corpus)
    val stats = InvertedIndex.bm25Stats(posts)
    val got = InvertedIndex.bm25Search(posts, stats, Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the rare-term doc out-scores any common-term doc (idf dominance)
    assert(got(10L) > got(0L))
    // longer doc with same tf scores lower (length normalization)
    assert(got(11L) < got(0L))
  }

  test("persisted index prunes postings files for selective probes") {
    val log = new LakeLog(tmpDir("invidx"))
    // many docs, heavy-tailed vocab: cluster by term into 8 files
    val corpus = (0L until 400L).map(i =>
      (i, s"term${i % 97} term${(i * 7) % 97} common"))
      .toDF("doc_id", "text")
    InvertedIndex.buildIndex(spark, log, "idx", corpus, numFiles = 8)
    assert(log.snapshot("idx").files.size == 8)
    val q = InvertedIndex.searchIndex(spark, log, "idx", Seq("term13"))
    val m = graft.Metrics.measure("idx-probe", q)
    assert(m.filesPruned > 0,
      s"expected bloom/stat pruning, scanned=${m.filesScanned}")
    // and pruning never loses a match
    val brute = InvertedIndex.searchAll(InvertedIndex.postings(corpus),
      Seq("term13")).collect().map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet == brute)
  }

  test("bm25 persisted path: same scores, corpus-free probe, pruned files") {
    val log = new LakeLog(tmpDir("bm25idx"))
    val corpusDir = tmpDir("bm25corpus").toString
    (0L until 400L).map(i => (i, s"term${i % 97} term${(i * 7) % 97} common"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    InvertedIndex.buildBm25Index(spark, log, "bm", corpus, numFiles = 8)

    val q = Seq("term13", "common")
    val probe = InvertedIndex.bm25SearchIndex(spark, log, "bm", q)
    // the no-corpus-scan claim, pinned on the PLAN: every input file of
    // the probe belongs to the lake (index + stats), none to the corpus
    val corpusBase = java.nio.file.Paths.get(corpusDir).getFileName.toString
    val lakeBase = log.root.getFileName.toString
    val files = probe.inputFiles
    assert(files.nonEmpty && files.forall(f =>
      f.contains(lakeBase) && !f.contains(corpusBase)),
      s"probe plan reads outside the index: ${files.toSeq}")

    // identical scores to the in-plan corpus-stats branch (exact doubles:
    // persisted avgdl/dl/tf round-trip parquet losslessly)
    val posts = InvertedIndex.postingsWithLen(corpus)
    val raw = InvertedIndex.bm25Search(posts,
        InvertedIndex.bm25Stats(posts), q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = probe.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == raw)

    // bloom/stat pruning fires for a selective term probe
    val m = graft.Metrics.measure("bm-probe",
      InvertedIndex.bm25SearchIndex(spark, log, "bm", Seq("term13")))
    assert(m.filesPruned > 0,
      s"expected pruned postings files, scanned=${m.filesScanned}")
  }

  test("phrase search: adjacency in order, hand-counted") {
    val docs = Seq(
      (0L, "big table scan on a table scan node"), // 2 matches
      (1L, "scan table"),                          // reversed: no match
      (2L, "table full scan"),                     // gap: no match
      (3L, "the table scan")).toDF("doc_id", "text")
    val got = InvertedIndex
      .phraseSearch(InvertedIndex.positionalPostings(docs),
        Seq("table", "scan"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 3L -> 1L))
  }

  test("phrase search: repeated terms anchor only at true adjacency, " +
       "overlapping matches all counted") {
    val docs = Seq(
      (0L, "batch batch batch run"),  // "batch batch" overlaps: 2 matches
      (1L, "batch run batch")).toDF("doc_id", "text")
    val got = InvertedIndex
      .phraseSearch(InvertedIndex.positionalPostings(docs),
        Seq("batch", "batch"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L))
    // three-term phrase with a repeat
    val tri = InvertedIndex
      .phraseSearch(InvertedIndex.positionalPostings(docs),
        Seq("batch", "batch", "batch"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(0L -> 1L))
  }

  test("proximity search: window honored any order, same-term pairs " +
       "counted once") {
    val docs = Seq(
      (0L, "sort a b merge"),       // |Δ| = 3: in window
      (1L, "merge x sort"),         // reversed, |Δ| = 2: in
      (2L, "sort a b c d merge"),   // |Δ| = 5: out
      (3L, "sort merge sort")).toDF("doc_id", "text")
    val pp = InvertedIndex.positionalPostings(docs)
    val got = InvertedIndex.proximitySearch(pp, "sort", "merge", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 3: two sorts × one merge = 2 qualifying pairs
    assert(got == Map(0L -> 1L, 1L -> 1L, 3L -> 2L))
    // same-term NEAR: distinct position pairs, each counted once
    val same = InvertedIndex.proximitySearch(pp, "sort", "sort", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same == Map(3L -> 1L))
  }

  test("phrase search on the real corpus equals the regex recompute") {
    // "table scan" cannot self-overlap, so non-overlapping regex counts
    // over the normalized text are the same ground truth the positional
    // join computes — on all 500 real documents
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val got = InvertedIndex
      .phraseSearch(InvertedIndex.positionalPostings(docs),
        Seq("table", "scan"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = docs.select(col("doc_id"),
        size(regexp_extract_all(
          concat(lit(" "), graft.functions.TextFunctions.normalizeText(
            col("text")), lit(" ")),
          lit("\\stable scan(?=\\s)"), lit(0))).as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == brute && got.nonEmpty)
  }

  test("incremental append: probe over batches equals one-shot rebuild") {
    val corpus = (0L until 200L).map(i =>
      (i, s"term${i % 31} term${(i * 3) % 31} shared"))
      .toDF("doc_id", "text")
    val (oldB, newB) = (corpus.filter($"doc_id" < 120),
      corpus.filter($"doc_id" >= 120))
    // keyword index: build on old, append new
    val logA = new LakeLog(tmpDir("appidx"))
    InvertedIndex.buildIndex(spark, logA, "idx", oldB, numFiles = 4)
    InvertedIndex.appendToIndex(spark, logA, "idx", newB, numFiles = 4)
    val logB = new LakeLog(tmpDir("oneidx"))
    InvertedIndex.buildIndex(spark, logB, "idx", corpus, numFiles = 4)
    val q = Seq("term13", "shared")
    val a = InvertedIndex.searchIndex(spark, logA, "idx", q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = InvertedIndex.searchIndex(spark, logB, "idx", q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
    // positional index: same equivalence for a phrase probe
    val logC = new LakeLog(tmpDir("appph"))
    InvertedIndex.buildPhraseIndex(spark, logC, "ph", oldB, numFiles = 4)
    InvertedIndex.appendToPhraseIndex(spark, logC, "ph", newB,
      numFiles = 4)
    val pa = InvertedIndex.phraseSearchIndex(spark, logC, "ph",
        Seq("term13", "term8"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pb = InvertedIndex
      .phraseSearch(InvertedIndex.positionalPostings(corpus),
        Seq("term13", "term8"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pa == pb && pa.nonEmpty)
  }

  test("KWIC snippets: edge clamping, every occurrence, exact windows") {
    val docs = Seq(
      (0L, "hit a b c d"),          // occurrence at pos 0: left-clamped
      (1L, "a b c hit"),            // at the end: right-clamped
      (2L, "x hit y hit z"),        // two occurrences
      (3L, "no match here")).toDF("doc_id", "text")
    val got = InvertedIndex.keywordInContext(docs, "hit", window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> "hit a b",
      (1L, 3L) -> "b c hit",
      (2L, 1L) -> "x hit y hit",
      (2L, 3L) -> "hit y hit z"))
  }

  test("persisted phrase index: pruned probe equals the raw recompute") {
    val log = new LakeLog(tmpDir("phidx"))
    val corpus = (0L until 400L).map(i =>
      (i, s"term${i % 97} term${(i * 7) % 97} common tail"))
      .toDF("doc_id", "text")
    InvertedIndex.buildPhraseIndex(spark, log, "ph", corpus, numFiles = 8)
    val probe = InvertedIndex.phraseSearchIndex(spark, log, "ph",
      Seq("term13", "term91"))
    val m = graft.Metrics.measure("ph-probe", probe)
    assert(m.filesPruned > 0,
      s"expected pruned postings files, scanned=${m.filesScanned}")
    val brute = InvertedIndex
      .phraseSearch(InvertedIndex.positionalPostings(corpus),
        Seq("term13", "term91"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == brute && brute.nonEmpty)
  }
}
