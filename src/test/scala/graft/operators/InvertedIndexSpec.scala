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
}
