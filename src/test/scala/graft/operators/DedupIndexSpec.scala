package graft.operators

import graft.SparkSpec
import graft.lake.LakeLog
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index: probing a new batch against indexed
  * history must equal one-shot pair mining over the union, incremental
  * appends must equal a one-shot build, and the probe must be file-pruned
  * (the 100 TB point of persisting the index at all).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  // controlled corpus: doc 2i and 2i+1 share text (near-dups), families
  // differ wildly so cross-family est-jaccard is ~0
  private def corpus(ids: Range) =
    ids.map { i =>
      val fam = i / 2
      val words = (0 until 12).map(w => s"w${fam}_${w}")
      val tail = if (i % 2 == 0) "alpha beta" else "alpha gamma"
      (i.toLong, words.mkString(" ") + " " + tail)
    }.toDF("doc_id", "text")

  test("probe against indexed history ≡ one-shot pair mining") {
    val log = new LakeLog(tmpDir("lshidx"))
    val hist = corpus(0 until 40).filter($"doc_id" % 2 === 0)
    val batch = corpus(0 until 40).filter($"doc_id" % 2 === 1)
    DedupIndex.buildIndex(spark, log, "idx", hist)
    val probed = DedupIndex.probeIndex(spark, log, "idx", batch,
        threshold = 0.5)
      .select(least($"new_id", $"hist_id"), greatest($"new_id", $"hist_id"),
        $"est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oneShot = Dedup.minhashLshPairsFixed(corpus(0 until 40),
        threshold = 0.5)
      // restrict to cross (even, odd) pairs — within-history pairs are
      // not the probe's job
      .filter(($"a_id" % 2) =!= ($"b_id" % 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probed == oneShot && probed.nonEmpty)
  }

  test("incremental appends ≡ one-shot build") {
    val logA = new LakeLog(tmpDir("lshinc"))
    val logB = new LakeLog(tmpDir("lshone"))
    val h1 = corpus(0 until 20).filter($"doc_id" % 2 === 0)
    val h2 = corpus(20 until 40).filter($"doc_id" % 2 === 0)
    val batch = corpus(0 until 40).filter($"doc_id" % 2 === 1)
    DedupIndex.buildIndex(spark, logA, "idx", h1)
    DedupIndex.appendToIndex(spark, logA, "idx", h2)
    DedupIndex.buildIndex(spark, logB, "idx",
      corpus(0 until 40).filter($"doc_id" % 2 === 0))
    def res(log: LakeLog) =
      DedupIndex.probeIndex(spark, log, "idx", batch, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    assert(res(logA) == res(logB) && res(logA).size == 20)
  }

  test("dedupBatchAgainstIndex keeps novel docs and indexes them") {
    val log = new LakeLog(tmpDir("lshstep"))
    DedupIndex.buildIndex(spark, log, "idx",
      corpus(0 until 10).filter($"doc_id" % 2 === 0))
    // batch: 5 near-dups of history (odd twins) + 5 novel families
    val batch = corpus(0 until 10).filter($"doc_id" % 2 === 1)
      .unionByName(corpus(100 until 105))
    val survivors = DedupIndex.dedupBatchAgainstIndex(spark, log, "idx",
      batch, threshold = 0.5)
    assert(survivors.count() == 5)
    assert(survivors.filter($"doc_id" < 100).count() == 0)
    // survivors are indexed now: probing a twin of one finds the dup
    val again = DedupIndex.probeIndex(spark, log, "idx",
      corpus(101 until 102), threshold = 0.5)
    assert(again.filter($"hist_id" === 100L && $"new_id" === 101L)
      .count() == 1)
  }

  test("a small probe is file-pruned by the bucket blooms/stats") {
    val log = new LakeLog(tmpDir("lshprune"))
    DedupIndex.buildIndex(spark, log, "idx", corpus(0 until 400),
      numFiles = 8)
    // minPruneFiles = 1: force the prune path despite the small fixture
    // (the default cost gate skips key pruning below 32 history files)
    val probe = DedupIndex.probeIndex(spark, log, "idx",
      corpus(0 until 2), threshold = 0.5, minPruneFiles = 1)
    val m = graft.Metrics.measure("probe", probe)
    assert(m.filesPruned > 0,
      s"expected pruned files, scanned=${m.filesScanned} pruned=${m.filesPruned}")
    assert(probe.count() == 2) // each probe doc collides with its twin
  }
}
