package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-answer and invariant tests for the dedup family. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "The  Quick  Brown  Fox jumps over the lazy dog"), // ws/case dup of 1
    (4L, "the quick brown fox jumped over the lazy dogs"), // near dup
    (5L, "completely different content about spark engines"),
    (6L, "")
  ).toDF("doc_id", "text")

  test("exactDedup keeps lowest id per normalized text") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("minhash signatures: identical docs identical, length k, deterministic") {
    val sigs = Dedup.minhashSignatures(docs, k = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.size == 6)
    assert(sigs.values.forall(_.size == 32))
    assert(sigs(1L) == sigs(2L) && sigs(1L) == sigs(3L)) // normalization dups
    assert(sigs(1L) != sigs(5L))
    val again = Dedup.minhashSignatures(docs, k = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == sigs)
  }

  test("minhashLshPairs finds dups and near-dups, est_jaccard in [0,1]") {
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) &&
      keys.contains((2L, 3L)))
    assert(pairs.filter(p => Set(p._1, p._2) == Set(1L, 2L))
      .forall(_._3 == 1.0))
    assert(pairs.forall(p => p._3 >= 0.4 && p._3 <= 1.0))
    assert(pairs.forall(p => p._1 < p._2))
    assert(!keys.contains((1L, 5L)))
  }

  test("simhash: identical fp for dups, close for near-dups, far for distinct") {
    val fps = Dedup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) == fps(2L) && fps(1L) == fps(3L))
    assert(ham(fps(1L), fps(4L)) < ham(fps(1L), fps(5L)))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 5L)))
  }

  test("ngramJaccardPairs: exact Jaccard on token sets") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5, n = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 2L))) == 1.0)
    assert(pairs(((1L, 3L))) == 1.0)
    // doc4 vs doc1: tokens {the,quick,brown,fox,jumps/jumped,over,lazy,dog(s)}
    // intersection 6 (the,quick,brown,fox,over,lazy), union 10 → 0.6
    assert(math.abs(pairs(((1L, 4L))) - 0.6) < 1e-9)
  }

  test("jaccard strategies agree: prefix-filter path == bitmask path") {
    // maxBitmaskVocab=0 forces the prefix-filtered strategy; the adaptive
    // default picks bitmask on this vocab — results must be identical
    def run(maxVocab: Int) =
      Dedup.ngramJaccardPairs(docs, threshold = 0.5, n = 1,
          maxBitmaskVocab = maxVocab)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          math.round(r.getDouble(2) * 1e9))).toMap
    val viaBitmask = run(Int.MaxValue)
    val viaPrefix = run(0)
    assert(viaBitmask == viaPrefix)
    assert(viaBitmask.contains((1L, 2L)))
  }

  test("bitmask gate: large corpus over a tiny vocab takes the prefix path") {
    // 60 docs over a 4-word vocabulary: a vocab-only gate would go
    // all-pairs bitmask; the corpus-size gate must fall through to the
    // one-shuffle prefix path (no BroadcastNestedLoopJoin in the plan)
    val many = (1L to 60L).map(i =>
      (i, if (i % 2 == 0) "aa bb cc" else "aa bb dd")).toDF("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(2) * 1e9))).toMap
    val viaPrefix = Dedup.ngramJaccardPairs(many, threshold = 0.5, n = 1,
      maxBitmaskDocs = 50)
    viaPrefix.collect()
    assert(!viaPrefix.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // identical answers either way ("aa bb cc" vs "aa bb dd" = 2/4 = 0.5)
    val viaBitmask = Dedup.ngramJaccardPairs(many, threshold = 0.5, n = 1)
    viaBitmask.collect()
    assert(viaBitmask.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(pairsOf(viaPrefix) == pairsOf(viaBitmask))
    assert(pairsOf(viaPrefix).size == 60 * 59 / 2)
  }

  test("simhash pigeonhole: block count follows the requested radius") {
    // Hamming-6 pair whose flipped bits touch ALL FOUR 16-bit blocks — a
    // fixed 4-block scheme can never surface it as a candidate; at
    // maxHamming=8 the Manku split is k=11 blocks joined on 3-block
    // combinations, and pigeonhole guarantees an intact combination
    val flips = Seq(0, 8, 16, 24, 32, 48).map(1L << _).reduce(_ | _)
    val fp = Seq((1L, 0L), (2L, flips)).toDF("id", "fp")
    val found = Dedup.simhashPairsOfFingerprints(fp, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(found.toSeq == Seq((1L, 2L, 6)))
    // same pair is outside a radius-3 query — filtered, not a recall hole
    assert(Dedup.simhashPairsOfFingerprints(fp, maxHamming = 3).count() == 0)
    // adversarial worst case at the radius boundary: hamming EXACTLY 8
    // with every flip in a different block (k=11 boundaries: 0,5,11,17,
    // 23,29,34,40,46,52,58) — touches 8 blocks, leaving exactly one
    // intact 3-combination (blocks 8,9,10). Full recall means this pair
    // MUST still meet in that one bucket.
    val worst = Seq(0, 6, 12, 18, 24, 30, 36, 42).map(1L << _).reduce(_ | _)
    val edge = Seq((1L, 0L), (2L, worst)).toDF("id", "fp")
    val edgeFound = Dedup.simhashPairsOfFingerprints(edge, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(edgeFound.toSeq == Seq((1L, 2L, 8)))
    // degenerate split still works: 64 one-bit blocks at the max radius
    val adjacent = Seq((1L, 0L), (2L, 1L)).toDF("id", "fp")
    assert(Dedup.simhashPairsOfFingerprints(adjacent, maxHamming = 63)
      .count() == 1)
  }

  test("simhash combo width keeps join keys selective and bounded") {
    // small radii: single-block keys already >= 16 bits
    assert(Dedup.simhashComboWidth(0) == 1) // key = whole fp
    assert(Dedup.simhashComboWidth(3) == 1) // k=4, 16-bit blocks
    // r=8: c=3, k=11 -> ~17-bit keys, C(11,3)=165 combos per doc
    assert(Dedup.simhashComboWidth(8) == 3)
    // r=12: c=4 would hit C(16,4)=1820 combos — backed off to c=3
    assert(Dedup.simhashComboWidth(12) == 3)
    // near-max radius: blocks must stay non-empty (k <= 64)
    assert(Dedup.simhashComboWidth(63) == 1)
  }

  test("simhash combo width scales with corpus size when n is known") {
    // cost model C(k,c)·(n + n²/2^width): at tiny n replication dominates
    assert(Dedup.simhashComboWidth(8, nDocs = 100) == 1)
    // bench scale: c=2 (45× replication, ~13-bit keys) beats c=3 (165×)
    assert(Dedup.simhashComboWidth(8, nDocs = 5000) == 2)
    // web scale: the n² term pushes to the widest key the ≤512×
    // replication cap allows (c=4, k=12, ~21-bit keys, C(12,4)=495)
    assert(Dedup.simhashComboWidth(8, nDocs = 1000000000L) == 4)
    // any chosen c preserves the pigeonhole full-recall guarantee, so
    // the n-aware choice may differ from the fixed-width heuristic
    // without changing results — only replication and bucket occupancy
  }

  test("semantic dedup derives cluster count from corpus size by default") {
    // the derivation: floor at kMin, then grows linearly with n
    assert(Dedup.deriveK(0) == 16)
    assert(Dedup.deriveK(65536) == 16)
    assert(Dedup.deriveK(65537) == 17)
    assert(Dedup.deriveK(1L << 22) == 1024)
    assert(Dedup.deriveK(1_000_000_000L) == 244141)
    // default-k run (derived 16 at this size) matches an explicit k=16 run
    val embs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairsOf(Dedup.semanticDupPairs(embs, threshold = 0.3)) ==
      pairsOf(Dedup.semanticDupPairs(embs, threshold = 0.3, k = 16)))
  }

  test("dropDuplicates removes the b-side of each pair") {
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.9)
    val kept = Dedup.dropDuplicates(docs, pairs).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("char-shingle mode: near-dups found in whitespace-free text") {
    // CJK-style text: no word boundaries, so word shingles see one token
    val cjk = Seq(
      (1L, "機械学習は人工知能の一分野である"),
      (2L, "機械学習は人工知能の一分野である"),   // exact dup
      (3L, "機械学習は人工知能のひとつの分野である"), // near dup
      (4L, "全然違う内容の文書です今日は晴れ")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(cjk, k = 32, charShingleSize = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    def overlap(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(overlap(sigs(1L), sigs(3L)) > overlap(sigs(1L), sigs(4L)))
    val fps = Dedup.simhashFingerprints(cjk, charShingleSize = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) == fps(2L))
    assert(ham(fps(1L), fps(3L)) < ham(fps(1L), fps(4L)))
  }

  test("connectedComponents labels chains and separates clusters") {
    // graph: 1-2, 2-3, 3-4 (chain → all component 1); 10-11; 20 isolated pair-less
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))

    val allDocs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val kept = Dedup.dropDuplicatesExact(allDocs, pairs)
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 10L, 20L)) // one rep per cluster + isolated
  }

  test("connectedComponents handles a long chain within maxIter") {
    // chain of 30 nodes: min-label propagation needs several rounds
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs).collect()
    assert(comps.forall(_.getLong(1) == 1L))
  }

  test("driver union-find and distributed label propagation agree") {
    // random-ish graph: chains, merges, isolated pairs
    val rnd = (0 until 200).map { i =>
      val a = (i * 37L) % 80L; val b = (i * 53L + 11L) % 80L
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }
    val pairs = rnd.toDF("a_id", "b_id")
    val viaDriver = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = Dedup.connectedComponents(pairs,
        driverSolveMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaCluster)
  }

  test("incrementalExactDedup drops batch rows already in the corpus") {
    val corpus = Seq((1L, "existing doc one"), (2L, "existing doc two"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "existing doc one"),      // dup of corpus 1
      (11L, "Existing  DOC two"),     // normalization dup of corpus 2
      (12L, "genuinely new document"),
      (13L, "genuinely new document") // in-batch dup of 12
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExactDedup(corpus, batch)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(12L))
  }

  test("minhash candidates cover all high-jaccard pairs on real testdata") {
    // ties the rows-only q_dedup_minhash to exact ground truth: every pair
    // the exact prefix-filter join scores at jaccard >= 0.8 must surface
    // as an LSH candidate at threshold 0.5 (deterministic — fixed seeds)
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.8, n = 3)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain near-duplicate pairs")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
  }

  test("bloom incremental dedup: exact result, no false negatives") {
    import graft.functions.TextFunctions.fingerprint
    val corpus = (0L until 200L).map(i => (i, s"corpus document number $i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1000L, "corpus document number 7"),   // dup of corpus
      (1001L, "Corpus  DOCUMENT number 42"), // normalization dup
      (1002L, "a brand new document"),
      (1003L, "a brand new document"),       // in-batch dup of 1002
      (1004L, "another brand new document")
    ).toDF("doc_id", "text")
    val fps = corpus.select(fingerprint(col("text")).as("fp"))
    val bloom = Dedup.fingerprintBloom(corpus, expectedItems = 1000)
    val kept = Dedup.incrementalExactDedupBloom(fps, bloom, batch)
      .select("doc_id").as[Long].collect().sorted
    // identical to the join-everything path
    val exact = Dedup.incrementalExactDedup(corpus, batch)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1002L, 1004L))
    assert(kept.toSeq == exact.toSeq)
  }

  test("bloom merges across batches instead of re-scanning history") {
    import graft.functions.TextFunctions.fingerprint
    val c1 = Seq((1L, "first corpus doc")).toDF("doc_id", "text")
    val c2 = Seq((2L, "second corpus doc")).toDF("doc_id", "text")
    val merged = Dedup.fingerprintBloom(c1, 100)
    merged.mergeInPlace(Dedup.fingerprintBloom(c2, 100))
    val fp = (d: org.apache.spark.sql.DataFrame) =>
      d.select(fingerprint(col("text"))).as[String].head()
    assert(merged.mightContain(fp(c1)) && merged.mightContain(fp(c2)))
    // a doc in neither batch is (overwhelmingly) rejected at 1% fpp
    val probe = Seq((9L, "entirely absent text")).toDF("doc_id", "text")
    assert(!merged.mightContain(fp(probe)))
  }

  test("dedupPipeline: exact + near-dup stages keep one rep per cluster") {
    val kept = Dedup.dedupPipeline(docs, nearDupThreshold = 0.9)
      .select("doc_id").as[Long].collect().sorted
    // 2,3 are exact/normalization dups of 1; 4 is below the 0.9 near-dup
    // threshold; 5, 6 are unique
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("dropDuplicateSpans removes repeated spans corpus-wide, keeps first") {
    // w=2 spans; doc 1 = [a b][c d], doc 2 repeats [a b] then new [e f],
    // doc 3 repeats its own first span in-document, doc 4 is empty
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "g h g h x"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateSpans(docs, spanTokens = 2)
      .select("doc_id", "text_spandedup", "n_spans_kept")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    assert(out(1L) == ("a b c d", 2))     // first occurrences keep
    assert(out(2L) == ("e f", 1))         // cross-doc duplicate span drops
    assert(out(3L) == ("g h x", 2))       // in-doc repeat drops; tail span kept
    assert(out(4L) == ("", 0))            // empty doc: empty, not null
  }

  test("maskDuplicateSubstrings: later occurrences masked, first kept") {
    // k=2, stride-1 windows. doc 1 holds the first occurrence of every
    // window it contains; doc 2 repeats "b c d" (windows [b c],[c d]) in
    // the middle of fresh text; doc 3 repeats a run IN-DOCUMENT; doc 4 is
    // shorter than k; doc 5 is empty.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y b c d z"),
      (3L, "p q r p q r"),
      (4L, "w"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.maskDuplicateSubstrings(docs, shingleTokens = 2)
      .select("doc_id", "text_substrdedup", "n_tokens_removed")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    // doc 1: all windows are global first occurrences → untouched
    assert(out(1L) == ("a b c d e", 0))
    // doc 2: [b c] and [c d] already occurred in doc 1 → tokens b,c,d
    // (positions 2..4) are covered; x y z survive
    assert(out(2L) == ("x y z", 3))
    // doc 3: windows [p q],[q r] at positions 3,4 repeat positions 0,1
    // (the bridging [r p] at 2 is unique) → tokens 3..5 covered, and the
    // two overlapping duplicated windows merge into ONE removed run
    assert(out(3L) == ("p q r", 3))
    // shorter than k: no windows, text passes through (token-joined)
    assert(out(4L) == ("w", 0))
    assert(out(5L) == ("", 0))
  }

  test("maskDuplicateSubstrings finds cross-doc boilerplate on testdata") {
    // real documents table: the corpus carries injected duplicate
    // passages; stride-1 masking must remove tokens somewhere while
    // keeping every document's first-occurrence text intact
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val out = Dedup.maskDuplicateSubstrings(docs, shingleTokens = 8)
    val agg = out.agg(
      sum("n_tokens_removed").cast("long"),
      count(lit(1))).collect().head
    assert(agg.getLong(1) == docs.count())        // row-preserving
    assert(agg.getLong(0) > 0, "expected duplicated runs in testdata")
    // a document containing NO duplicated window must pass through
    // untouched (token-joined) with zero removals — masking can only be
    // triggered by window content that repeats somewhere in the corpus
    import graft.functions.TextFunctions.tokens
    val k = 8
    val toks = col("__toks")
    val windows = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          p => array_join(slice(toks, p + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    val occ = docs.withColumn("__toks", tokens(col("text")))
      .select(col("doc_id"), explode(windows).as("w"))
    val dupWins = occ.groupBy("w").count().filter(col("count") > 1)
    val cleanDocs = docs.join(
      occ.join(dupWins, "w").select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
    val touched = out
      .join(cleanDocs.select("doc_id"), "doc_id")
      .withColumn("__orig", array_join(tokens(col("text")), " "))
      .filter(col("n_tokens_removed") =!= 0 ||
        col("text_substrdedup") =!= col("__orig"))
      .count()
    assert(touched == 0, s"$touched duplicate-free documents were modified")
  }

  test("semanticDupPairs: precision 1, deterministic, dedup keeps min id") {
    val rnd = new scala.util.Random(17)
    // 30 vectors in 3 well-separated directions plus small noise: every
    // within-direction pair has cos > 0.99, cross-direction cos < 0.1
    val dirs = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val embs = (0L until 30L).map { i =>
      val d = dirs((i % 3).toInt)
      (i, d.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }.toDF("vec_id", "embedding")

    val pairs = Dedup.semanticDupPairs(embs, threshold = 0.9, k = 3,
        kmeansIters = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // precision 1 by construction: every reported pair is a true pair
    val exact = Dedup.embeddingNearDupPairs(embs, threshold = 0.9,
        exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    pairs.foreach { case (p, cos) =>
      assert(exact.contains(p), s"false positive $p")
      assert(cos >= 0.9)
    }
    // deterministic: a second run returns the identical pair set
    val again = Dedup.semanticDupPairs(embs, threshold = 0.9, k = 3,
        kmeansIters = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pairs.map(_._1).toSet == again.map(_._1).toSet)

    // semanticDedup: among each connected component of the pair graph the
    // minimum id survives, everything else in the component is dropped
    val docs = embs.select(col("vec_id"))
    val kept = Dedup.semanticDedup(docs, embs, threshold = 0.9, k = 3,
        kmeansIters = 2)
      .select("vec_id").as[Long].collect().toSet
    val comps = Dedup.connectedComponents(
        Dedup.semanticDupPairs(embs, threshold = 0.9, k = 3, kmeansIters = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val losers = comps.collect { case (id, comp) if id != comp => id }.toSet
    assert(kept == (0L until 30L).toSet -- losers)
    comps.groupBy(_._2).foreach { case (_, members) =>
      assert(kept.contains(members.map(_._1).min))
    }
  }

  test("fixed-point Lloyd: partitioning-invariant fit, precision 1, " +
      "quantization only gates which pairs are compared") {
    val embs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    // THE property that motivates integer fixed-point over float Lloyd:
    // the fit is a pure function of the data — identical across
    // partition layouts (a float mean's value depends on partial-merge
    // order; an integer floor-mean's does not). repartition(1) vs (16)
    // must give the SAME pair set, cos values included.
    def pairsAt(n: Int) = Dedup.semanticDupPairsFixedPoint(
        embs.repartition(n), threshold = 0.3, k = 4, kmeansIters = 2,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val p1 = pairsAt(1)
    assert(p1.nonEmpty)
    assert(p1 == pairsAt(16))
    // precision 1 by construction: rescoring is the exact cosine, so
    // every reported pair is a true near-dup pair with its exact score
    val exact = Dedup.embeddingNearDupPairs(embs, threshold = 0.3,
        exact = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    p1.foreach { case (a, b, cos) =>
      assert(exact.get((a, b)).contains(cos), s"false positive ($a,$b)")
    }
    // the clustering bounds recall like any SemDeDup deployment — but on
    // this corpus the 4-cluster nProbe=2 fit should still catch most
    assert(p1.size * 1000000L / exact.size >= 850000L,
      s"recall ${p1.size}/${exact.size} fell below the gate")
  }

  test("semanticDedup far_from_centroid keeps the cluster-edge member") {
    val rnd = new scala.util.Random(29)
    // cluster A: ids 0-8 hug e1 (tiny noise); id 9 is rotated ~10 degrees —
    // still cos > 0.98 to the others (one dup component) but clearly the
    // farthest from the cluster centroid. cluster B: ids 10-14 hug e2.
    def jiggle(d: Array[Float]) =
      d.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
    val a = (0L until 9L).map(i => (i, jiggle(Array(1f, 0f, 0f))))
    val edge = Seq((9L, Array(0.985f, 0.174f, 0f))) // ~10 degrees off e1
    val b = (10L until 15L).map(i => (i, jiggle(Array(0f, 1f, 0f))))
    val embs = (a ++ edge ++ b).toDF("vec_id", "embedding")
    val docs = embs.select(col("vec_id"))

    val keptFar = Dedup.semanticDedup(docs, embs, threshold = 0.9, k = 2,
        kmeansIters = 2, keep = "far_from_centroid")
      .select("vec_id").as[Long].collect().toSet
    // cluster A's survivor is the rotated edge member, NOT min id 0;
    // cluster B's survivor is whichever member noise left farthest out
    assert(keptFar.contains(9L) && !keptFar.contains(0L))
    assert(keptFar.size == 2 && keptFar.exists(id => id >= 10L))

    val keptMin = Dedup.semanticDedup(docs, embs, threshold = 0.9, k = 2,
        kmeansIters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(keptMin == Set(0L, 10L))
  }

  test("semantic dedup covers near-dup pairs on real testdata") {
    // ties the rows-only q_dedup_semantic to exact ground truth: SemDeDup's
    // clustering bounds recall; pin it against the exact all-pairs result
    // at the query's own parameters (threshold 0.3, k=4 — deterministic)
    val embs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup.embeddingNearDupPairs(embs, threshold = 0.3,
        exact = true)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticDupPairs(embs, threshold = 0.3, k = 4,
        kmeansIters = 2, nProbe = 2)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain near-dup pairs at 0.3")
    assert((sem -- exact).isEmpty, "semantic pairs must be a subset of exact")
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.7, f"semantic recall $recall%.2f below bound")
    // single-probe recall is strictly cluster-bounded and lower — the
    // nProbe=2 soft assignment must actually buy boundary pairs back
    val hard = Dedup.semanticDupPairs(embs, threshold = 0.3, k = 4,
        kmeansIters = 2)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hard.subsetOf(sem), "nProbe=2 must cover the nProbe=1 pairs")
  }

  test("embeddingNearDupPairs exact path: cosine over normalized vectors") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)), // same direction
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(embs, threshold = 0.9, exact = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(pairs(((1L, 2L))) - 1.0) < 1e-12)
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L))) // cos = 0.707 < 0.9
  }
}
