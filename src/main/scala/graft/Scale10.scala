package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× headroom smoke for the most shuffle-intensive operators — the
  * cheapest honest evidence for the 100 TB design claims short of a real
  * cluster: inflate sf0.1 N× with a crossJoin-free generator (replicas
  * are NOT near-duplicates: token rotation breaks shingles, embedding
  * rotation decorrelates vectors — so dedup ops face realistic uniques,
  * not a pathological all-dup corpus), run minhash-index probe /
  * semantic dedup / pagerank / curriculum / heavy hitters /
  * collocations / length-bucketed batching / winnowing / containment /
  * DBSCAN (replicas tile space — constant density) / hybrid BM25+dense
  * search / phash near-dup / SCD2 point-in-time join / cross-table
  * 2PC over WAP, and assert
  *
  *  - completion with the default 8g driver heap;
  *  - NO single-task funnel: for every stage moving real shuffle volume,
  *    the largest task's shuffle read stays a bounded share of the
  *    stage's total (a global-window funnel would put ~100% through one
  *    task; balanced hash/range partitioning sits near 1/partitions);
  *  - the narrow-band LSH candidate stage is SIGNATURE-FREE on the wire
  *    (lsh_candidates runs over pre-materialized signatures and its
  *    measured shuffle-write bytes must stay far under the
  *    nDocs × bands × k × 8 payload the old sig-on-every-band-row
  *    shape would have added).
  *
  * Every op row also carries `sec_per_mrow_out` (seconds per million
  * OUTPUT rows): the output-bound ops (phash, semantic_dedup) grow
  * superlinearly in wall time at 30× because replica density grows
  * near-dup PAIRS superlinearly in this synthetic inflation — the
  * per-output-row cost staying at-or-below-flat is the honest claim,
  * readable without cross-field arithmetic.
  *
  * Run by hand (results committed as BENCH_SCALE10.json):
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.Scale10"
  * `SPARK_GRAFT_SCALE` overrides the 10× factor.
  */
object Scale10 {

  /** Per-(stage, attempt) (shuffle-read bytes, max single-task read,
    * tasks, shuffle-WRITE bytes). Keyed by attempt too: a retried stage
    * merged into one entry would double-count total bytes and deflate
    * the max-task share. Write bytes feed the byte-shape evidence
    * (what did this op actually put on the wire). */
  private final class FunnelListener extends SparkListener {
    val stages = new java.util.concurrent.ConcurrentHashMap[
      Long, (Long, Long, Int, Long)]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val read = m.shuffleReadMetrics.totalBytesRead
        val written = m.shuffleWriteMetrics.bytesWritten
        val key = (e.stageId.toLong << 16) | (e.stageAttemptId & 0xffffL)
        stages.merge(key, (read, read, 1, written),
          (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3,
            a._4 + b._4))
      }
    }
    /** Total shuffle bytes WRITTEN since the last reset — the op's whole
      * wire footprint (every exchange's map-side output, compressed). */
    def shuffleWriteBytes: Long = {
      var t = 0L
      stages.forEach { (_: Long, v: (Long, Long, Int, Long)) => t += v._4 }
      t
    }
    /** (worst max-task share, its stage id, #qualifying stages) over
      * stages with ≥ minTasks tasks and ≥ minBytes total shuffle read —
      * the count makes a 0.0 reading interpretable (no qualifying stage
      * vs genuinely balanced). */
    def worstShare(minTasks: Int, minBytes: Long): (Double, Int, Int) = {
      var worst = 0.0; var worstStage = -1; var n = 0
      stages.forEach { (key: Long, v: (Long, Long, Int, Long)) =>
        val (total, maxTask, tasks, _) = v
        if (tasks >= minTasks && total >= minBytes) {
          n += 1
          val share = maxTask.toDouble / total
          if (share > worst) { worst = share; worstStage = (key >> 16).toInt }
        }
      }
      (worst, worstStage, n)
    }
    /** Task-end events are delivered asynchronously on the listener-bus
      * thread — reading right after an action returns can miss the final
      * stage's stragglers (exactly the tasks the funnel gate exists to
      * police). Wait until the map stops changing (two consecutive
      * identical fingerprints), bounded. */
    def quiesce(maxWaitMs: Long = 5000L): Unit = {
      def fp(): Long = {
        var h = 0L
        stages.forEach { (k: Long, v: (Long, Long, Int, Long)) =>
          h += k * 31L + v._1 + v._2 * 7L + v._3 + v._4 * 3L
        }
        h
      }
      val deadline = System.currentTimeMillis() + maxWaitMs
      var prev = fp()
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(150)
        val cur = fp()
        if (cur == prev) return
        prev = cur
      }
    }
    def reset(): Unit = stages.clear()
  }

  /** Crossjoin-free N× corpus: replica k shifts ids by k·10⁷ and ROTATES
    * the token sequence by k·7 positions — same token multiset (heavy
    * hitters see 10× counts), almost disjoint shingles (minhash sees
    * mostly-unique docs plus the k=0 originals). */
  def inflateDocs(docs: DataFrame, times: Int): DataFrame =
    docs.withColumn("__k",
        explode(sequence(lit(0), lit(times - 1))))
      .withColumn("__toks", split(col("text"), "\\s+"))
      .withColumn("__r",
        pmod(col("__k") * 7, greatest(size(col("__toks")), lit(1))))
      .select(
        (col("doc_id") + col("__k").cast("long") * 10000000L).as("doc_id"),
        array_join(concat(
            slice(col("__toks"), col("__r") + 1,
              size(col("__toks")) - col("__r")),
            slice(col("__toks"), lit(1), col("__r"))), " ").as("text"),
        col("source"), col("n_chars"))

  /** N× embeddings: replica k rotates the vector k positions — unit norm
    * preserved, directions decorrelated across replicas. */
  def inflateEmbeddings(embs: DataFrame, times: Int): DataFrame =
    embs.withColumn("__k",
        explode(sequence(lit(0), lit(times - 1))))
      .withColumn("__r", pmod(col("__k"), size(col("embedding"))))
      .select(
        (col("vec_id") + col("__k").cast("long") * 10000000L).as("vec_id"),
        concat(
          slice(col("embedding"), col("__r") + 1,
            size(col("embedding")) - col("__r")),
          slice(col("embedding"), lit(1), col("__r"))).as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val times = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // keep every exchange at `cpus` tasks: AQE would coalesce these
      // (deliberately small) smoke shuffles to 1-4 tasks, excluding them
      // from the ≥8-task funnel gate and making its 0.0 reading vacuous —
      // with fixed fan-out the max-task share is meaningful evidence
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new FunnelListener
    spark.sparkContext.addSparkListener(listener)

    val docs0 = graft.sources.Tables.load(spark, sfDir, "documents")
    val origN = docs0.count()
    val docs = inflateDocs(docs0, times)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val embs = inflateEmbeddings(
      graft.sources.Tables.load(spark, sfDir, "embeddings"), times)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val nDocs = docs.count()
    val nEmbs = embs.count()

    def timed(name: String)(body: => Long)
        : (String, Double, Long, Double, Int) = {
      listener.reset()
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      listener.quiesce() // drain async task-end events before reading
      // funnel gate: stages with ≥ 8 tasks fetching ≥ 64 KiB (compressed)
      // must not put more than 60% of the stage's shuffle read through
      // one task — fixed-width long-pair exchanges compress hard, so the
      // floor sits low enough that the iterative ops' stages qualify
      val (share, stage, n) = listener.worstShare(8, 64L << 10)
      require(share <= 0.6,
        s"$name: single-task funnel — stage $stage max share $share")
      (name, sec, rows, share, n)
    }

    // narrow-band LSH shape under byte-pricing: ONE set of constants for
    // the lsh_candidates op AND its envelope below — duplicated scopes
    // let a retune silently invalidate the signature-free gate
    val lshBands = 16
    val lshRowsPerBand = 4
    val lshK = lshBands * lshRowsPerBand

    val results = Seq(
      timed("minhash_index_probe") {
        val log = new graft.lake.LakeLog(
          java.nio.file.Files.createTempDirectory("s10lsh"))
        graft.operators.DedupIndex.buildIndex(spark, log, "lsh",
          docs.filter(col("doc_id") % 10000000L % 3 =!= 0))
        graft.operators.DedupIndex.probeIndex(spark, log, "lsh",
          docs.filter(col("doc_id") % 10000000L % 3 === 0),
          threshold = 0.5).count()
      },
      timed("semantic_dedup") {
        graft.operators.Dedup.semanticDupPairs(embs, threshold = 0.3,
          k = 0, kmeansIters = 2, nProbe = 2).count()
      },
      timed("pagerank") {
        // syntheticLinks wants contiguous 0..n-1 ids: densify the
        // replica-shifted ids (replica k, original i -> k*origN + i)
        val dense = docs.select(
          (expr("doc_id div 10000000") * origN +
            col("doc_id") % 10000000L).as("doc_id"))
        graft.operators.LinkGraph.pageRank(
          graft.operators.LinkGraph.syntheticLinks(dense, k = 3),
          iters = 5).count()
      },
      timed("curriculum") {
        graft.operators.Curriculum.interleave(
          docs.select("doc_id", "source", "n_chars"), "source",
          Seq(col("n_chars").desc, col("doc_id").asc),
          lit(1) + substring(col("source"), 4, 10).cast("long") % 4).count()
      },
      timed("heavy_hitters") {
        graft.operators.HeavyHitters.exactHeavy(
          docs.select(explode(split(col("text"), "\\s+")).as("item")),
          denom = 40).count()
      },
      timed("collocations") {
        graft.operators.Collocations.topByConfidence(
          docs, minCount = 5L, k = 20).count()
      },
      timed("length_batches") {
        graft.operators.Packing.lengthBucketedBatches(
          docs, bucketWidth = 16, batchSize = 8).count()
      },
      timed("winnowing") {
        // df ≤ 50 stop-hash gate bounds the fingerprint self-join's
        // per-hash fan-out at df² regardless of corpus size; selection
        // density stays 2/(w+1) of gram positions at any N
        graft.operators.Winnowing.overlapPairs(
          docs.select(col("doc_id"), col("text").as("page")),
          k = 3, w = 4, maxDf = 50, minShared = 2).count()
      },
      timed("containment") {
        graft.operators.Containment.containmentPairs(
          docs.select(col("doc_id"), col("text").as("page")),
          n = 3, maxDf = 50, minPpm = 300000).count()
      },
      timed("dbscan") {
        // replicas tile SPACE, not density: constant per-cell occupancy
        // is the honest 100 TB shape (more data covers more domain) and
        // keeps the eps-cell equi-join's Σ occupancy² envelope linear
        // in N — densifying one fixed box would square it instead
        val pts = graft.operators.Dbscan.synthesizePoints(embs)
          .withColumn("x", col("x") + expr("id div 10000000") * 5000L)
        graft.operators.Dbscan.cluster(pts, eps = 60L, minPts = 4,
          rounds = 5).count()
      },
      timed("hybrid_search") {
        import graft.operators.{HybridSearch, InvertedIndex}
        val posts = InvertedIndex.postingsWithLen(docs)
        val lex = HybridSearch.lexicalArm(posts,
          InvertedIndex.bm25Stats(posts),
          Seq(0 -> Seq("spark", "window", "hash"),
            1 -> Seq("join", "sort", "merge")), topN = 50)
        val q = embs.filter(col("vec_id") < 2)
          .select(col("vec_id").cast("int").as("query_id"),
            col("embedding").as("qvec"))
        // dense arm = bounded graft_topk aggregate: the 10× corpus's
        // scored stream truncates to topN per query on the map side
        HybridSearch.rrfFuse(lex,
          HybridSearch.cosineArm(embs, q, topN = 50)).count()
      },
      timed("entity_resolution") {
        // blocking keys bound the candidate join: name blocks are ≤ 2
        // records (planted variant pairs), the (nat, length-band)
        // second pass ~ N / (25 × ~50 bands) per block — occupancy
        // stays constant as replicas widen the id domain
        val base = docs.select(col("doc_id").as("id"),
          concat(lit("entity-"), col("doc_id")).as("name"),
          col("source").as("seg"), (col("doc_id") % 25).as("nat"),
          col("n_chars").as("bal"))
        val recs = base.unionByName(
          base.filter(col("id") % 3 === 0).select(
            (col("id") + 1000000000L).as("id"),
            upper(col("name")).as("name"), col("seg"), col("nat"),
            (col("bal") + 3L).as("bal")))
          .withColumn("name_norm", lower(col("name")))
        val m = graft.operators.EntityResolution.matchPairs(recs, "id",
          Seq("name_norm",
            "concat(cast(nat as string), '|', cast(bal div 10 as string))"),
          Seq(("name_norm_a = name_norm_b", 50L),
            ("abs(bal_a - bal_b) <= 5", 30L), ("seg_a = seg_b", 20L)),
          threshold = 80L)
        graft.operators.EntityResolution.entities(recs, "id", m).count()
      },
      timed("phash") {
        // decode cost ∝ images (linear); pairing never sees pixels —
        // Manku 16-bit block buckets bound the candidate join's fan-out
        graft.operators.Phash.nearDupPairs(
          graft.operators.Phash.dHash(
            graft.operators.Phash.variantCorpus(docs)).toDF(),
          maxHamming = 3).count()
      },
      timed("scd2_asof_join") {
        // N×-sized dimension AND fact side through the point-in-time
        // join: change detection is one key equi-join vs the CURRENT
        // slice, the as-of join one key equi-join + interval filter —
        // both hash-partition on the business key, so the funnel gate
        // polices exactly the exchanges that grow with N
        import graft.lake.{LakeLog, LakeTable, Scd}
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10scd"))
        val dim0 = docs.select(col("doc_id").as("key"),
          col("source").as("seg"))
        Scd.create(log, "dim", dim0.schema)
        Scd.applyBatch(spark, log, "dim", dim0, "key", Seq("seg"), 0L, "b0")
        Scd.applyBatch(spark, log, "dim",
          dim0.filter(col("key") % 4 === 0)
            .select(col("key"), lit("MOVED").as("seg")),
          "key", Seq("seg"), 1L, "b1")
        val facts = docs.select(col("doc_id").as("fkey"),
          (col("doc_id") % 2).as("t_fact"), col("n_chars"))
        Scd.joinAsOf(facts, LakeTable.read(spark, log, "dim"),
            "key", "fkey", "t_fact")
          .groupBy("seg").agg(count(lit(1))).count()
      },
      timed("multitxn_wap") {
        // cross-table 2PC at N×: stage two N×-sized participants through
        // the WAP path, one decision publishes both; the readback
        // aggregate shuffles the adopted files. Commit cost is decision-
        // file + per-table OCC entries — metadata-priced at any N
        import graft.lake.{LakeLog, LakeTable, MultiTxn}
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10txn"))
        val a = docs.select(col("doc_id").as("id"), col("source"),
          col("n_chars"))
        val b = embs.select(col("vec_id").as("id"),
          element_at(col("embedding"), 1).as("e0"))
        LakeTable.createTable(log, "ta", a.schema)
        LakeTable.createTable(log, "tb", b.schema)
        MultiTxn.stage(spark, log, "s10", "ta", a, numFiles = 8)
        MultiTxn.stage(spark, log, "s10", "tb", b, numFiles = 8)
        MultiTxn.commit(spark, log, "s10", Seq("ta", "tb"))
        LakeTable.read(spark, log, "ta")
          .groupBy("source").agg(count(lit(1))).count() +
          LakeTable.read(spark, log, "tb").count()
      },
      timed("tcloseness") {
        // step search = one aggregate per ladder step (two longs to the
        // driver each); the per-class EMD joins a broadcast m-row global
        // distribution — the only N-sized exchanges are the groupBys on
        // the quasi-identifier, policed by the funnel gate
        val recs = docs.select(col("source"),
          (col("doc_id") % 25).as("region"),
          (col("n_chars") % 64).as("bal"))
        graft.operators.Anonymize.tCloseness(recs, k = 3, tPpm = 400000L,
          ladders = Seq(
            graft.operators.Anonymize.Ladder("g_reg", Seq(
              "CAST(region AS STRING)",
              "CAST(region div 5 AS STRING)", "'*'")),
            graft.operators.Anonymize.Ladder("g_src", Seq(
              "source", "source", "'*'"))),
          sensitiveExpr = "bal div 16",
          maxSuppressedPpm = 300000L).count()
      },
      timed("unigram_train") {
        // one distributed substring-count pass; the collected model is
        // inventory-sized (token rotation preserves the multiset, so the
        // vocabulary — and the driver transfer — is N-invariant)
        graft.operators.Unigram.train(docs, maxPieceLen = 4,
          minCount = 20L * times).scores.size.toLong
      },
      timed("lttb") {
        // 256 series × (N·docs/256) points: one key shuffle, then an
        // O(n) sequential pass per series — series count, not corpus
        // size, bounds the parallel width; funnel gate polices the
        // key exchange
        val series = docs.select((col("doc_id") % 256).as("series"),
          col("doc_id").as("t_us"), col("n_chars").as("v"))
        graft.operators.Downsample.lttb(series, "series", "t_us", "v",
          buckets = 22).count()
      },
      timed("mann_kendall") {
        // O(n log n) tie-aware inversion counting per series — the
        // all-pairs S statistic without the all-pairs join
        val series = docs.select((col("doc_id") % 256).as("series"),
          col("doc_id").as("t_us"), col("n_chars").as("v"))
        graft.operators.Trend.mannKendall(series, "series", "t_us", "v")
          .count()
      },
      timed("mv_join_refresh") {
        // join-MV maintenance at N×: two fact-append windows fold
        // incrementally (delta ⋈ dim enrich + O(touched) upsert merge),
        // then a dim commit forces the ONE corpus-shaped path — the
        // full fact ⋈ dim recompute — which is exactly what this row
        // prices; the funnel gate polices the join/groupBy exchanges
        import graft.lake.{LakeLog, LakeTable, MaterializedView}
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10mvj"))
        // star shape: N×-sized fact keyed back onto a 1×-sized dim
        val fact = docs.select(
          pmod(col("doc_id"), lit(10000000L)).as("fk"),
          col("n_chars").cast("double").as("v"))
        val dim = docs.filter(col("doc_id") < 10000000L)
          .select(col("doc_id").as("fk"), col("source").as("grp"))
        LakeTable.createTable(log, "f", fact.schema)
        LakeTable.createTable(log, "dm", dim.schema)
        LakeTable.insert(spark, log, "dm", dim, numFiles = 4,
          txnId = "dim0")
        val d = MaterializedView.MvDef("mvj", "f", "grp",
          sumCols = Seq("v"), joinTable = Some("dm"), joinOn = Some("fk"))
        MaterializedView.create(log, d)
        LakeTable.insert(spark, log, "f",
          fact.filter(pmod(col("fk"), lit(2)) === 0), numFiles = 8,
          txnId = "w1")
        require(MaterializedView.refresh(spark, log, d).mode ==
          "incremental", "first fact window should fold incrementally")
        LakeTable.insert(spark, log, "f",
          fact.filter(pmod(col("fk"), lit(2)) =!= 0), numFiles = 8,
          txnId = "w2")
        require(MaterializedView.refresh(spark, log, d).mode ==
          "incremental", "append window should fold incrementally")
        LakeTable.insert(spark, log, "dm",
          spark.range(1).select(lit(-1L).as("fk"), lit("zz").as("grp")),
          txnId = "dim-late")
        require(MaterializedView.refresh(spark, log, d).mode == "full",
          "dim commit must force the full recompute")
        LakeTable.read(spark, log, "mvj").count()
      },
      timed("merge_into") {
        // full conditional MERGE at N×: the source's key range
        // stats-prunes candidate files (target id-clustered via
        // zOrderBy), matched rows CASE-fold in one pass, one OCC
        // commit; funnel polices the source⋈candidate key join
        import graft.lake.{LakeLog, LakeTable}
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10mrg"))
        val tgt = docs.select(col("doc_id").as("id"),
          col("source").as("seg"), col("n_chars").cast("double").as("v"))
        LakeTable.createTable(log, "t", tgt.schema)
        LakeTable.insert(spark, log, "t", tgt, numFiles = 16,
          zOrderBy = Seq("id"))
        // pruned key range: updates hit only the ORIGINAL replica's id
        // span (1/times of the clustered id domain) + disjoint inserts
        val src = tgt.filter(col("id") < 10000000L)
          .select(col("id"), col("seg"), (col("v") + 1.0).as("v"))
          .unionByName(tgt.filter(col("id") < 1000L).select(
            (col("id") + 900000000L).as("id"), col("seg"), col("v")))
        val r = LakeTable.merge(spark, log, "t", src, "id",
          matched = Seq(
            LakeTable.MergeClause("delete", Some("src_v < 0")),
            LakeTable.MergeClause("update")),
          insertWhen = Some(None))
        require(r.updated > 0 && r.inserted > 0, s"merge did nothing: $r")
        LakeTable.read(spark, log, "t").count()
      },
      timed("table_changes") {
        // CDC read at N×: the feed enumerates the requested window's
        // adds plus DV pre-images — O(changed files), never a
        // full-history scan; the aggregate over the feed is the
        // funnel-policed exchange
        import graft.lake.{LakeLog, LakeTable}
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10cdc"))
        val rows = docs.select(col("doc_id").as("id"), col("source"),
          col("n_chars").cast("long").as("v"))
        LakeTable.createTable(log, "t", rows.schema)
        LakeTable.insert(spark, log, "t",
          rows.filter(col("id") % 2 === 0), numFiles = 8, txnId = "b1")
        LakeTable.insert(spark, log, "t",
          rows.filter(col("id") % 2 =!= 0), numFiles = 8, txnId = "b2")
        LakeTable.deleteWhereMor(spark, log, "t", "v % 97 = 0")
        LakeTable.changeFeed(spark, log, "t", 1, 3)
          .groupBy("_change_type", "source")
          .agg(count(lit(1)).as("n"), sum("v").as("sv")).count() +
          LakeTable.changeFeed(spark, log, "t", 1, 3).count()
      },
      timed("mv_rewrite_read") {
        // the round-19 join-MV rewrite's READ path at N×: after refresh,
        // the naive fact ⋈ dim aggregate must be answered from the MV
        // alone — the in-flight require pins the optimized plan to the
        // MV scan, so the timed read is O(|MV rows|) whatever N is (the
        // refresh itself is priced by mv_join_refresh above)
        import graft.lake.{LakeLog, LakeTable, MaterializedView, MvRewrite}
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10mvr"))
        val fact = docs.select(
          pmod(col("doc_id"), lit(10000000L)).as("fk"),
          col("n_chars").cast("double").as("v"))
        val dim = docs.filter(col("doc_id") < 10000000L)
          .select(col("doc_id").as("fk"), col("source").as("grp"))
        LakeTable.createTable(log, "f", fact.schema)
        LakeTable.createTable(log, "dm", dim.schema)
        LakeTable.insert(spark, log, "dm", dim, numFiles = 4, txnId = "d0")
        LakeTable.insert(spark, log, "f", fact, numFiles = 8, txnId = "f0")
        val d0 = MaterializedView.MvDef("mvr", "f", "grp",
          sumCols = Seq("v"), joinTable = Some("dm"), joinOn = Some("fk"))
        MaterializedView.create(log, d0)
        MaterializedView.refresh(spark, log, d0)
        MvRewrite.register(spark, log, Seq(d0))
        try {
          val q = LakeTable.readIndexed(spark, log, "f")
            .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"),
              "inner")
            .groupBy("grp")
            .agg(count(lit(1)).as("n"), sum("v").as("sv"))
          val scanned = q.queryExecution.optimizedPlan.collectLeaves()
            .flatMap {
              case lr: org.apache.spark.sql.execution.datasources
                  .LogicalRelation => lr.relation match {
                case h: org.apache.spark.sql.execution.datasources
                    .HadoopFsRelation => h.location match {
                  case i: graft.lake.LakeFileIndex => Some(i.tableName)
                  case _ => None
                }
                case _ => None
              }
              case _ => None
            }
          require(scanned == Seq("mvr"),
            s"rewrite must fire at scale (scanned: ${scanned.mkString(",")})")
          q.count()
        } finally MvRewrite.clear(spark)
      },
      timed("sketch_store_compact") {
        // round-19 sketch-store compaction at N×: B per-batch digest
        // commits (distributed sketching is the only row-shaped work),
        // then ONE compaction commit merging each key's digests — the
        // compaction input is O(batches × keys) sketch rows, never
        // values, so its cost is N-invariant by construction; the
        // post-compaction read must answer from O(keys) rows
        import graft.lake.{LakeLog, LakeTable}
        import graft.operators.QDigest
        val log = new LakeLog(
          java.nio.file.Files.createTempDirectory("s10skc"))
        val vals = docs.select(col("source"),
          (col("n_chars") % (1L << 20)).as("v"),
          pmod(col("doc_id"), lit(3)).as("day"))
        (0L to 2L).foreach { b =>
          val batch = QDigest.sketchRowsByKey(
            vals.filter(col("day") === b), "source", "v",
            depth = 20, k = 2000L)
          if (b == 0L) LakeTable.createTable(log, "sk", batch.schema)
          LakeTable.insert(spark, log, "sk", batch, txnId = s"d$b")
        }
        val (beforeRows, afterRows) =
          QDigest.compactSketchStore(spark, log, "sk", "source")
        require(afterRows < beforeRows,
          s"compaction must shrink the store ($beforeRows -> $afterRows)")
        QDigest.quantilesOfSketchRows(
          LakeTable.read(spark, log, "sk"), "source",
          qsPpm = Seq(500000L, 990000L)).count()
      },
      timed("qdigest") {
        // per-partition digests (the only per-row work) + a grouped
        // face: exchanges carry ≤3k-node sketches / (key, sketch)
        // partials, never rows — sketch size and wire cost are
        // N-invariant by construction; funnel gate polices the key
        // exchange
        val vals = docs.select(col("source"),
          (col("n_chars") % (1L << 20)).as("v"))
        val sk = graft.operators.QDigest.sketch(
          vals.select("v"), "v", depth = 20, k = 2000L)
        require(sk.n >= nDocs, s"qdigest lost rows: ${sk.n} < $nDocs")
        graft.operators.QDigest.quantilesByKey(vals, "source", "v",
          depth = 20, k = 2000L,
          qsPpm = Seq(500000L, 990000L)).count()
      }, {
        // narrow-band LSH candidate mining, byte-priced (LAST in the op
        // list: the listener window survives the timed call, so the
        // shuffle-write readout below sees exactly this op's stages).
        // Signatures are computed and persisted BEFORE the measured
        // window — the candidate job's wire footprint is then exactly
        // the claim under test: (id, band, bucket) band rows + deduped
        // id pairs, never the k-long signatures. The old wide shape
        // would have added sigBytes = nDocs × bands × k × 8 of
        // replicated signature payload to these same exchanges.
        val sigs = graft.operators.Dedup.portableSigs(docs, lshK)
          .persist()
        sigs.count() // materialize outside the byte-measured window
        timed("lsh_candidates") {
          graft.operators.Dedup.minhashLshCandidates(
            sigs, lshBands, lshRowsPerBand).count()
        }
      })
    // candidate-stage byte-shape evidence (reads the LAST op's listener
    // window — keep lsh_candidates the final entry above)
    val candBytes = listener.shuffleWriteBytes
    val candPairs = results.last._3
    val bandRows = nDocs * lshBands
    // compressed wire bytes per band row vs the ≥ k×8 B/row the wide
    // shape's replicated signature would add: "signature-free" means the
    // measured per-row cost stays an order of magnitude under it
    val bytesPerBandRow = candBytes.toDouble / math.max(bandRows, 1L)
    val sigEnvelope = bandRows.toDouble * lshK * 8
    require(candBytes < 0.5 * sigEnvelope,
      s"lsh candidate stage moved ${candBytes}B — not signature-free " +
        s"(wide-shape envelope ${sigEnvelope.toLong}B)")

    val rt = Runtime.getRuntime
    System.gc()
    val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val ops = results.map { case (n, sec, rows, share, nq) =>
      // sec_per_mrow_out: output-rows-normalized cost. Output-bound ops
      // (phash, semantic_dedup) grow superlinearly in WALL time at 30×
      // because replica density grows near-dup PAIRS superlinearly in
      // this synthetic inflation — per-output-row cost at-or-below-flat
      // is the honest scale claim, readable here without cross-field
      // arithmetic
      val perMrow = if (rows > 0) sec * 1e6 / rows else 0.0
      s""""$n":{"sec":${num(sec)},"rows":$rows,""" +
        s""""sec_per_mrow_out":${num(perMrow)},""" +
        s""""max_task_share":${num(share)},"gated_stages":$nq}"""
    }.mkString(",")
    println(s"""{"metric":"scale10","sf":"$sfDir","times":$times,""" +
      s""""n_docs":$nDocs,"n_embeddings":$nEmbs,"heap_mb":$heapMb,""" +
      s""""funnel_gate":0.6,""" +
      s""""lsh_candidate_stage":{"bands":$lshBands,"k":$lshK,""" +
      s""""shuffle_write_mb":${num(candBytes / 1e6)},"pairs":$candPairs,""" +
      s""""bytes_per_band_row":${num(bytesPerBandRow)},""" +
      s""""wide_sig_envelope_mb":${num(sigEnvelope / 1e6)}},""" +
      s""""ops":{$ops}}""")
    spark.stop()
  }
}
