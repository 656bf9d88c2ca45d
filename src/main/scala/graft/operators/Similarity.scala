package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.functions.{TopKAggregate, VectorExpressions}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers, all returning (query_id, vec_id, cos, rank):
  *  - [[bruteForceTopK]]: exact. Broadcast the (small) query set against the
  *    (huge) corpus — the corpus is never shuffled, each partition scores its
  *    rows and a partial top-k aggregation cuts the data before the final
  *    per-query sort. This is the shape that survives 100 TB: cost is one
  *    corpus scan regardless of k.
  *  - [[srpTopK]]: sign-random-projection LSH — probe only corpus buckets
  *    matching the query bucket (plus multi-probe neighbors), exact-rescore
  *    inside the bucket. Corpus bucketing is a one-off; at scale you'd write
  *    it bucketed/partitioned by `bucket` so probes are partition-pruned.
  *  - [[ivfTopK]]: IVF — k-means-lite coarse centroids (sampled on driver,
  *    deterministic), corpus assigned to nearest centroid; probe the nProbe
  *    closest centroids per query. Same pruning idea as a real IVF index.
  */
object Similarity {

  /** See Dedup.spread: small-file corpora arrive as one scan partition;
    * shuffle the narrow (id, vec) projection so normalization + scoring
    * parallelize. No-op on well-partitioned inputs.
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Exact top-k by cosine. `queries` must be small enough to broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "qvec")
      : DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val c = spread(corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("__v")))
      .select(col("vec_id"), normalize(col("__v")).as("cv"))
    val q = queries.select(col(queryId).as("query_id"),
      normalize(col(queryVec)).as("qv"))
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("vec_id"), VectorExpressions.dotNative(col("cv"), col("qv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each anchor, the
    * k CLOSEST corpus vectors with a DIFFERENT label — the standard
    * "hard negatives" construction for embedding-model batches (the most
    * confusable wrong answers teach the sharpest margins). Same scale
    * shape as [[bruteForceTopK]]: anchors broadcast, the label-mismatch
    * filter rides the scored stream BEFORE the bounded top-k aggregate,
    * so the exchange carries ≤ anchors × k rows however large the
    * corpus; at index scale the scorer swaps for the IVF probe exactly
    * as in [[ivfTopKIndexed]]. Returns (query_id, vec_id, label, cos,
    * rank).
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                    corpusId: String = "vec_id",
                    corpusVec: String = "embedding",
                    corpusLabel: String = "label",
                    queryId: String = "query_id",
                    queryVec: String = "qvec",
                    queryLabel: String = "qlabel"): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val c = spread(corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("__v"), col(corpusLabel).as("label")))
      .select(col("vec_id"), normalize(col("__v")).as("cv"), col("label"))
    val q = anchors.select(col(queryId).as("query_id"),
      normalize(col(queryVec)).as("qv"), col(queryLabel).as("qlabel"))
    val scored = c.join(broadcast(q))
      .filter(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"), col("label"),
        VectorExpressions.dotNative(col("cv"), col("qv")).as("cos"))
    TopKAggregate.register(scored.sparkSession)
    scored
      .groupBy("query_id")
      .agg(TopKAggregate.topK(
        struct(col("cos"), col("vec_id"), col("label")), lit(k)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        col("col.label").as("label"), col("col.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** LSH: match on SRP bucket, multi-probe by flipping each single bit. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "qvec")
      : DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val dim = corpus.select(size(col(corpusVec))).first().getInt(0)
    val planes = randomPlanes(nBits, dim)
    val c = spread(corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("__v")))
      .select(col("vec_id"), normalize(col("__v")).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
    // multi-probe: query probes its own bucket + all 1-bit-flip neighbors
    val q = queries.select(col(queryId).as("query_id"),
        normalize(col(queryVec)).as("qv"))
      .withColumn("qbucket", srpBucket(col("qv"), planes))
      .withColumn("bucket", explode(concat(array(col("qbucket")),
        transform(sequence(lit(0), lit(nBits - 1)),
          b => col("qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), b))))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("vec_id"), VectorExpressions.dotNative(col("cv"), col("qv")).as("cos"))
      .groupBy("query_id", "vec_id").agg(max("cos").as("cos"))
    topKPerQuery(scored, k)
  }

  /** Spherical k-means over unit vectors, expressed entirely as DataFrame
    * ops so it runs at corpus scale: init = every (n/k)-th vector in id
    * order (deterministic); each Lloyd iteration assigns by max cosine
    * (broadcast centroids, native dot) and recomputes centroids as the
    * re-normalized element-wise mean (posexplode → per-dimension avg).
    * Empty clusters drop out. Returns (centroid_id, centroid).
    */
  def kmeansCentroids(normed: DataFrame, k: Int, iters: Int,
                      vecCol: String = "cv"): DataFrame = {
    VectorExpressions.register(normed.sparkSession)
    // deterministic spread seeds: the k smallest rows by key hash — a
    // TakeOrderedAndProject (distributed top-k), not a global row_number
    // window that would single-partition the corpus (the id-assignment
    // window below runs over the k already-collected seed rows only)
    val keyC = col(normed.columns.head)
    var cents = normed
      .orderBy(xxhash64(keyC), keyC).limit(k)
      .withColumn("centroid_id",
        (row_number().over(Window.orderBy(xxhash64(keyC), keyC)) - 1).cast("int"))
      .select(col("centroid_id"), col(vecCol).as("centroid"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val assigned = assignNearest(normed, cents, vecCol, 1)
      cents = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)))
        .groupBy("centroid_id", "pos").agg(avg("col").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          normalize(transform(col("pm"), s => s.getField("m"))).as("centroid"))
        .localCheckpoint() // truncate per-iteration lineage
    }
    cents
  }

  /** For each row of `df`, its `take` highest-cosine centroids (appended
    * `centroid_id` column; input columns preserved).
    *
    * Same bounded-aggregate shape as [[topKPerQuery]]: the broadcast join
    * leaves each `df` row in its original partition, so the partial
    * graft_topk collapses the row × nCentroids scored stream back to one
    * row per key on the MAP side — the exchange carries |df| rows, not
    * |df| × nCentroids (a rank window would shuffle the full cross score,
    * vectors included).
    */
  private[graft] def assignNearest(df: DataFrame, centroids: DataFrame,
                                       vcol: String, take: Int): DataFrame = {
    TopKAggregate.register(df.sparkSession)
    val key = df.columns.head
    val rest = df.columns.tail.toSeq
    val scored = df.join(broadcast(centroids))
      .withColumn("cdist",
        VectorExpressions.dotNative(col(vcol), col("centroid")))
    val aggs =
      TopKAggregate.topK(struct(col("cdist"), col("centroid_id")), lit(take))
        .as("tk") +: rest.map(c => first(col(c)).as(c))
    scored.groupBy(key).agg(aggs.head, aggs.tail: _*)
      .select(col(key) +: rest.map(col) :+ explode(col("tk")).as("__a"): _*)
      .select(col(key) +: rest.map(col) :+
        col("__a.centroid_id").as("centroid_id") :+
        // the assignment's own cosine rides along: SemDeDup's
        // keep-farthest-from-centroid rule needs it, everyone else drops it
        col("__a.cdist").as("__ccos"): _*)
  }

  /** IVF: k-means coarse quantizer (a few true Lloyd sweeps), corpus
    * assigned to its nearest list, queries probe the nProbe nearest lists —
    * scanned corpus fraction ≈ nProbe/nCentroids of a brute-force pass.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 2,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "qvec")
      : DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val c = spread(corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("__v")))
      .select(col("vec_id"), normalize(col("__v")).as("cv"))
      .localCheckpoint() // consumed by k-means iters AND the final probe join
    val centroids = kmeansCentroids(c, nCentroids, kmeansIters)

    val assigned = assignNearest(c, centroids, "cv", 1) // corpus → 1 list
    val probes = assignNearest(
      queries.select(col(queryId).as("query_id"),
        normalize(col(queryVec)).as("qv")), centroids, "qv", nProbe)
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"), VectorExpressions.dotNative(col("cv"), col("qv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Materialize an IVF index: the corpus, normalized and assigned to its
    * nearest centroid, written as parquet PARTITIONED BY centroid_id, plus
    * the centroid table alongside. This is the 100 TB shape: a probe only
    * opens the `nProbe` matching `centroid_id=...` directories — partition
    * pruning keeps the other (nCentroids − nProbe)/nCentroids of the corpus
    * bytes unread, which a transient in-memory assignment can't do.
    */
  def writeIvfIndex(corpus: DataFrame, path: String,
                    nCentroids: Int = 16, kmeansIters: Int = 2,
                    coarse: Array[Array[Double]] = null,
                    corpusId: String = "vec_id",
                    corpusVec: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val c = spread(corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("__v")))
      .select(col("vec_id"), normalize(col("__v")).as("cv"))
      .localCheckpoint()
    // `coarse` freezes the quantizer (e.g. Pq.hadamardCentroids) — the
    // externally-replayable sibling of the learned k-means default
    val centroids =
      if (coarse != null)
        coarse.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
          .toDF("centroid_id", "centroid")
      else kmeansCentroids(c, nCentroids, kmeansIters)
    assignNearest(c, centroids, "cv", 1)
      .drop("__ccos") // assignment-time score: no index reader uses it
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/lists")
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
  }

  /** Query a materialized IVF index. The `isin(probe lists)` filter on the
    * partition column prunes at the FILE level — check
    * `.explain`'s PartitionFilters; only probed lists are scanned.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nProbe: Int = 4,
                     queryId: String = "query_id", queryVec: String = "qvec")
      : DataFrame = {
    VectorExpressions.register(spark)
    val centroids = spark.read.parquet(s"$path/centroids")
    val probes = assignNearest(
      queries.select(col(queryId).as("query_id"),
        normalize(col(queryVec)).as("qv")), centroids, "qv", nProbe)
    val probeLists = probes.select("centroid_id").distinct()
      .collect().map(_.get(0)) // tiny: ≤ nQueries × nProbe ids
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("centroid_id").isin(probeLists: _*))
    val scored = lists.join(broadcast(probes), Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"),
        VectorExpressions.dotNative(col("cv"), col("qv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Final per-query top-k with deterministic tie-break on vec_id.
    *
    * NOT a rank window: `row_number() OVER (PARTITION BY query_id)` would
    * shuffle every scored row and funnel each query's entire corpus score
    * stream through one reducer. [[graft.functions.BoundedTopK]] aggregates
    * instead — ObjectHashAggregate's Partial mode keeps a ≤ k bounded buffer
    * per query on the MAP side, so the exchange carries at most
    * partitions × queries × k rows no matter how large the corpus is.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    TopKAggregate.register(scored.sparkSession)
    scored
      .groupBy("query_id")
      .agg(TopKAggregate.topK(struct(col("cos"), col("vec_id")), lit(k)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        col("col.cos").as("cos"), (col("pos") + 1).cast("int").as("rank"))
  }
}
