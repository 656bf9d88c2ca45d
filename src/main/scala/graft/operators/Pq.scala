package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PqExpressions, TopKAggregate, VectorExpressions}
import graft.functions.VectorFunctions.normalize

/** Product quantization (Jégou, Douze, Schmid — "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): the billion-vector compression
  * layer under every IVF-PQ deployment. The d-dim space factors into `m`
  * subspaces of d/m dims; each subspace carries a small codebook, and a
  * vector compresses to `m` small code ids — 64 floats (256 B) → 8 codes
  * (8 B) at m=8 — while queries score compressed rows via Asymmetric
  * Distance Computation: one per-query lookup table of subspace dot
  * products, then each candidate costs `m` table lookups and adds. The
  * corpus is never decompressed, which is the point at 100 TB: the index
  * fits where the vectors can't.
  *
  * Scale shape: encoding is a per-row projection (no shuffle; the codebook
  * is a plan literal), ADC scoring joins the compressed corpus against
  * broadcast query LUTs and feeds the bounded [[TopKAggregate]] — the
  * exchange carries ≤ partitions × queries × k rows, like every ANN top-k
  * here. Compose with the IVF index for the full IVF-PQ: partition-pruned
  * lists, PQ-compressed entries.
  *
  * Codebooks here are FROZEN closed-form constants (exact dyadic entries —
  * see [[codebook]]) rather than k-means-learned: deterministic, engine-
  * independent, and the reason the whole encode→ADC→top-k pipeline sits
  * under the exact cross-engine oracle (q_ann_pq). A learned-codebook
  * variant would drop in via the same `cb` parameter shape.
  */
object Pq {

  /** Closed-form codebook entry: subspace `s`, code `c`, component `j` ↦
    * `(((5s + 3c + 7j + cj) mod 16) − 7.5) / 64` — exact dyadic 1/128
    * units (every engine parses the identical double); the `3c` term has
    * full period 16 in `c` (gcd(3,16)=1) while `cj` decorrelates the
    * subspace patterns, so all `nCodes ≤ 16` code vectors are distinct.
    * The /64 scale puts entries at ±0.12 — the magnitude of one component
    * of a unit vector spread over 64 dims — so L2 code assignment
    * discriminates instead of collapsing everything onto the
    * smallest-norm codeword.
    */
  def codebook(dim: Int, m: Int, nCodes: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    Array.tabulate(m, nCodes, sub)((s, c, j) =>
      (((5 * s + 3 * c + 7 * j + c * j) % 16) - 7.5) / 64.0)
  }

  /** LEARNED codebooks — the production path (the frozen closed form above
    * is the oracle face, exactly like semantic dedup's frozen codebook):
    * per-subspace Lloyd with L2 assignment and plain-mean updates, which is
    * what PQ's ADC approximation assumes (`cb ≈ E[x_sub | cluster]`;
    * re-normalizing the means would bias every lookup). All `m` subspaces
    * train in ONE plan per iteration: vectors explode into (id, s, subv)
    * rows, assignment is a broadcast join + min-L2 struct-min, updates are
    * a per-(s, code, dim) average — so the iteration cost is one pass over
    * m·n narrow rows regardless of m, and the returned codebooks are tiny
    * (m × nCodes × d/m doubles) driver constants.
    */
  def learnCodebooks(corpus: DataFrame, m: Int = 8, nCodes: Int = 16,
                     iters: Int = 2, idCol: String = "vec_id",
                     vecCol: String = "embedding")
      : Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    VectorExpressions.register(spark)
    PqExpressions.register(spark)
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val subRows = corpus
      .select(col(idCol).as("id"), normalize(col(vecCol)).as("cv"))
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("s"),
        col("cv"))
      .select(col("id"), col("s"),
        slice(col("cv"), col("s") * sub + 1, lit(sub)).as("subv"))
      .localCheckpoint() // read by every Lloyd round
    // deterministic seeds: per subspace, the nCodes lowest (hash, id) rows
    var cents = subRows
      .withColumn("__h", xxhash64(col("id")))
      .withColumn("c", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("s")
          .orderBy("__h", "id")) - 1)
      .filter(col("c") < nCodes)
      .select(col("s"), col("c"), col("subv").as("cvec"))
      .localCheckpoint()
    val l2 = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v)
    (1 to iters).foreach { _ =>
      val assigned = subRows.join(broadcast(cents), Seq("s"))
        .select(col("id"), col("s"), col("subv"),
          struct(l2(col("subv"), col("cvec")).as("d"), col("c").as("c"))
            .as("dc"))
        .groupBy("id", "s").agg(min("dc").as("w"), first("subv").as("subv"))
        .select(col("s"), col("w.c").as("c"), col("subv"))
      cents = assigned
        .select(col("s"), col("c"), posexplode(col("subv")))
        .groupBy("s", "c", "pos").agg(avg("col").as("mv"))
        .groupBy("s", "c")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv"))))
          .as("pm"))
        .select(col("s"), col("c"),
          transform(col("pm"), p => p.getField("mv")).as("cvec"))
        .localCheckpoint()
    }
    val out = Array.fill(m, nCodes)(Array.fill(sub)(0.0))
    cents.collect().foreach { r =>
      out(r.getInt(0))(r.getInt(1)) =
        r.getSeq[Double](2).toArray
    }
    // empty clusters (possible on tiny corpora) keep their zero vector —
    // nothing assigns to them and ADC lookups stay finite
    out
  }

  /** `codes` expression over an already-normalized vector column: per
    * subspace, the code whose codebook vector has the lowest L2 distance
    * to the subvector — equivalently the highest `dot − ‖cb‖²/2`, which is
    * the form both this expression and the SQL oracle compute (ties →
    * higher code id). Emitted as the native [[PqExpressions.encodeCodes]]
    * kernel: the old Column form unrolled m × nCodes struct comparisons
    * into one projection and blew janino's 64 KB method limit at the
    * learned-codebook operating point (silent interpreted fallback);
    * the kernel is loop-shaped, bit-identical, and pinned compiled by
    * PqSpec. */
  private def codesCol(cv: Column, cb: Array[Array[Array[Double]]])
      : Column = PqExpressions.encodeCodes(cv, cb)

  /** Flattened per-query lookup table (m × nCodes subspace dots, index
    * `s·nCodes + c`) over a normalized query-vector column — native
    * kernel, same rationale as [[codesCol]]. */
  private def lutCol(qv: Column, cb: Array[Array[Array[Double]]]): Column =
    PqExpressions.lutOf(qv, cb)

  /** ADC score expression: `Σ_s lut[s·nCodes + codes[s]]` in fixed s order
    * (the DuckDB oracle sums a list built in the same order —
    * float-order identical). Expects `lut` and `codes` columns. The old
    * higher-order `aggregate(sequence(...))` form was CodegenFallback —
    * interpreted per CANDIDATE row on the probe hot path; the native
    * kernel keeps the scoring stage inside whole-stage codegen. */
  private def adcCol(m: Int, nCodes: Int): Column =
    PqExpressions.adcOf(col("codes"), col("lut"), nCodes)

  /** Normalize and compress `vecCol` to `m` code ids ([[codesCol]] rule).
    * Appends `codes` = array<int> of length m. `cb0` defaults to the
    * frozen [[codebook]].
    */
  def encode(corpus: DataFrame, m: Int = 8, nCodes: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding",
             cb0: Array[Array[Array[Double]]] = null): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    PqExpressions.register(corpus.sparkSession)
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val cb = if (cb0 != null) cb0 else codebook(dim, m, nCodes)
    corpus
      .select(col(idCol).as("vec_id"), normalize(col(vecCol)).as("cv"))
      .select(col("vec_id"), col("cv"), codesCol(col("cv"), cb).as("codes"))
  }

  /** ADC top-k: score every compressed corpus row against each query's
    * lookup table and keep the k best per query. The LUT is computed once
    * per query (m × nCodes subspace dots, flattened so a code lookup is
    * one `element_at`) and broadcast; the per-candidate cost is m lookups
    * + adds over the 1-byte-scale codes — never a full-width dot. Returns
    * (query_id, vec_id, adc, rank); `adc` approximates the cosine of the
    * normalized vectors (exactly: the dot of the query with the candidate's
    * per-subspace nearest codebook vectors).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              m: Int = 8, nCodes: Int = 16,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "qvec",
              cb0: Array[Array[Array[Double]]] = null)
      : DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    PqExpressions.register(corpus.sparkSession)
    TopKAggregate.register(corpus.sparkSession)
    val dim = corpus.select(size(col(corpusVec))).first().getInt(0)
    val cb = if (cb0 != null) cb0 else codebook(dim, m, nCodes)
    val sub = dim / m
    val encoded = encode(corpus, m, nCodes, corpusId, corpusVec, cb)
      .select("vec_id", "codes")
    val q = queries
      .select(col(queryId).as("query_id"), normalize(col(queryVec)).as("qv"))
      .withColumn("lut", lutCol(col("qv"), cb))
      .select("query_id", "lut")
    val scored = encoded.join(broadcast(q))
      .select(col("query_id"), col("vec_id"), adcCol(m, nCodes).as("adc"))
    topKByAdc(scored, k)
  }

  private def topKByAdc(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(TopKAggregate.topK(struct(col("adc"), col("vec_id")), lit(k))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        col("col.adc").as("adc"), (col("pos") + 1).cast("int").as("rank"))

  /** Frozen coarse centroids for the IVF layer: `nLists` Sylvester
    * Hadamard rows (`±1/√dim` entries — exactly unit-norm, mutually
    * orthogonal, dyadic so every engine reconstructs identical doubles).
    * The closed-form sibling of a learned k-means coarse quantizer, and
    * what lets the whole IVF-PQ path sit under the exact oracle.
    */
  def hadamardCentroids(dim: Int, nLists: Int): Array[Array[Double]] = {
    require(nLists < dim, s"need nLists < dim, got $nLists vs $dim")
    val inv = 1.0 / math.sqrt(dim.toDouble)
    Array.tabulate(nLists, dim)((g, j) =>
      if (Integer.bitCount((g + 1) & j) % 2 == 0) inv else -inv)
  }

  /** Materialize an IVF-PQ index — the 100 TB ANN shape: the corpus
    * coarse-quantizes into `nLists` inverted lists written as parquet
    * PARTITIONED BY list id, and each entry stores ONLY its m PQ codes
    * (plus id) — a 1B × 256 B corpus becomes 1B × (8 B codes + id), and a
    * probe opens `nProbe` list directories of compressed rows. `coarse`
    * takes frozen centroids ([[hadamardCentroids]]); null learns a k-means
    * coarse quantizer. `cb0` likewise (frozen [[codebook]] vs
    * [[learnCodebooks]] output).
    */
  def writeIvfPqIndex(corpus: DataFrame, path: String, nLists: Int = 16,
                      m: Int = 8, nCodes: Int = 16, kmeansIters: Int = 2,
                      coarse: Array[Array[Double]] = null,
                      cb0: Array[Array[Array[Double]]] = null,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    VectorExpressions.register(spark)
    PqExpressions.register(spark)
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val cb = if (cb0 != null) cb0 else codebook(dim, m, nCodes)
    val normed = corpus
      .select(col(idCol).as("vec_id"), normalize(col(vecCol)).as("cv"))
      .localCheckpoint() // consumed by (possibly) k-means AND the write
    val cents =
      if (coarse != null)
        coarse.zipWithIndex
          .map { case (v, i) => (i, v.toSeq) }.toSeq
          .toDF("centroid_id", "centroid")
      else Similarity.kmeansCentroids(normed, nLists, kmeansIters, "cv")
    Similarity.assignNearest(normed, cents, "cv", 1)
      .select(col("vec_id"), codesCol(col("cv"), cb).as("codes"),
        col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/lists")
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    cb.zipWithIndex.flatMap { case (space, s) =>
      space.zipWithIndex.map { case (code, c) => (s, c, code.toSeq) }
    }.toSeq.toDF("s", "c", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** Query a materialized IVF-PQ index: queries probe their `nProbe`
    * nearest coarse centroids, the `centroid_id isin(...)` filter prunes
    * at the FILE level (PartitionFilters — only probed list directories
    * are read), and candidates are ADC-scored from their stored codes; the
    * original vectors are never touched. Scanned bytes ≈
    * `nProbe/nLists × |codes|`, the product of both reductions.
    */
  def ivfPqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                queries: DataFrame, k: Int, nProbe: Int = 2,
                queryId: String = "query_id", queryVec: String = "qvec")
      : DataFrame = {
    VectorExpressions.register(spark)
    PqExpressions.register(spark)
    TopKAggregate.register(spark)
    val cents = spark.read.parquet(s"$path/centroids")
    val cbRows = spark.read.parquet(s"$path/codebook").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val nCodes = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Double]](m, nCodes)
    cbRows.foreach(r =>
      cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    val probes = Similarity.assignNearest(
      queries.select(col(queryId).as("query_id"),
        normalize(col(queryVec)).as("qv")), cents, "qv", nProbe)
      .withColumn("lut", lutCol(col("qv"), cb))
      .select("query_id", "centroid_id", "lut")
    val probeLists = probes.select("centroid_id").distinct()
      .collect().map(_.get(0)) // tiny: ≤ nQueries × nProbe ids
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("centroid_id").isin(probeLists: _*))
    // a corpus vector lives in exactly one list, so no (query, vec) pair
    // can surface twice — straight to the bounded top-k
    val scored = lists.join(broadcast(probes), Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"), adcCol(m, nCodes).as("adc"))
    topKByAdc(scored, k)
  }

  /** Append a new embedding batch to an existing IVF-PQ index WITHOUT
    * retraining: the index's own quantizers (coarse centroids + codebooks,
    * read back from its side tables) assign and encode the batch, and the
    * encoded rows land as NEW parquet files inside the existing
    * `centroid_id=` list directories — committed list files are never
    * rewritten. This is the maintenance path a 100 TB index needs: the
    * quantizers are train-once artifacts, batches arrive forever, and a
    * full rebuild per batch would re-encode the whole corpus. Probes see
    * old and new rows through the same partition-pruned read, bit-identically
    * to an index built over the union in one shot (the quantizers are
    * frozen, so assignment and codes are pure functions of the vector).
    * Quantizer drift is the operator's lever: when recall decays, retrain
    * with [[writeIvfPqIndex]].
    */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    VectorExpressions.register(spark)
    PqExpressions.register(spark)
    val cents = spark.read.parquet(s"$path/centroids")
    val cbRows = spark.read.parquet(s"$path/codebook").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val nCodes = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Double]](m, nCodes)
    cbRows.foreach(r =>
      cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    val normed = batch
      .select(col(idCol).as("vec_id"), normalize(col(vecCol)).as("cv"))
    Similarity.assignNearest(normed, cents, "cv", 1)
      .select(col("vec_id"), codesCol(col("cv"), cb).as("codes"),
        col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/lists")
  }
}
