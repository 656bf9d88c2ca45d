package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAggregate, VectorExpressions}
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

  /** Normalize and compress `vecCol` to `m` code ids: per subspace, the
    * code whose codebook vector has the lowest L2 distance to the
    * subvector — equivalently the highest `dot − ‖cb‖²/2`, which is the
    * form both the expression below and the SQL oracle compute (ties →
    * higher code id; `array_max` over (score, code) structs and the SQL
    * row_number mirror agree on that order). Appends `codes` = array<int>
    * of length m. `cb` defaults to the frozen [[codebook]].
    */
  def encode(corpus: DataFrame, m: Int = 8, nCodes: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding",
             cb0: Array[Array[Array[Double]]] = null): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val cb = if (cb0 != null) cb0 else codebook(dim, m, nCodes)
    val sub = dim / m
    val normed = corpus
      .select(col(idCol).as("vec_id"), normalize(col(vecCol)).as("cv"))
    val codeCols: Seq[Column] = (0 until m).map { s =>
      val subVec = slice(col("cv"), s * sub + 1, sub)
      val scored = array((0 until nCodes).map { c =>
        // dot − ‖cb‖²/2: argmax over codes == argmin L2 (‖x‖² is common),
        // and the correction is an exact driver constant
        val halfNormSq = cb(s)(c).map(x => x * x).sum / 2.0
        struct(
          (VectorExpressions.dotNative(subVec, typedLit(cb(s)(c).toSeq)) -
            lit(halfNormSq)).as("d"),
          lit(c).as("c"))
      }: _*)
      array_max(scored).getField("c")
    }
    normed.select(col("vec_id"), col("cv"), array(codeCols: _*).as("codes"))
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
    TopKAggregate.register(corpus.sparkSession)
    val dim = corpus.select(size(col(corpusVec))).first().getInt(0)
    val cb = if (cb0 != null) cb0 else codebook(dim, m, nCodes)
    val sub = dim / m
    val encoded = encode(corpus, m, nCodes, corpusId, corpusVec, cb)
      .select("vec_id", "codes")
    val lutCol = array((0 until m).flatMap { s =>
      (0 until nCodes).map { c =>
        VectorExpressions.dotNative(
          slice(col("qv"), s * sub + 1, sub), typedLit(cb(s)(c).toSeq))
      }
    }: _*)
    val q = queries
      .select(col(queryId).as("query_id"), normalize(col(queryVec)).as("qv"))
      .withColumn("lut", lutCol)
      .select("query_id", "lut")
    // ADC: acc += lut[s·nCodes + codes[s]] in fixed s order (the DuckDB
    // oracle sums a list built in the same order — float-order identical)
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0d),
      (acc, s) => acc +
        element_at(col("lut"), (s * nCodes + element_at(col("codes"), s + 1))
          .cast("int") + 1))
    val scored = encoded.join(broadcast(q))
      .select(col("query_id"), col("vec_id"), adc.as("adc"))
    scored.groupBy("query_id")
      .agg(TopKAggregate.topK(struct(col("adc"), col("vec_id")), lit(k))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        col("col.adc").as("adc"), (col("pos") + 1).cast("int").as("rank"))
  }
}
