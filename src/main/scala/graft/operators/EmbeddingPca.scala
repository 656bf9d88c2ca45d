package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column — the standard
  * preprocessing in front of semantic dedup and ANN (SemDeDup-style
  * pipelines whiten before cosine thresholds so no axis dominates).
  *
  * Scale shape: fitting is ONE aggregate pass with a bounded buffer — a
  * typed [[Aggregator]] whose buffer is `[n | Σx | Σxxᵀ]` (1 + d + d²
  * doubles, ~32 KB at d=64). It participates in partial aggregation like
  * any built-in, so each partition compacts to one buffer map-side and the
  * shuffle carries one buffer per partition, independent of corpus size.
  * The d×d eigendecomposition happens on the driver (cyclic Jacobi, exact
  * and deterministic) — metadata-priced for embedding-sized d (≲ 256;
  * beyond that switch to a power-iteration sketch). Projection is per-row
  * arithmetic over broadcast literal components: k native dot products,
  * no shuffle at all.
  */
object EmbeddingPca {

  /** `components` holds the top-k eigenvectors of the covariance (row i =
    * component i, descending eigenvalue); `eigenvalues` the matching
    * per-component variances.
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]])

  /** One-pass moment accumulator: [n, Σx (d), Σxxᵀ (d·d row-major)]. */
  private final class GramAggregator(d: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    override def zero: Array[Double] = new Array[Double](1 + d + d * d)
    override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      // fail fast, don't fit on an arbitrary subset: a null or ragged
      // vector silently skipped here would yield a model with no signal
      // that anything was dropped
      require(x != null, "PCA input contains a null vector")
      require(x.length == d,
        s"PCA input dimension mismatch: expected $d, got ${x.length}")
      locally {
        b(0) += 1
        val xa = x.toArray
        var i = 0
        while (i < d) {
          b(1 + i) += xa(i)
          var j = 0
          val row = 1 + d + i * d
          while (j < d) { b(row + j) += xa(i) * xa(j); j += 1 }
          i += 1
        }
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Double]): Array[Double] = b
    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: exact,
    * deterministic, O(d³) per sweep on the driver. Returns (eigenvalues,
    * eigenvectors as rows), sorted by descending eigenvalue.
    */
  private[operators] def jacobiEig(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1))
          val c = 1 / math.sqrt(t * t + 1)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (j <- 0 until d) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - s * aqj
            a(q)(j) = s * apj + c * aqj
            val vpj = v(p)(j); val vqj = v(q)(j)
            v(p)(j) = c * vpj - s * vqj
            v(q)(j) = s * vpj + c * vqj
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i)).toArray)
  }

  /** Fit the top-`k` principal components of `vecCol` (one corpus pass). */
  def fit(embs: DataFrame, k: Int, vecCol: String = "embedding"): PcaModel = {
    val d = embs.select(size(col(vecCol))).first().getInt(0)
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    require(d <= 256,
      s"driver-side Jacobi is for embedding-sized d (<=256), got $d")
    val agg = udaf(new GramAggregator(d), ExpressionEncoder[Seq[Double]]())
    val buf = embs
      .select(agg(col(vecCol).cast("array<double>")).as("g"))
      .first().getSeq[Double](0).toArray
    val n = buf(0)
    require(n > 1, "PCA needs at least 2 vectors")
    val mean = Array.tabulate(d)(i => buf(1 + i) / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      buf(1 + d + i * d + j) / n - mean(i) * mean(j))
    val (eig, vecs) = jacobiEig(cov)
    PcaModel(mean, eig.take(k), vecs.take(k))
  }

  /** Frozen-components model (the oracle-facing face of the machinery,
    * like semantic dedup's frozen codebook): components are rows of the
    * Sylvester Hadamard matrix — `h_i[j] = (−1)^popcount(r_i & j) / √d`,
    * exact ±1/√d entries any engine constructs independently, mutually
    * orthonormal for distinct nonzero `r_i`. The mean and per-component
    * variances ARE learned from the data (one metadata-priced pass each),
    * so [[transform]]'s centering + whitening arithmetic runs exactly as
    * with learned eigenvectors — but a cross-engine oracle can recompute
    * every constant. The eigensolver itself ([[fit]]/[[jacobiEig]]) is
    * pinned by EmbeddingPcaSpec's exactness specs.
    */
  def frozenModel(embs: DataFrame, rowIdx: Seq[Int] = Seq(1, 2, 3, 5),
                  vecCol: String = "embedding"): PcaModel = {
    val d = embs.select(size(col(vecCol))).first().getInt(0)
    require(rowIdx.nonEmpty && rowIdx.distinct.size == rowIdx.size &&
      rowIdx.forall(r => r > 0 && r < d),
      s"rowIdx must be distinct values in (0, $d)")
    val inv = 1.0 / math.sqrt(d.toDouble)
    val comps = rowIdx.map(r => Array.tabulate(d)(j =>
      if (Integer.bitCount(r & j) % 2 == 0) inv else -inv)).toArray
    // per-dimension mean: 64 scalar rows, metadata-priced
    val mean = new Array[Double](d)
    embs.select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy("pos").agg(avg("col").as("m"))
      .collect().foreach(r => mean(r.getInt(0)) = r.getDouble(1))
    // per-component variance of the CENTERED projection (what whitening
    // divides by): one aggregate over the k projected scalars
    val centered = transform(embs, PcaModel(mean,
      Array.fill(rowIdx.size)(1.0), comps), whiten = false, vecCol)
    val vars = centered.select(rowIdx.indices.map(i =>
        avg(col("pca")(i) * col("pca")(i)).as(s"v$i")): _*)
      .first()
    PcaModel(mean, rowIdx.indices.map(vars.getDouble).toArray, comps)
  }

  /** Project onto the model's components: appends `outCol` =
    * array(k doubles). `whiten = true` scales each coordinate by
    * 1/sqrt(eigenvalue + eps) → unit variance per output dimension.
    * Per-row arithmetic over broadcast literals — zero shuffles.
    */
  def transform(embs: DataFrame, model: PcaModel, whiten: Boolean = false,
                vecCol: String = "embedding", outCol: String = "pca",
                eps: Double = 1e-9): DataFrame = {
    graft.functions.VectorExpressions.register(embs.sparkSession)
    val v = col(vecCol).cast("array<double>")
    val coords: Seq[Column] = model.components.toSeq.zipWithIndex.map {
      case (comp, i) =>
        val scale = if (whiten) 1.0 / math.sqrt(model.eigenvalues(i) + eps)
                    else 1.0
        // (x − mean)·c = x·c − mean·c: the mean offset folds into a literal
        val offset = comp.zip(model.mean).map { case (c, m) => c * m }.sum
        (graft.functions.VectorExpressions.dotNative(v,
          typedLit(comp.toSeq)) - lit(offset)) * lit(scale)
    }
    embs.withColumn(outCol, array(coords: _*))
  }
}
