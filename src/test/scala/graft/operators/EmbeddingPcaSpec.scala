package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingPcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEig solves A v = lambda v on a random symmetric matrix") {
    val rnd = new scala.util.Random(37)
    val d = 8
    val m = Array.tabulate(d, d)((_, _) => rnd.nextDouble())
    val sym = Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
    val (eig, vecs) = EmbeddingPca.jacobiEig(sym)
    assert(eig.toSeq == eig.sortBy(-_).toSeq, "descending order")
    for (i <- 0 until d) {
      val av = (0 until d).map(r => (0 until d).map(c =>
        sym(r)(c) * vecs(i)(c)).sum)
      av.zip(vecs(i)).foreach { case (avr, vr) =>
        assert(math.abs(avr - eig(i) * vr) < 1e-9,
          s"eigenpair $i violates A v = lambda v") }
      val norm = math.sqrt(vecs(i).map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
  }

  test("first component aligns with the dominant direction") {
    val rnd = new scala.util.Random(41)
    val dir = Array(3.0, 1.0).map(_ / math.sqrt(10))
    val embs = (1 to 400).map { i =>
      val t = rnd.nextGaussian() * 5            // big variance along dir
      val o = rnd.nextGaussian() * 0.3          // small orthogonal noise
      (i.toLong, Array((t * dir(0) - o * dir(1)).toFloat,
        (t * dir(1) + o * dir(0)).toFloat))
    }.toDF("vec_id", "embedding")
    val model = EmbeddingPca.fit(embs, k = 2)
    val cos = math.abs(
      model.components(0).zip(dir).map { case (a, b) => a * b }.sum)
    assert(cos > 0.995, s"component 0 misaligned: |cos|=$cos")
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1))
  }

  test("whitened projections have unit variance and zero covariance") {
    val rnd = new scala.util.Random(43)
    val embs = (1 to 500).map { i =>
      (i.toLong, Array(rnd.nextGaussian() * 4, rnd.nextGaussian() * 1,
        rnd.nextGaussian() * 0.25).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val model = EmbeddingPca.fit(embs, k = 3)
    val proj = EmbeddingPca.transform(embs, model, whiten = true)
      .select(col("pca")(0).as("p0"), col("pca")(1).as("p1"),
        col("pca")(2).as("p2"))
    val stats = proj.agg(
      variance(col("p0")), variance(col("p1")), variance(col("p2")),
      covar_samp(col("p0"), col("p1")), covar_samp(col("p1"), col("p2")))
      .first()
    // population-vs-sample variance differ by n/(n-1): loose bounds
    for (i <- 0 to 2)
      assert(math.abs(stats.getDouble(i) - 1.0) < 0.05, s"var dim $i")
    for (i <- 3 to 4)
      assert(math.abs(stats.getDouble(i)) < 0.05, s"covar $i")
  }

  test("frozenModel: orthonormal Hadamard components, whitening to unit var") {
    val embs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val m = EmbeddingPca.frozenModel(embs, rowIdx = Seq(1, 2, 3, 5))
    // components are exactly orthonormal (±1/8 entries, Sylvester rows)
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      if (a eq b) assert(math.abs(dot - 1.0) < 1e-12)
      else assert(math.abs(dot) < 1e-12)
    }
    assert(m.components.flatten.forall(v => math.abs(v) == 0.125))
    // whitened projections come out ~unit variance (pop vs samp slack)
    val proj = EmbeddingPca.transform(embs, m, whiten = true)
    val stats = proj.agg(
      variance(col("pca")(0)), variance(col("pca")(3))).first()
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.05)
    assert(math.abs(stats.getDouble(1) - 1.0) < 0.05)
  }

  test("GramAggregator fails fast on ragged input instead of sub-fitting") {
    val ragged = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      EmbeddingPca.fit(ragged, k = 2)
    }
    assert(e.getMessage != null)
  }

  test("fit on real testdata: one aggregate pass, deterministic model") {
    val embs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val m1 = EmbeddingPca.fit(embs, k = 8)
    val m2 = EmbeddingPca.fit(embs, k = 8)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq ==
      m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.forall(_ >= -1e-9))
    assert(m1.eigenvalues.toSeq == m1.eigenvalues.sortBy(-_).toSeq)
    // the fit is one aggregate: partial buffers merge BELOW the exchange
    val agg = EmbeddingPca.transform(embs, m1).select(size(col("pca")))
    assert(agg.first().getInt(0) == 8)
  }
}
