package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the CCNet/fastText-style learned
  * classifier step of a curation pipeline (heuristic gates catch spam;
  * the learned model ranks the grey zone). A tiny logistic regression
  * trained DISTRIBUTED: each iteration is ONE aggregate over the corpus
  * (d+1 doubles per partition — the gradient), the driver applies the
  * update; weights live on the driver like BPE's merge table. No MLlib
  * dependency, no feature-vector shuffle, no driver-side data.
  *
  * Scale shape:
  *  - Features are per-row column expressions (the [[graft.functions
  *    .TextFunctions.qualityFeatures]] family) — computed in codegen,
  *    never materialized corpus-wide.
  *  - Training cost = iters × (one scan + a d-double-per-partition
  *    reduce); d is ~5, iters ~50 — the corpus is read, never shuffled.
  *    Standardization constants come from the same one-pass moments
  *    aggregate the profiler uses.
  *  - Scoring/gating is a pure projection (sigmoid of a dot product with
  *    literal weights) — zero shuffles, fully pushdown-friendly.
  *  - Determinism: per fixed partitioning the gradient reduce is a fixed
  *    tree, and [[Model]] weights freeze into literals — the scoring face
  *    is exactly replayable cross-engine (the oracle face; training
  *    itself is spec-checked like BPE/k-means).
  */
object QualityClassifier {

  /** Frozen classifier: score = sigmoid(bias + Σ w_i · (x_i − mean_i) /
    * std_i). Means/stds are baked in so scoring needs no second pass. */
  final case class Model(featureCols: Seq[String], weights: Seq[Double],
                         bias: Double, means: Seq[Double], stds: Seq[Double])

  /** Train by batch gradient descent on standardized features.
    * `labelCol` is 0/1 (1 = good). Returns the frozen [[Model]]. */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
            iters: Int = 50, lr: Double = 1.0, l2: Double = 1e-4): Model = {
    require(featureCols.nonEmpty && iters > 0)
    val d = featureCols.length
    // one-pass standardization constants (population std; guarded vs 0)
    val momentAggs = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"m_$c"), stddev_pop(col(c)).as(s"s_$c"))) :+
      count(lit(1)).as("n")
    val mrow = df.agg(momentAggs.head, momentAggs.tail: _*).collect().head
    val n = mrow.getAs[Long]("n").toDouble
    require(n > 0, "empty training set")
    val means = featureCols.map(c => mrow.getAs[Double](s"m_$c"))
    val stds = featureCols.map { c =>
      val s = mrow.getAs[Double](s"s_$c"); if (s > 0) s else 1.0
    }
    val z = featureCols.zipWithIndex.map { case (c, i) =>
      ((col(c) - lit(means(i))) / lit(stds(i))).as(s"z$i")
    }
    val base = df.select(z :+ col(labelCol).cast("double").as("y"): _*)
      .persist()
    try {
      var w = Array.fill(d)(0.0)
      var b = 0.0
      var it = 0
      while (it < iters) {
        // p = sigmoid(b + w·z); gradient = Σ (p − y) · [z, 1]
        val margin = (0 until d).map(i => col(s"z$i") * lit(w(i)))
          .foldLeft(lit(b): Column)(_ + _)
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        val gAggs = (0 until d).map(i =>
          sum((p - col("y")) * col(s"z$i")).as(s"g$i")) :+
          sum(p - col("y")).as("gb")
        val g = base.agg(gAggs.head, gAggs.tail: _*).collect().head
        w = Array.tabulate(d)(i =>
          w(i) - lr * (g.getAs[Double](s"g$i") / n + l2 * w(i)))
        b -= lr * g.getAs[Double]("gb") / n
        it += 1
      }
      Model(featureCols, w.toSeq, b, means, stds)
    } finally base.unpersist()
  }

  /** The raw decision margin — the affine standardized-feature map in
    * IEEE +,-,*,/ only (no libm), so thresholding IT is cross-engine
    * exact where thresholding the sigmoid is not ([[ModelEval]]). */
  def marginColumn(m: Model): Column =
    m.featureCols.zipWithIndex.map { case (c, i) =>
      (col(c) - lit(m.means(i))) / lit(m.stds(i)) * lit(m.weights(i))
    }.foldLeft(lit(m.bias): Column)(_ + _)

  /** The scoring expression — pure codegen projection over literals. */
  def scoreColumn(m: Model): Column = {
    val margin = marginColumn(m)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Append `quality_prob` to `df` (which must carry the feature cols). */
  def score(df: DataFrame, m: Model): DataFrame =
    df.withColumn("quality_prob", scoreColumn(m))

  /** Keep rows the model scores at or above `threshold`. */
  def keep(df: DataFrame, m: Model, threshold: Double = 0.5): DataFrame =
    score(df, m).filter(col("quality_prob") >= threshold)
}
