package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed logistic-regression quality filter: the learned model must
  * actually separate, training must be deterministic, and the frozen
  * scoring face must be a pure projection.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable synthetic features: good docs have low symbol
  // ratio and mid-length tokens
  private def corpus = (0 until 400).map { i =>
    val good = i % 2 == 0
    val sym = if (good) 0.01 + (i % 7) * 0.002 else 0.25 + (i % 7) * 0.01
    val mtl = if (good) 4.5 + (i % 5) * 0.1 else 1.2 + (i % 5) * 0.05
    (i.toLong, mtl, sym, if (good) 1 else 0)
  }.toDF("id", "mean_token_len", "symbol_ratio", "label")

  test("training separates a separable corpus") {
    val m = QualityClassifier.train(corpus,
      Seq("mean_token_len", "symbol_ratio"), "label", iters = 60)
    val scored = QualityClassifier.score(corpus, m)
    val acc = scored.withColumn("hit",
        ((col("quality_prob") >= 0.5).cast("int") === col("label"))
          .cast("int"))
      .agg(avg("hit")).head().getDouble(0)
    assert(acc >= 0.98, s"accuracy $acc")
    // direction: symbol soup must push the score DOWN
    assert(m.weights(1) < 0 && m.weights(0) > 0)
  }

  test("training is deterministic for a fixed partitioning") {
    val a = QualityClassifier.train(corpus,
      Seq("mean_token_len", "symbol_ratio"), "label", iters = 20)
    val b = QualityClassifier.train(corpus,
      Seq("mean_token_len", "symbol_ratio"), "label", iters = 20)
    assert(a == b)
  }

  test("keep() applies the threshold; scoring is a pure projection") {
    val m = QualityClassifier.Model(Seq("mean_token_len"),
      Seq(1.0), 0.0, Seq(3.0), Seq(1.0))
    val kept = QualityClassifier.keep(corpus, m, threshold = 0.5)
    // sigmoid((mtl-3)/1) >= 0.5 ⇔ mtl >= 3
    assert(kept.agg(min("mean_token_len")).head().getDouble(0) >= 3.0)
    val plan = QualityClassifier.score(corpus, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scoring must not shuffle")
  }

  test("more iterations reduce log-loss") {
    def loss(iters: Int): Double = {
      val m = QualityClassifier.train(corpus,
        Seq("mean_token_len", "symbol_ratio"), "label", iters = iters)
      QualityClassifier.score(corpus, m)
        .select(avg(when(col("label") === 1, -log(col("quality_prob")))
          .otherwise(-log(lit(1.0) - col("quality_prob")))))
        .head().getDouble(0)
    }
    assert(loss(40) < loss(5))
  }
}
