package graft.operators

import graft.SparkSpec

class ModelEvalSpec extends SparkSpec {
  import spark.implicits._

  private val scored = Seq(
    (false, 0.1), (true, 0.6), (false, 0.4), (true, 0.9))
    .toDF("label", "score")

  test("hand-computed confusion at one threshold") {
    val r = ModelEval.confusionSweep(scored, "label", "score", Seq(0.5))
      .collect().head
    // tp=2 (0.6, 0.9), fp=0, fn=0, tn=2
    assert(r.getDouble(0) == 0.5)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (2L, 0L, 0L, 2L))
    assert(r.getLong(5) == 1000000L && r.getLong(6) == 1000000L)
  }

  test("empty-denominator sentinel and zero recall") {
    // threshold above every score: nothing predicted positive
    val r = ModelEval.confusionSweep(scored, "label", "score", Seq(2.0))
      .collect().head
    assert((r.getLong(1), r.getLong(2)) == (0L, 0L))
    assert(r.getLong(5) == -1L)      // precision undefined
    assert(r.getLong(6) == 0L)       // recall 0 of 2 positives
  }

  test("counts partition the corpus at every threshold; " +
       "recall is monotone non-increasing in the threshold") {
    val ts = Seq(0.0, 0.3, 0.5, 0.7, 1.0)
    val rows = ModelEval.confusionSweep(scored, "label", "score", ts)
      .orderBy("threshold").collect()
    assert(rows.length == ts.length)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
        == 4L)
    }
    val recalls = rows.map(_.getLong(6))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
  }

  test("plan shape: one aggregation exchange carries the whole sweep") {
    val big = (0L until 1000L).map(i => (i % 3 == 0, i.toDouble))
      .toDF("label", "score")
    val plan = ModelEval.confusionSweep(big, "label", "score",
        Seq(0.1, 0.5, 0.9))
      .queryExecution.executedPlan.toString
    // the literal-array explode fans rows BEFORE one partial/final agg
    // pair — no join, no second shuffle
    assert(!plan.contains("Join"), s"sweep must not join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 aggregation exchange:\n$plan")
  }

  test("boundary is inclusive: score == threshold predicts positive") {
    val df = Seq((true, 0.5)).toDF("label", "score")
    val r = ModelEval.confusionSweep(df, "label", "score", Seq(0.5))
      .collect().head
    assert(r.getLong(1) == 1L && r.getLong(3) == 0L)
  }
}
