package graft.operators

import graft.SparkSpec

class MixturePlanSpec extends SparkSpec {
  import spark.implicits._

  test("hand plan: shares, up/down-sampling, unlisted source visible") {
    val tc = Seq(("a", 100L), ("b", 1000L), ("c", 50L))
      .toDF("source", "n_tokens")
    val w = Seq(("a", 3L), ("b", 1L)).toDF("source", "weight")
    val out = MixturePlan.solve(tc, w, budgetTokens = 400L)
      .orderBy("source").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // Σw = 4: a target = 300 of 100 natural → 3.0 epochs (up-sampled)
    assert(out("a") == (100L, 3L, 300L, 3000000L))
    // b target = 100 of 1000 → 0.1 epochs
    assert(out("b") == (1000L, 1L, 100L, 100000L))
    // c unlisted: weight 0, target 0 — visible, not dropped
    assert(out("c") == (50L, 0L, 0L, 0L))
  }

  test("targets conserve the budget up to per-source truncation") {
    val tc = (0 until 7).map(i => (s"s$i", 1000L)).toDF("source", "n")
    val w = (0 until 7).map(i => (s"s$i", (i + 1).toLong))
      .toDF("source", "w")
    val targets = MixturePlan.solve(tc, w, budgetTokens = 99999L)
      .collect().map(_.getLong(3))
    val total = targets.sum
    assert(total <= 99999L && total >= 99999L - 7L)
  }

  test("frontier-scale budgets do not overflow: 15T tokens plans " +
       "exactly via the split identity") {
    val tc = Seq(("web", 10000000000000L), ("code", 2000000000000L))
      .toDF("source", "n")
    val w = Seq(("web", 3L), ("code", 1L)).toDF("source", "w")
    val out = MixturePlan.solve(tc, w, budgetTokens = 15000000000000L)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // web: 3/4 of 15T = 11.25T of 10T natural → 1.125 epochs; the
    // quantized-divisor branch (target > 9e12) is within 1 ppm
    assert(out("web")._1 == 11250000000000L)
    assert(math.abs(out("web")._2 - 1125000L) <= 1L)
    // code: 3.75T of 2T natural → exact branch, 1.875 epochs
    assert(out("code") == (3750000000000L, 1875000L))
  }

  test("all-zero weights plan to zero targets, not a division error") {
    val tc = Seq(("a", 10L)).toDF("source", "n")
    val w = Seq(("zzz", 1L)).toDF("source", "w")
    val out = MixturePlan.solve(tc, w, budgetTokens = 100L).collect()
    assert(out.head.getLong(3) == 0L && out.head.getLong(4) == 0L)
  }
}
