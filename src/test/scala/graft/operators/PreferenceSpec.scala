package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def cands(rows: (Long, Long, Long)*) =
    rows.toDF("prompt_id", "cand_id", "reward_c")

  test("best-of-n picks max reward, min id on ties") {
    val c = cands((0L, 1L, 50L), (0L, 2L, 90L), (0L, 3L, 90L),
      (1L, 8L, 10L))
    val best = Preference.bestOfN(c).orderBy("prompt_id").collect()
    assert(best.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 90L), (1L, 8L, 10L)))
    assert(best.head.getAs[Long]("n_cands") === 3L)
    assert(best.head.getAs[Long]("min_reward_c") === 50L)
  }

  test("preference pairs: chosen/rejected tie rules and margin gate") {
    val c = cands(
      // ties on BOTH extremes: chosen = min id among max, rejected = min
      // id among min
      (0L, 1L, 90L), (0L, 2L, 90L), (0L, 3L, 10L), (0L, 4L, 10L),
      // all-tied group: margin 0 → dropped
      (1L, 5L, 42L), (1L, 6L, 42L),
      // singleton group → dropped by n_cands >= 2
      (2L, 7L, 99L),
      // margin below gate → dropped at minMarginCents = 5
      (3L, 8L, 20L), (3L, 9L, 23L))
    val pairs = Preference.preferencePairs(c, minMarginCents = 5)
      .orderBy("prompt_id").collect()
    assert(pairs.length === 1)
    val r = pairs.head
    assert(r.getAs[Long]("prompt_id") === 0L)
    assert(r.getAs[Long]("chosen_id") === 1L)
    assert(r.getAs[Long]("rejected_id") === 3L)
    assert(r.getAs[Long]("margin_c") === 80L)
    assert(r.getAs[Long]("n_cands") === 4L)
  }

  test("candidates groups a contiguous fan and rounds rewards to cents") {
    val ev = Seq((0L, 40.34), (7L, 0.005), (8L, 185.22))
      .toDF("event_id", "value")
    val c = Preference.candidates(ev, fan = 8)
      .orderBy("cand_id").collect()
    assert(c.map(_.getAs[Long]("prompt_id")).toSeq === Seq(0L, 0L, 1L))
    // 40.34*100 = 4033.999... as IEEE doubles — round() must recover 4034
    assert(c.map(_.getAs[Long]("reward_c")).toSeq === Seq(4034L, 1L, 18522L))
  }

  test("deterministic under repartition") {
    val ev = spark.range(0, 400).select(col("id").as("event_id"),
      (pmod(xxhash64(col("id")), lit(10000)) / 100.0).as("value"))
    val a = Preference.preferencePairs(Preference.candidates(ev))
      .orderBy("prompt_id").collect()
    val b = Preference.preferencePairs(
        Preference.candidates(ev.repartition(13)))
      .orderBy("prompt_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
