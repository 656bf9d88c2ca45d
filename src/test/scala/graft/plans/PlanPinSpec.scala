package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scale-critical PHYSICAL plan properties PLANS.md claims, so
  * a regression (a lost pushdown, a join degrading to sort-merge, an
  * aggregate becoming a window funnel) fails here instead of surfacing
  * as a 100×-scale surprise. Textual executedPlan assertions — coarse,
  * but exactly the evidence a plan audit reads.
  */
class PlanPinSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("3-token filter + projection reach the parquet scan") {
    val dir = tmpDir("pushdown").resolve("t").toString
    (1L to 200L).map(i => (i, s"cat${i % 5}", i * 1.5, s"pad$i"))
      .toDF("id", "category", "price", "padding")
      .write.parquet(dir)
    val table = spark.read.parquet(dir)
    val q = graft.operators.QueryEngine.run(table,
      graft.operators.QueryEngine.SimpleQuery(
        table = "t",
        filter = Some("id > 100"),
        projection = Seq("id", "category")))
    val p = plan(q)
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)]"),
      s"filter must reach the scan:\n$p")
    // column pruning: the scan's ReadSchema must NOT carry the untouched
    // wide columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("padding") && !readSchema.contains("price"),
      s"scan reads pruned columns:\n$readSchema")
  }

  test("aggregation runs partial (map-side combine) before the exchange") {
    val docs = (1L to 100L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val p = plan(docs.groupBy("src").agg(count(lit(1)).as("n")))
    assert(p.contains("partial_count"), s"no partial aggregate:\n$p")
  }

  test("contrastive pairs: broadcast batch sizes, never a sort-merge join") {
    val docs = (1L to 50L)
      .map(i => (i, Seq.fill(12)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val p = plan(graft.operators.Contrastive.spanPairs(docs))
    assert(p.contains("BroadcastHashJoin"), s"batch sizes not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"pair rows shuffled for a join:\n$p")
    assert(!p.contains("Window"), s"window funnel in the split:\n$p")
  }

  test("best-of-n selection is an aggregate, not a rank window") {
    val cands = (1L to 60L).map(i => (i / 4, i, i % 7 * 10))
      .toDF("prompt_id", "cand_id", "reward_c")
    val p = plan(graft.operators.Preference.bestOfN(cands))
    assert(!p.contains("Window"), s"per-prompt window funnel:\n$p")
    assert(p.contains("partial_"), s"argmax not map-side combined:\n$p")
  }

  test("exact dedup's representative pick is map-side combinable") {
    val docs = (1L to 80L).map(i => (i, s"text ${i % 10}"))
      .toDF("doc_id", "text")
    val p = plan(graft.operators.Dedup.exactDedup(docs))
    assert(!p.contains("Window"), s"window funnel in exact dedup:\n$p")
    assert(p.contains("partial_"), s"no partial aggregate:\n$p")
  }

  test("entity-resolution candidates come from equi-joins, never a scan") {
    val recs = (1L to 60L).map(i => (i, s"name${i % 8}", i % 4, i % 50))
      .toDF("id", "name", "city", "v")
    val p = plan(graft.operators.EntityResolution.matchPairs(recs, "id",
      Seq("name", "concat(cast(city as string), '|', cast(v div 10 as string))"),
      Seq(("name_a = name_b", 50L), ("abs(v_a - v_b) <= 5", 30L)),
      threshold = 80L))
    assert(!p.contains("CartesianProduct"),
      s"blocking degraded to all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"blocking degraded to a nested-loop join:\n$p")
  }

  test("CUSUM folds per key — no window, no per-point shuffle") {
    val series = (1L to 60L).map(i =>
      (s"k${i % 3}", new java.sql.Timestamp(i * 3600000L), i % 7))
      .toDF("k", "t", "v")
    val p = plan(graft.operators.Changepoint.cusum(series, "k", "t", "v",
      baseline = 4, slackTimesB = 0L, thresholdTimesB = 100L))
    assert(!p.contains("Window"), s"window in the CUSUM fold:\n$p")
    assert(p.contains("partial_"),
      s"series assembly not map-side combined:\n$p")
  }

  test("k-anonymity classes aggregate partially before the exchange") {
    val df = (1L to 90L).map(i => (i % 9, s"s${i % 3}")).toDF("a", "b")
    val p = plan(graft.operators.Anonymize.kAnonymize(df, k = 3,
      Seq(graft.operators.Anonymize.Ladder("g_a",
        Seq("CAST(a AS STRING)", "'*'")),
        graft.operators.Anonymize.Ladder("g_b", Seq("b", "'*'"))),
      maxSuppressedPpm = 1000000L))
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(!p.contains("Window"), s"window in the class table:\n$p")
  }
}
