package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BoundedTopK semantics + the partial-below-the-exchange plan shape. */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def topkDf(k: Int) = {
    TopKAggregate.register(spark)
    // 1000 rows over 10 keys, spread over 8 partitions so map-side partial
    // buffers MUST merge across partitions (exercises serialize/merge)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1000).map(i => (i % 10L, rnd.nextDouble(), i.toLong))
    rows.toDF("key", "score", "id").repartition(8)
  }

  test("graft_topk matches the rank-window formulation exactly") {
    val df = topkDf(7).cache()
    val viaAgg = df.groupBy("key")
      .agg(TopKAggregate.topK(struct(col("score"), col("id")), lit(7)).as("tk"))
      .select(col("key"), posexplode(col("tk")))
      .select(col("key"), col("col.score").as("score"), col("col.id").as("id"),
        (col("pos") + 1).as("rank"))
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select(col("key"), col("score"), col("id"), col("rank").cast("long"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    df.unpersist()
  }

  test("k larger than the group returns the whole group, best first") {
    TopKAggregate.register(spark)
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 9L)).toDF("key", "score", "id")
    val out = df.groupBy("key")
      .agg(TopKAggregate.topK(struct(col("score"), col("id")), lit(100)).as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.score"), col("t.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // score DESC, ties broken by id ASC
    assert(out == Seq((0.9, 9L), (0.9, 11L), (0.5, 10L)))
  }

  test("plan: partial graft_topk runs below the exchange (map-side top-k)") {
    val df = topkDf(5)
    val agg = df.groupBy("key")
      .agg(TopKAggregate.topK(struct(col("score"), col("id")), lit(5)).as("tk"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    val partialAt = plan.indexOf("partial_graft_topk")
    val exchangeAt = plan.indexOf("Exchange hashpartitioning")
    assert(partialAt >= 0, plan)
    assert(exchangeAt >= 0, plan)
    // tree prints top-down: the partial aggregate must be BELOW the exchange
    assert(partialAt > exchangeAt, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("registered for SQL use") {
    TopKAggregate.register(spark)
    Seq((1L, 2.0, 3L)).toDF("key", "score", "id")
      .createOrReplaceTempView("topk_in")
    val out = spark.sql(
      """SELECT key, graft_topk(struct(score, id), 2) AS tk
        |FROM topk_in GROUP BY key""".stripMargin).collect()
    assert(out.length == 1)
  }
}
