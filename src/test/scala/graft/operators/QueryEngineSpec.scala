package graft.operators

import graft.SparkSpec
import graft.operators.QueryEngine.{AggregateSpec, SimpleQuery}
import org.apache.spark.sql.functions._

/** Parity-layer semantics: the 3-token filter grammar, aggregate naming, and
  * the reference's Property 18 (model-based GROUP BY oracle,
  * `worker/src/group_by_property_test.rs:213-327`) — manual recomputation of
  * COUNT/SUM per group plus conservation checks, against the DataFrame path.
  */
class QueryEngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sales = Seq(
    ("Books", 10.0, 3L), ("Books", 15.5, 1L), ("Electronics", 500.0, 2L),
    ("Electronics", 150.0, 11L), ("Furniture", 850.0, 2L), ("Books", 12.0, 0L)
  ).toDF("category", "price", "quantity")

  test("filter grammar: all eight operators and literal inference") {
    def run(f: String) = QueryEngine.run(sales, SimpleQuery("sales",
      filter = Some(f))).count()
    assert(run("price > 100") == 3)
    assert(run("price >= 150.0") == 3)
    assert(run("price < 15") == 2)
    assert(run("price <= 15.5") == 3)
    assert(run("category = 'Books'") == 3)
    assert(run("category == \"Books\"") == 3)
    assert(run("category != 'Books'") == 3)
    assert(run("quantity <> 2") == 4)
  }

  test("richer predicates fall through to Spark SQL expr as an extension") {
    assert(QueryEngine.run(sales, SimpleQuery("s",
      filter = Some("price > 100 AND quantity >= 2"))).count() == 3)
    assert(QueryEngine.run(sales, SimpleQuery("s",
      filter = Some("price > 100 AND quantity > 2"))).count() == 1)
  }

  test("aggregate default naming is {fn}_{col}, alias wins when given") {
    val df = QueryEngine.run(sales, SimpleQuery("s",
      groupBy = Seq("category"),
      aggregates = Seq(
        AggregateSpec("count", "*"),
        AggregateSpec("sum", "price"),
        AggregateSpec("avg", "price", alias = Some("mean_price")))))
    assert(df.columns.toSeq ==
      Seq("category", "count_*", "sum_price", "mean_price"))
  }

  test("golden aggregation values (golden_query_test.go:147-180 shape)") {
    // SELECT category, COUNT(*), SUM(price*quantity), AVG(price) GROUP BY 1
    val rows = sales.groupBy("category").agg(
        count(lit(1)).as("total_orders"),
        sum(col("price") * col("quantity")).as("total_revenue"),
        avg("price").as("avg_price"))
      .orderBy("category")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows(0) == (("Books", 3L, 45.5, 12.5)))
    assert(rows(1) == (("Electronics", 2L, 2650.0, 325.0)))
    assert(rows(2) == (("Furniture", 1L, 1700.0, 850.0)))
  }

  test("no-group aggregates return a single global row") {
    val df = QueryEngine.run(sales, SimpleQuery("s",
      aggregates = Seq(AggregateSpec("count", "*"),
        AggregateSpec("min", "price"), AggregateSpec("max", "price"))))
    val r = df.collect().head
    assert(df.count() == 1 && r.getLong(0) == 6 &&
      r.getDouble(1) == 10.0 && r.getDouble(2) == 850.0)
  }

  test("min/max have no 0.0-sentinel bug (intended semantics divergence)") {
    // reference worker treats 0.0 as 'unset' (task_executor.rs:619-634);
    // all-negative and zero-containing data must still be correct here.
    val df = Seq(("a", -5.0), ("a", -2.0), ("b", 0.0), ("b", 3.0))
      .toDF("k", "v")
    val r = QueryEngine.run(df, SimpleQuery("t", groupBy = Seq("k"),
      aggregates = Seq(AggregateSpec("min", "v"), AggregateSpec("max", "v"))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(r.toSeq == Seq(("a", -5.0, -2.0), ("b", 0.0, 3.0)))
  }

  test("limit and projection") {
    val df = QueryEngine.run(sales, SimpleQuery("s",
      projection = Seq("category", "price"), limit = Some(3)))
    assert(df.columns.toSeq == Seq("category", "price") && df.count() == 3)
  }

  test("Property 18: model-based GROUP BY oracle with conservation checks") {
    // 20 seeded random datasets (property-style: model = manual recomputation)
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = Array("a", "b", "c", "d")
      val rows = List.fill(200)(
        (keys(rnd.nextInt(keys.length)), rnd.nextLong(2001) - 1000))
      locally {
        val df = rows.toDF("k", "v")
        val got = QueryEngine.run(df, SimpleQuery("t", groupBy = Seq("k"),
          aggregates = Seq(AggregateSpec("count", "*"),
            AggregateSpec("sum", "v"), AggregateSpec("min", "v"),
            AggregateSpec("max", "v"))))
          .collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
        val model = rows.groupBy(_._1).map { case (k, g) =>
          val vs = g.map(_._2)
          k -> ((vs.size.toLong, vs.sum, vs.min, vs.max))
        }
        assert(got == model)
        // conservation: Σ group counts = total rows; Σ group sums = total sum
        assert(got.values.map(_._1).sum == rows.size.toLong)
        assert(got.values.map(_._2).sum == rows.map(_._2).sum)
      }
    }
  }
}
