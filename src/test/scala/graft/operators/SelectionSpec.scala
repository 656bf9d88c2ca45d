package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("takeUntilBudget: exact boundary, order, and cum_weight values") {
    // weights 10,20,30,...,100 in id order; budget 100 keeps ids 1..4
    // (cum 10,30,60,100) and the boundary row lands exactly ON the budget
    val df = (1 to 10).map(i => (i.toLong, i * 10L)).toDF("id", "w")
    val out = Selection.takeUntilBudget(df, "w", Seq(col("id").asc), "id",
        budget = 100L)
      .orderBy("cum_weight").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("cum_weight")).toSeq ==
      Seq(10L, 30L, 60L, 100L))
  }

  test("takeUntilBudget matches the single-task window on a total order") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextInt(50).toLong + 1,
      rnd.nextInt(10).toDouble)).toDF("id", "w", "score")
    val dist = Selection.takeUntilBudget(df.repartition(13), "w",
        Seq(col("score").desc), "id", budget = 2000L)
      .select("id", "cum_weight").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = df.withColumn("cum",
        sum("w").over(Window.orderBy(col("score").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= 2000L)
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == naive)
  }

  test("takeUntilBudget: zero budget keeps nothing, huge budget keeps all") {
    val df = (1 to 20).map(i => (i.toLong, 5L)).toDF("id", "w")
    assert(Selection.takeUntilBudget(df, "w", Seq(col("id").asc), "id",
      budget = 0L).count() == 0)
    assert(Selection.takeUntilBudget(df, "w", Seq(col("id").asc), "id",
      budget = 1000L).count() == 20)
  }

  test("takeUntilBudgetPerGroup: independent budgets per group") {
    val df = (for (g <- Seq("a", "b"); i <- 1 to 10)
      yield (g, i.toLong, 10L)).toDF("g", "id", "w")
    val out = Selection.takeUntilBudgetPerGroup(df, "g", "w",
      Seq(col("id").asc), "id", budgetPerGroup = 35L)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 3L, "b" -> 3L)) // cum 10,20,30 ≤ 35
  }

  test("capPerGroup: keeps top-n per group in the declared order") {
    val df = (for (g <- Seq("x", "y"); i <- 1 to 7)
      yield (g, i.toLong, (i * 10).toLong)).toDF("g", "id", "len")
    val out = Selection.capPerGroup(df, "g", Seq(col("len").desc), "id", 3)
    val kept = out.select("g", "id", "rank_in_group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // longest three of each group, rank 1..3 by len desc
    assert(kept == Set(("x", 7L, 1), ("x", 6L, 2), ("x", 5L, 3),
                       ("y", 7L, 1), ("y", 6L, 2), ("y", 5L, 3)))
  }

  test("capPerGroup: tie broken by tieCol, cap smaller than group is total") {
    val df = Seq(("g", 3L, 5L), ("g", 1L, 5L), ("g", 2L, 5L))
      .toDF("g", "id", "len")
    val out = Selection.capPerGroup(df, "g", Seq(col("len").desc), "id", 2)
      .select("id", "rank_in_group").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 1, 2L -> 2)) // id ascending breaks the tie
  }
}
