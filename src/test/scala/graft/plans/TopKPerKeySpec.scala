package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerKeySpec extends AnyFunSuite {

  private def withTopKSession[T](f: SparkSession => T): T = {
    val activeBefore = SparkSession.getActiveSession
    val defaultBefore = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-test")
      .withExtensions(new TopKPerKeyExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark)
    finally {
      defaultBefore.foreach(SparkSession.setDefaultSession)
      activeBefore.foreach(SparkSession.setActiveSession)
    }
  }

  test("row_number<=k filter plans as TopKPerKeyExec with identical results") {
    withTopKSession { spark =>
      import spark.implicits._
      val rnd = new scala.util.Random(13)
      val df = (1 to 5000).map(_ =>
          (s"k${rnd.nextInt(20)}", rnd.nextInt(100000), rnd.nextDouble()))
        .toDF("key", "score", "payload")

      val w = Window.partitionBy("key").orderBy(col("score").desc, col("payload"))
      val topk = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)

      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
      assert(!plan.toLowerCase.contains("sort"), plan) // heaps, not sorting

      val got = topk.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(3))).sorted.toSeq
      // oracle: same query via stock window execution (rule not matching
      // because the filter bound is a non-literal expression)
      val stock = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= lit(4) - 1)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3)))
        .sorted.toSeq
      assert(got == stock)
      assert(got.count(_._3 == 1) == 20) // one rank-1 per key
    }
  }

  test("rewrite leaves other window shapes untouched") {
    withTopKSession { spark =>
      import spark.implicits._
      val df = (1 to 100).map(i => (s"k${i % 5}", i)).toDF("key", "v")
      val w = Window.partitionBy("key").orderBy("v")
      // rank() (not row_number) must NOT be rewritten
      val ranked = df.withColumn("r", rank().over(w)).filter(col("r") <= 2)
      assert(!ranked.queryExecution.executedPlan.toString
        .contains("TopKPerKey"))
      assert(ranked.count() == 10)
      // global (no partition) row_number must NOT be rewritten
      val global = df.withColumn("r",
          row_number().over(Window.orderBy("v"))).filter(col("r") <= 2)
      assert(!global.queryExecution.executedPlan.toString
        .contains("TopKPerKey"))
      assert(global.count() == 2)
    }
  }
}
