package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Which lake tables the optimized plan actually scans. */
  private def scannedTables(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case lfi: LakeFileIndex => lfi.tableName
        }
      }
    }

  private def setup(): (LakeLog, MaterializedView.MvDef) = {
    val log = new LakeLog(tmpDir("mvrw"))
    val rows = Seq(("a", 1.0, 10.0), ("a", 2.0, 5.0), ("b", 3.0, 7.0),
      ("b", 4.0, 2.0), ("c", 5.0, 9.0)).toDF("k", "q", "p")
    LakeTable.createTable(log, "base", rows.schema)
    LakeTable.insert(spark, log, "base", rows, numFiles = 2)
    val d = MaterializedView.MvDef("base_mv", "base", "k",
      sumCols = Seq("q"), minCols = Seq("p"), maxCols = Seq("p"))
    MaterializedView.create(log, d)
    MaterializedView.refresh(spark, log, d)
    (log, d)
  }

  private def agg(log: LakeLog): DataFrame =
    LakeTable.readIndexed(spark, log, "base")
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"),
        min("p").as("mn"), max("p").as("mx"))

  test("a fresh MV answers the covered aggregate; values identical") {
    val (log, d) = setup()
    val direct = agg(log).orderBy("k").collect().toSeq
    MvRewrite.register(spark, log, Seq(d))
    try {
      val q = agg(log)
      assert(scannedTables(q) === Seq("base_mv"),
        s"expected the MV scan, got ${scannedTables(q)}")
      assert(q.orderBy("k").collect().toSeq === direct)
      // operators ABOVE the aggregate keep resolving (exprIds preserved)
      val filtered = agg(log).filter(col("n") >= 2)
        .orderBy(col("sq").desc).select("k", "sq")
      assert(scannedTables(filtered) === Seq("base_mv"))
      assert(filtered.as[(String, Double)].collect().toSeq ===
        Seq(("b", 7.0), ("a", 3.0)))
    } finally MvRewrite.clear(spark)
  }

  test("a STALE MV never answers: base moved past the refresh mark") {
    val (log, d) = setup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      LakeTable.insert(spark, log, "base",
        Seq(("a", 9.0, 1.0)).toDF("k", "q", "p"))
      val q = agg(log)
      assert(scannedTables(q) === Seq("base"), "stale MV must not answer")
      // after refresh it answers again — with the new row folded in
      MaterializedView.refresh(spark, log, d)
      val q2 = agg(log)
      assert(scannedTables(q2) === Seq("base_mv"))
      assert(q2.filter(col("k") === "a").select("sq").as[Double].head
        === 12.0)
    } finally MvRewrite.clear(spark)
  }

  test("anything between aggregate and scan disqualifies the rewrite") {
    val (log, d) = setup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      // a filter changes the group contents — must hit the base
      val f = LakeTable.readIndexed(spark, log, "base")
        .filter(col("q") > 1.0).groupBy("k")
        .agg(sum("q").as("sq"))
      assert(scannedTables(f) === Seq("base"))
      // an uncovered aggregate (avg) — must hit the base
      val a = LakeTable.readIndexed(spark, log, "base")
        .groupBy("k").agg(avg("q").as("aq"))
      assert(scannedTables(a) === Seq("base"))
      // a computed agg input (sum(q*2)) — must hit the base
      val c = LakeTable.readIndexed(spark, log, "base")
        .groupBy("k").agg(sum(col("q") * 2).as("sq2"))
      assert(scannedTables(c) === Seq("base"))
      // grouping by a non-key column — must hit the base
      val g = LakeTable.readIndexed(spark, log, "base")
        .groupBy("p").agg(count(lit(1)).as("n"))
      assert(scannedTables(g) === Seq("base"))
    } finally MvRewrite.clear(spark)
  }

  test("type mismatch blocks the rewrite: MV stores double sums") {
    val log = new LakeLog(tmpDir("mvrw-long"))
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    LakeTable.createTable(log, "tl", rows.schema)
    LakeTable.insert(spark, log, "tl", rows)
    val d = MaterializedView.MvDef("tl_mv", "tl", "k", sumCols = Seq("v"))
    MaterializedView.create(log, d)
    MaterializedView.refresh(spark, log, d)
    MvRewrite.register(spark, log, Seq(d))
    try {
      // sum(long) is LongType; the MV's sum_v is double — no silent cast
      val q = LakeTable.readIndexed(spark, log, "tl")
        .groupBy("k").agg(sum("v").as("sv"))
      assert(scannedTables(q) === Seq("tl"))
      // count(*) alone IS covered (long == long)
      val c = LakeTable.readIndexed(spark, log, "tl")
        .groupBy("k").agg(count(lit(1)).as("n"))
      assert(scannedTables(c) === Seq("tl_mv"))
    } finally MvRewrite.clear(spark)
  }
}
