package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential fuzzing of the MV-rewrite optimizer rule — the same
  * recipe QueryEngineFuzzSpec applies to the predicate parser and
  * LakeSqlScannerFuzzSpec to the SQL scanner: random aggregate shapes
  * run twice, once with the rule registered and once without, and the
  * results must match row-for-row. The generator deliberately mixes
  * in-envelope shapes (exact key set, rollup subsets, key-only filters,
  * covered aggregates) with OUT-of-envelope ones (non-key filters,
  * non-key grouping, uncovered columns), so both the substitution and
  * the conservative refusal are exercised — a wrong rewrite OR a wrong
  * refusal that changes results fails the diff. The run also asserts
  * the envelope actually engaged (a fuzz where the rule never fires
  * proves nothing). Each shape is built TWICE from the same seed — a
  * DataFrame caches its optimized plan, so reusing one object for both
  * arms would compare the rewrite against itself.
  */
class MvRewriteFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def scannedTables(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => h.location match {
            case i: LakeFileIndex => Some(i.tableName)
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }

  test("random aggregates: rewritten results equal rule-off results, " +
      "single-table and join MVs") {
    val log = new LakeLog(tmpDir("mvfuzz"))
    // base: composite key (cat, seg), covered sum/min/max col v, an
    // UNcovered numeric col u, and a join key fk onto a 5-row dim
    val rows = (1 to 400).map { i =>
      (i.toLong % 5, s"c${i % 5}", s"s${i % 3}", (i % 37).toDouble,
        ((i * 7) % 23).toDouble)
    }.toDF("fk", "cat", "seg", "v", "u")
    val dimJ = (0 until 5).map(i => (i.toLong, s"c$i", s"g${i % 2}"))
      .toDF("fk", "dcat", "dgrp")
    LakeTable.createTable(log, "base", rows.schema)
    LakeTable.insert(spark, log, "base", rows)
    LakeTable.createTable(log, "dimj", dimJ.schema)
    LakeTable.insert(spark, log, "dimj", dimJ)
    val single = MaterializedView.MvDef("f_mv", "base", "cat",
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"),
      extraKeyCols = Seq("seg"))
    val joinMv = MaterializedView.MvDef("fj_mv", "base", "dcat",
      sumCols = Seq("v"), extraKeyCols = Seq("dgrp"),
      joinTable = Some("dimj"), joinOn = Some("fk"))
    MaterializedView.create(log, single)
    MaterializedView.refresh(spark, log, single)
    MaterializedView.create(log, joinMv)
    MaterializedView.refresh(spark, log, joinMv)

    def buildQuery(seed: Long, isJoin: Boolean): DataFrame = {
      val rnd = new scala.util.Random(seed)
      val src =
        if (isJoin)
          LakeTable.readIndexed(spark, log, "base")
            .join(LakeTable.readIndexed(spark, log, "dimj"), Seq("fk"),
              "inner")
        else LakeTable.readIndexed(spark, log, "base")
      val keys = if (isJoin) Seq("dcat", "dgrp") else Seq("cat", "seg")
      val grouping = rnd.nextInt(4) match {
        case 0 => keys // exact key set: direct substitution
        case 1 => Seq(keys(rnd.nextInt(2))) // rollup subset
        case 2 => Nil // global rollup
        case _ => Seq(keys.head, "u") // non-key grouping: refusal
      }
      val filtered = rnd.nextInt(4) match {
        case 0 => src
        case 1 => src.filter(col(keys.head) =!= s"c${rnd.nextInt(5)}")
        case 2 => src.filter(col(keys(1)).isin("s0", "s1", "g0"))
        case _ => src.filter(col("v") > rnd.nextInt(20)) // non-key: refusal
      }
      val aggs = Seq(
        count(lit(1)).as("n_rows"),
        sum("v").as("sum_v"),
        avg("v").as("avg_v")) ++
        (if (!isJoin) Seq(min("v").as("min_v"), max("v").as("max_v"))
         else Nil) ++
        (if (rnd.nextInt(3) == 0) Seq(sum("u").as("sum_u")) // uncovered
         else Nil)
      val picked = aggs.take(1 + rnd.nextInt(aggs.size))
      val agged =
        if (grouping.isEmpty) filtered.agg(picked.head, picked.tail: _*)
        else filtered.groupBy(grouping.map(col): _*)
          .agg(picked.head, picked.tail: _*)
      // operators ABOVE the aggregate (HAVING, sort) resolve against the
      // aggregate's output exprIds — the rewrite preserves them, and a
      // slip here breaks analysis or silently reorders, both of which
      // the diff catches
      rnd.nextInt(3) match {
        case 0 => agged
        case 1 => agged.filter(col("n_rows") > 10) // HAVING (always picked)
        case _ if picked.size >= 2 =>
          agged.orderBy(col("sum_v").desc_nulls_last)
        case _ => agged
      }
    }

    val seeds = new scala.util.Random(23)
    var fired = 0
    (1 to 40).foreach { i =>
      val seed = seeds.nextLong()
      val isJoin = i % 2 == 0
      MvRewrite.register(spark, log, Seq(single, joinMv))
      val (scans, withRule) =
        try {
          val q = buildQuery(seed, isJoin)
          (scannedTables(q), q.collect().map(_.toString).sorted.toSeq)
        } finally MvRewrite.clear(spark)
      if (scans == Seq("f_mv") || scans == Seq("fj_mv")) fired += 1
      val without = buildQuery(seed, isJoin)
        .collect().map(_.toString).sorted.toSeq
      assert(withRule == without,
        s"iteration $i (seed $seed, join=$isJoin) diverged; " +
          s"rule scanned: ${scans.mkString(",")}")
    }
    assert(fired >= 8, s"envelope engaged only $fired/40 times — the fuzz " +
      "is not exercising the rewrite")
  }
}
