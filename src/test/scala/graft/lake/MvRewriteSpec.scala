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
      // a filter on a NON-KEY column changes the group contents — must
      // hit the base (key-only filters DO rewrite; see the filter test)
      val f = LakeTable.readIndexed(spark, log, "base")
        .filter(col("q") > 1.0).groupBy("k")
        .agg(sum("q").as("sq"))
      assert(scannedTables(f) === Seq("base"))
      // avg of a column the MV has no SUM for — must hit the base
      val a = LakeTable.readIndexed(spark, log, "base")
        .groupBy("k").agg(avg("p").as("ap"))
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

  test("avg of a covered sum column answers as sum_c / n_rows") {
    val (log, d) = setup()
    val direct = LakeTable.readIndexed(spark, log, "base")
      .groupBy("k").agg(avg("q").as("aq"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    MvRewrite.register(spark, log, Seq(d))
    try {
      val q = LakeTable.readIndexed(spark, log, "base")
        .groupBy("k").agg(avg("q").as("aq"), count(lit(1)).as("n"))
      assert(scannedTables(q) === Seq("base_mv"))
      assert(q.orderBy("k").collect().toSeq === direct)
    } finally MvRewrite.clear(spark)
  }

  test("a key-only filter rewrites to a filtered MV scan") {
    val (log, d) = setup()
    def q() = LakeTable.readIndexed(spark, log, "base")
      .filter(col("k") =!= "b").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"))
    val direct = q().orderBy("k").collect().toSeq
    MvRewrite.register(spark, log, Seq(d))
    try {
      assert(scannedTables(q()) === Seq("base_mv"))
      assert(q().orderBy("k").collect().toSeq === direct)
      // filter UNDER a projection resolves too
      val proj = LakeTable.readIndexed(spark, log, "base")
        .filter(col("k").isin("a", "c")).select(col("k").as("kk"), col("q"))
        .groupBy("kk").agg(sum("q").as("sq"))
      assert(scannedTables(proj) === Seq("base_mv"))
      assert(proj.orderBy("kk").as[(String, Double)].collect().toSeq ===
        Seq(("a", 3.0), ("c", 5.0)))
    } finally MvRewrite.clear(spark)
  }

  test("composite group key: MV answers GROUP BY k1, k2") {
    val log = new LakeLog(tmpDir("mvrw-mk"))
    val rows = Seq(("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
      ("b", 1, 4.0), ("b", 2, 5.0), ("b", 2, 6.0)).toDF("k1", "k2", "v")
    LakeTable.createTable(log, "mk", rows.schema)
    LakeTable.insert(spark, log, "mk", rows)
    val d = MaterializedView.MvDef("mk_mv", "mk", "k1", sumCols = Seq("v"),
      extraKeyCols = Seq("k2"))
    MaterializedView.create(log, d)
    MaterializedView.refresh(spark, log, d)
    def q() = LakeTable.readIndexed(spark, log, "mk")
      .groupBy("k1", "k2").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val direct = q().orderBy("k1", "k2").collect().toSeq
    MvRewrite.register(spark, log, Seq(d))
    try {
      assert(scannedTables(q()) === Seq("mk_mv"))
      assert(q().orderBy("k1", "k2").collect().toSeq === direct)
      // incremental refresh keeps the composite key mergeable
      LakeTable.insert(spark, log, "mk",
        Seq(("a", 2, 10.0)).toDF("k1", "k2", "v"))
      assert(MaterializedView.refresh(spark, log, d).mode == "incremental")
      val q2 = q()
      assert(scannedTables(q2) === Seq("mk_mv"))
      assert(q2.filter(col("k1") === "a" && col("k2") === 2)
        .select("sv").as[Double].head === 13.0)
      // grouping by a strict SUBSET of the key set ROLLS UP: the MV is
      // re-aggregated (sum of sums / sum of counts) — still O(|MV|)
      def sub() = LakeTable.readIndexed(spark, log, "mk")
        .groupBy("k1").agg(count(lit(1)).as("n"), sum("v").as("sv"),
          avg("v").as("av"))
      val directSub = {
        MvRewrite.clear(spark)
        val r = sub().orderBy("k1").collect().toSeq
        MvRewrite.register(spark, log, Seq(d)); r
      }
      assert(scannedTables(sub()) === Seq("mk_mv"))
      assert(sub().orderBy("k1").collect().toSeq === directSub)
      // ... and the GLOBAL (no GROUP BY) aggregate rolls up too
      def glob() = LakeTable.readIndexed(spark, log, "mk")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val directGlob = {
        MvRewrite.clear(spark)
        val r = glob().collect().toSeq
        MvRewrite.register(spark, log, Seq(d)); r
      }
      assert(scannedTables(glob()) === Seq("mk_mv"))
      assert(glob().collect().toSeq === directGlob)
      // a key-only filter composes with the rollup (filter on k2, a key
      // NOT in the grouped subset — still whole-MV-row semantics)
      def fsub() = LakeTable.readIndexed(spark, log, "mk")
        .filter(col("k2") === 2).groupBy("k1").agg(sum("v").as("sv"))
      val directF = {
        MvRewrite.clear(spark)
        val r = fsub().orderBy("k1").collect().toSeq
        MvRewrite.register(spark, log, Seq(d)); r
      }
      assert(scannedTables(fsub()) === Seq("mk_mv"))
      assert(fsub().orderBy("k1").collect().toSeq === directF)
      // grouping by a NON-key column still refuses
      val nk = LakeTable.readIndexed(spark, log, "mk")
        .groupBy("v").agg(count(lit(1)).as("n"))
      assert(scannedTables(nk) === Seq("mk"))
    } finally MvRewrite.clear(spark)
  }

  test("the MV read is PINNED to the refresh that folded the checked version") {
    val (log, d) = setup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      val mvVer = MaterializedView.refreshVersionAt(log, d,
        log.latestVersion("base"))
      assert(mvVer.isDefined)
      val q = agg(log)
      assert(scannedTables(q) === Seq("base_mv"))
      // the plan's MV scan must carry the pinned version, not latest
      val pinned = q.queryExecution.optimizedPlan.collectLeaves().collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location match { case lfi: LakeFileIndex => lfi.tableVersion }
          }
      }
      assert(pinned === Seq(mvVer.get))
    } finally MvRewrite.clear(spark)
  }

  test("clear removes the rule; registry holds sessions weakly") {
    val (log, d) = setup()
    MvRewrite.register(spark, log, Seq(d))
    assert(spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[MvRewriteRule]))
    MvRewrite.clear(spark)
    assert(!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[MvRewriteRule]))
    assert(MvRewrite.registered(spark).isEmpty)
    // weak keys: a dropped session's Registration becomes collectable
    val before = MvRewrite.registrySize
    var child = spark.newSession()
    MvRewrite.register(child, log, Seq(d))
    assert(MvRewrite.registrySize == before + 1)
    child = null
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (MvRewrite.registrySize > before && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(50)
    }
    assert(MvRewrite.registrySize == before,
      "stopped/dropped session's Registration was never collected")
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

  test("the rewrite fires THROUGH a logical view (views inline first)") {
    val (log, d) = setup()
    // a logical view is a plan-time macro: by the time the optimizer
    // runs, `SELECT ... FROM raw_base` has inlined to alias-only
    // projections over the base scan — exactly the shape the rule
    // proves. The composition costs nothing and needs no view-specific
    // rule code; this pins that it actually happens.
    Views.create(spark, log, "raw_base", "SELECT k, q, p FROM base")
    MvRewrite.register(spark, log, Seq(d))
    try {
      val q = graft.api.SqlApi.queryLake(spark, log,
        "SELECT k, count(*) AS n, sum(q) AS sq FROM raw_base GROUP BY k")
      assert(scannedTables(q) === Seq("base_mv"),
        s"expected the MV scan through the view, got ${scannedTables(q)}")
      val direct = agg(log).select("k", "n", "sq").orderBy("k")
        .collect().toSeq
      assert(q.orderBy("k").collect().toSeq === direct)
    } finally MvRewrite.clear(spark)
  }

  test("governed reads never wrongly rewrite: a row filter on a " +
      "non-key column disqualifies, a key-only filter still answers") {
    val (log, d) = setup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      // row-level security filter on q (NOT a group key): the governed
      // aggregate sees a subset of rows the MV never stored — the rule
      // must leave it on the base scan, or analysts would read
      // ungoverned totals
      RowFilter.setFilter(spark, log, "base", "q < 4.0")
      val governed = RowFilter.readGoverned(spark, log, "base", "analyst")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("q").as("sq"))
      assert(scannedTables(governed) === Seq("base"),
        "a non-key row filter must disqualify the MV rewrite")
      assert(governed.orderBy("k").as[(String, Long, Double)]
        .collect().toSeq === Seq(("a", 2L, 3.0), ("b", 1L, 3.0)))
      // a key-only filter (k partitions whole groups) still rewrites —
      // governance and the rewrite compose when provable
      RowFilter.setFilter(spark, log, "base", "k <> 'c'")
      val keyGoverned = RowFilter.readGoverned(spark, log, "base", "x")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("q").as("sq"))
      assert(scannedTables(keyGoverned) === Seq("base_mv"),
        "a key-only row filter should re-anchor onto the MV scan")
      assert(keyGoverned.orderBy("k").as[(String, Long, Double)]
        .collect().toSeq === Seq(("a", 2L, 3.0), ("b", 2L, 7.0)))
    } finally {
      MvRewrite.clear(spark)
      RowFilter.dropFilter(log, "base")
    }
  }

  test("a join MV never rewrites a single-table aggregate") {
    val (log, d) = setup()
    val jd = d.copy(name = "base_mv", joinTable = Some("dim"),
      joinOn = Some("k"))
    MvRewrite.register(spark, log, Seq(jd))
    try {
      val q = agg(log)
      assert(scannedTables(q) === Seq("base"),
        "a join MV must not answer a single-table aggregate")
    } finally MvRewrite.clear(spark)
  }

  private def joinSetup(): (LakeLog, MaterializedView.MvDef) = {
    val log = new LakeLog(tmpDir("mvjrw"))
    val fact = Seq((1L, 2.0), (1L, 3.0), (2L, 5.0), (3L, 7.0), (2L, 1.0))
      .toDF("fk", "q")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("fk", "cat")
    LakeTable.createTable(log, "fct", fact.schema)
    LakeTable.createTable(log, "dm", dim.schema)
    LakeTable.insert(spark, log, "fct", fact)
    LakeTable.insert(spark, log, "dm", dim)
    val d = MaterializedView.MvDef("j_mv", "fct", "cat",
      sumCols = Seq("q"), joinTable = Some("dm"), joinOn = Some("fk"))
    MaterializedView.create(log, d)
    MaterializedView.refresh(spark, log, d)
    (log, d)
  }

  private def joinAgg(log: LakeLog): DataFrame =
    LakeTable.readIndexed(spark, log, "fct")
      .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
      .groupBy("cat")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"))

  test("join MV answers the star aggregate when fresh on BOTH tables") {
    val (log, d) = joinSetup()
    val direct = joinAgg(log).orderBy("cat").collect().toSeq
    MvRewrite.register(spark, log, Seq(d))
    try {
      val q = joinAgg(log)
      assert(scannedTables(q) === Seq("j_mv"),
        s"join rewrite did not fire: ${scannedTables(q)}")
      assert(q.orderBy("cat").collect().toSeq === direct)
      // inner joins commute: the reversed order rewrites too
      val qr = LakeTable.readIndexed(spark, log, "dm")
        .join(LakeTable.readIndexed(spark, log, "fct"), Seq("fk"), "inner")
        .groupBy("cat").agg(count(lit(1)).as("n"), sum("q").as("sq"))
      assert(scannedTables(qr) === Seq("j_mv"))
      assert(qr.orderBy("cat").collect().toSeq === direct)
      // rollup over the join: the GLOBAL aggregate re-aggregates the MV
      val g = LakeTable.readIndexed(spark, log, "fct")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"))
      assert(scannedTables(g) === Seq("j_mv"))
      assert(g.head() === org.apache.spark.sql.Row(5L, 18.0))
    } finally MvRewrite.clear(spark)
  }

  test("join MV refuses when dim or fact moved past the folded versions") {
    val (log, d) = joinSetup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      // dim-only commit: fact is current but the folded dim is stale
      LakeTable.insert(spark, log, "dm", Seq((9L, "z")).toDF("fk", "cat"))
      assert(scannedTables(joinAgg(log)).sorted === Seq("dm", "fct"))
      MaterializedView.refresh(spark, log, d)
      assert(scannedTables(joinAgg(log)) === Seq("j_mv"))
      // fact commit: high-water mark behind the scanned version
      LakeTable.insert(spark, log, "fct", Seq((9L, 1.0)).toDF("fk", "q"))
      assert(scannedTables(joinAgg(log)).sorted === Seq("dm", "fct"))
    } finally MvRewrite.clear(spark)
  }

  test("join shape guards: outer join / non-key filter / non-key group " +
      "refuse; key filter rewrites filtered") {
    val (log, d) = joinSetup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      val outer = LakeTable.readIndexed(spark, log, "fct")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "left")
        .groupBy("cat").agg(count(lit(1)).as("n"))
      assert(scannedTables(outer).sorted === Seq("dm", "fct"),
        "an outer join is outside the provable envelope")
      val nonKey = LakeTable.readIndexed(spark, log, "fct")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
        .filter(col("q") > 2.0)
        .groupBy("cat").agg(sum("q").as("sq"))
      assert(scannedTables(nonKey).sorted === Seq("dm", "fct"),
        "a non-key filter must disqualify")
      val byJoinKey = LakeTable.readIndexed(spark, log, "fct")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
        .groupBy("fk").agg(sum("q").as("sq"))
      assert(scannedTables(byJoinKey).sorted === Seq("dm", "fct"),
        "grouping on a non-MV-key column must disqualify")
      // a key-only filter commutes: filtered MV scan, same values
      val keyFilter = LakeTable.readIndexed(spark, log, "fct")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
        .filter(col("cat") === "a")
        .groupBy("cat").agg(sum("q").as("sq"))
      assert(scannedTables(keyFilter) === Seq("j_mv"))
      assert(keyFilter.collect().map(r =>
        (r.getString(0), r.getDouble(1))).toSeq === Seq(("a", 12.0)))
      // an INEQUALITY key filter pushes down as ONE compound condition —
      // `(isnotnull(cat) AND cat <> 'b') AND isnotnull(fk)` — whose
      // buried joinOn conjunct used to poison the key-only proof; the
      // conjunct split accepts it (round-20 fix)
      val keyNeq = LakeTable.readIndexed(spark, log, "fct")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
        .filter(col("cat") =!= "b")
        .groupBy("cat").agg(sum("q").as("sq"))
      assert(scannedTables(keyNeq) === Seq("j_mv"),
        s"compound key filter must still rewrite: ${scannedTables(keyNeq)}")
      assert(keyNeq.collect().map(r =>
        (r.getString(0), r.getDouble(1))).toSeq === Seq(("a", 12.0)))
    } finally MvRewrite.clear(spark)
  }

  test("governed fact reads never wrongly rewrite through the JOIN MV; " +
      "a key-only dim filter still answers") {
    val (log, d) = joinSetup()
    MvRewrite.register(spark, log, Seq(d))
    try {
      // row filter on the FACT's measure column: the governed join
      // aggregate sees a row subset the MV never stored — must stay on
      // the base scans
      RowFilter.setFilter(spark, log, "fct", "q < 5.0")
      val governed = RowFilter.readGoverned(spark, log, "fct", "analyst")
        .join(LakeTable.readIndexed(spark, log, "dm"), Seq("fk"), "inner")
        .groupBy("cat").agg(count(lit(1)).as("n"), sum("q").as("sq"))
      assert(scannedTables(governed).sorted === Seq("dm", "fct"),
        "a non-key fact row filter must disqualify the join rewrite")
      assert(governed.orderBy("cat").as[(String, Long, Double)]
        .collect().toSeq === Seq(("a", 2L, 5.0), ("b", 1L, 1.0)))
      RowFilter.dropFilter(log, "fct")
      // a row filter over the MV KEY column on the dim side partitions
      // whole groups — governance and the join rewrite compose
      RowFilter.setFilter(spark, log, "dm", "cat <> 'b'")
      val keyGoverned = LakeTable.readIndexed(spark, log, "fct")
        .join(RowFilter.readGoverned(spark, log, "dm", "analyst"),
          Seq("fk"), "inner")
        .groupBy("cat").agg(count(lit(1)).as("n"), sum("q").as("sq"))
      assert(scannedTables(keyGoverned) === Seq("j_mv"),
        "a key-only dim row filter should re-anchor onto the MV scan")
      assert(keyGoverned.orderBy("cat").as[(String, Long, Double)]
        .collect().toSeq === Seq(("a", 3L, 12.0)))
    } finally {
      MvRewrite.clear(spark)
      RowFilter.dropFilter(log, "dm")
    }
  }
}
