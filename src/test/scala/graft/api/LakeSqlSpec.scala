package graft.api

import graft.SparkSpec
import graft.lake.{LakeLog, LakeTable}
import org.apache.spark.sql.functions._

/** The SQL DML/utility dispatcher: every lake mutation drivable from a SQL
  * string, with the ACID machinery (OCC, DVs, compaction, vacuum) behind
  * it.
  */
class LakeSqlSpec extends SparkSpec {
  import spark.implicits._

  test("full DML lifecycle through SQL statements") {
    val log = new LakeLog(tmpDir("lakesql"))
    def sql(s: String) = LakeSql.execute(spark, log, s)

    sql("CREATE TABLE t (id int64, cat string, price float64)")
    LakeTable.insert(spark, log, "t",
      (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 1.5))
        .toDF("id", "cat", "price"))

    sql("CREATE TABLE t2 (id int64, cat string, price float64)")
    sql("INSERT INTO t2 SELECT id, cat, price FROM t WHERE id <= 80")
    assert(LakeTable.read(spark, log, "t2").count() == 80)
    val preDelete = log.latestVersion("t2")

    // default delete is merge-on-read: a DV appears, files stay
    val del = sql("DELETE FROM t2 WHERE id > 50").head()
    assert(del.getAs[String]("mode") == "mor" &&
      del.getAs[Long]("rows_deleted") == 30L)
    assert(log.snapshot("t2").files.exists(_.dvRows > 0))
    assert(LakeTable.read(spark, log, "t2").count() == 50)

    // restore undoes it, SQL-side
    sql(s"RESTORE TABLE t2 TO VERSION AS OF $preDelete")
    assert(LakeTable.read(spark, log, "t2").count() == 80)

    // COW hint forces the rewrite path
    val cow = sql("DELETE /*+ COW */ FROM t2 WHERE id > 60").head()
    assert(cow.getAs[String]("mode") == "cow" &&
      cow.getAs[Long]("rows_deleted") == 20L)

    sql("ALTER TABLE t2 ADD COLUMN note string")
    assert(LakeTable.read(spark, log, "t2").columns.contains("note"))

    sql("OPTIMIZE t2")
    assert(log.snapshot("t2").files.forall(_.dv.isEmpty))
    sql("VACUUM t2 RETAIN 1 VERSIONS")
    assert(sql("DESCRIBE HISTORY t2").count() >= 5)
    assert(sql("DESCRIBE DETAIL t2")
      .agg(sum("live_rows")).as[Long].head() == 60L)
    assert(sql("SELECT count(*) AS n FROM t2").as[Long].head() == 60L)
    assert(sql("SELECT max(id) AS m FROM t2 WHERE cat = 'a'")
      .as[Long].head() == 60L)
  }

  test("partitioned create + zorder optimize via SQL") {
    val log = new LakeLog(tmpDir("lakesqlp"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE TABLE p (id int64, region string, v float64) " +
      "PARTITIONED BY (region)")
    assert(log.snapshot("p").schema.get.partCols == Seq("region"))
    LakeTable.insert(spark, log, "p",
      (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "eu" else "us", i * 1.0))
        .toDF("id", "region", "v"))
    sql("OPTIMIZE p ZORDER BY (id, v)")
    assert(sql("SELECT count(*) AS n FROM p WHERE region = 'eu'")
      .as[Long].head() == 20L)
    // curve choice flows through the SQL face: land 3 more small files
    // per partition so compaction actually plans groups, then hilbert
    // re-sorts them (files_removed > 0 proves the rewrite ran)
    (0 until 3).foreach { i =>
      LakeTable.insert(spark, log, "p",
        (1 to 10).map(j => ((100 + i * 10 + j).toLong,
          if (j % 2 == 0) "eu" else "us", j * 1.0)).toDF("id", "region", "v"))
    }
    val hop = sql("OPTIMIZE p ZORDER BY (id, v) CURVE hilbert").head
    assert(hop.getAs[Long]("files_removed") >= 3L)
    assert(sql("SELECT count(*) AS n FROM p").as[Long].head() == 70L)
    // and the arity-1 path: after dropping the constant partition column
    // (region), (id, region) leaves ONE z-col — the curve degenerates to
    // rank order and the OPTIMIZE still completes
    (0 until 3).foreach { i =>
      LakeTable.insert(spark, log, "p",
        (1 to 10).map(j => ((200 + i * 10 + j).toLong,
          if (j % 2 == 0) "eu" else "us", j * 1.0)).toDF("id", "region", "v"))
    }
    val fop = sql("OPTIMIZE p ZORDER BY (id, region) CURVE hilbert").head
    assert(fop.getAs[Long]("files_removed") >= 3L)
    assert(sql("SELECT count(*) AS n FROM p").as[Long].head() == 100L)
  }

  test("OPTIMIZE WHERE: compacts only the scoped partition's files") {
    val log = new LakeLog(tmpDir("lakesqlo"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE TABLE o (id int64, region string, v float64) " +
      "PARTITIONED BY (region)")
    // 3 small files per partition
    (1 to 3).foreach { i =>
      LakeTable.insert(spark, log, "o",
        (1 to 10).map(j => ((i * 100 + j).toLong, "eu", j * 1.0))
          .toDF("id", "region", "v"))
      LakeTable.insert(spark, log, "o",
        (1 to 10).map(j => ((i * 1000 + j).toLong, "us", j * 1.0))
          .toDF("id", "region", "v"))
    }
    val usBefore = log.snapshot("o").files
      .filter(_.partition("region") == "us").map(_.path).toSet
    val st = sql("OPTIMIZE o WHERE region = eu").head
    assert(st.getAs[Long]("files_removed") == 3L &&
      st.getAs[Long]("files_added") == 1L)
    val after = log.snapshot("o").files
    assert(after.count(_.partition("region") == "eu") == 1)
    // the other partition's files are untouched — same paths
    assert(after.filter(_.partition("region") == "us")
      .map(_.path).toSet == usBefore)
    assert(sql("SELECT count(*) AS n FROM o").as[Long].head() == 60L)
  }

  test("VERSION AS OF rejects aliases, version 0, and conflicting versions") {
    import graft.lake.LakeValidationException
    val log = new LakeLog(tmpDir("lakesqlv"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE TABLE v (id int64, cat string, v float64)")
    LakeTable.insert(spark, log, "v",
      (1 to 5).map(i => (i.toLong, "a", i * 1.0)).toDF("id", "cat", "v"))
    val vNow = log.latestVersion("v")
    assert(sql(s"SELECT count(*) AS n FROM v VERSION AS OF $vNow")
      .as[Long].head() == 5)
    // alias captured instead of the table name → loud failure, not a
    // silent latest-read
    intercept[LakeValidationException] {
      sql("SELECT count(*) AS n FROM v AS x VERSION AS OF 1")
    }
    // version 0 is the snapshot resolver's latest-sentinel → rejected
    intercept[LakeValidationException] {
      sql("SELECT count(*) AS n FROM v VERSION AS OF 0")
    }
    // two different versions for one table → rejected
    intercept[LakeValidationException] {
      sql("SELECT a.id FROM v VERSION AS OF 1 a " +
        "JOIN v VERSION AS OF 2 b ON a.id = b.id")
    }
  }

  test("MERGE INTO: matched rows replaced, new rows inserted") {
    val log = new LakeLog(tmpDir("lakesqlm"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE TABLE m (id int64, cat string, v float64)")
    LakeTable.insert(spark, log, "m",
      (1 to 10).map(i => (i.toLong, "old", i * 1.0)).toDF("id", "cat", "v"))
    // source: ids 8..12 — 8,9,10 update in place, 11,12 are new
    LakeTable.insert(spark, log, "m",
      Seq.empty[(Long, String, Double)].toDF("id", "cat", "v"))
    val st = sql("MERGE INTO m USING (" +
      "SELECT id + 7 AS id, 'new' AS cat, 0.5 AS v FROM m WHERE id <= 5" +
      ") ON id")
    assert(st.columns.contains("version"))
    val back = sql("SELECT id, cat FROM m ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(back.length == 12)
    assert(back.filter(_._1 <= 7).forall(_._2 == "old"))
    assert(back.filter(_._1 >= 8).forall(_._2 == "new"))
  }

  test("materialized views by name: CREATE persists the def, REFRESH folds") {
    val log = new LakeLog(tmpDir("lakesqlmv"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE TABLE src (k string, v float64, w int64)")
    LakeTable.insert(spark, log, "src",
      Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L))
        .toDF("k", "v", "w"))
    val created = sql("CREATE MATERIALIZED VIEW src_mv ON src KEY k " +
      "SUM (v) MIN (w) MAX (w)").head()
    assert(created.getAs[Boolean]("created"))
    assert(graft.lake.MaterializedView.loadDef(log, "src_mv")
      .exists(d => d.base == "src" && d.sumCols == Seq("v") &&
        d.minCols == Seq("w")))
    val r1 = sql("REFRESH MATERIALIZED VIEW src_mv").head()
    assert(r1.getAs[String]("mode") == "incremental")
    assert(LakeTable.read(spark, log, "src_mv")
      .filter($"k" === "a").select("sum_v").as[Double].head() == 3.0)
    // a second slice folds incrementally on a by-name refresh
    LakeTable.insert(spark, log, "src",
      Seq(("a", 4.0, 0L)).toDF("k", "v", "w"))
    val r2 = sql("REFRESH MATERIALIZED VIEW src_mv").head()
    assert(r2.getAs[String]("mode") == "incremental")
    val row = LakeTable.read(spark, log, "src_mv")
      .filter($"k" === "a").select("n_rows", "sum_v", "min_w")
      .as[(Long, Double, Long)].head()
    assert(row == ((3L, 7.0, 0L)))
    // refreshing an unknown name fails loudly
    intercept[graft.lake.LakeValidationException] {
      sql("REFRESH MATERIALIZED VIEW nope")
    }
  }

  test("repeated DDL is not swallowed by the idempotency txn map") {
    // Deterministic DDL txn ids made ADD-after-DROP (and rename cycles)
    // replay as duplicate transactions: success status, no schema change.
    val log = new LakeLog(tmpDir("lakesql"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE TABLE d (id int64, a string)")
    LakeTable.insert(spark, log, "d",
      (1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "a"))

    // constraint drop → re-add with a DIFFERENT predicate must enforce
    // the new predicate, not replay the old txn
    sql("ALTER TABLE d ADD CONSTRAINT ck CHECK (id > 0)")
    sql("ALTER TABLE d DROP CONSTRAINT ck")
    sql("ALTER TABLE d ADD CONSTRAINT ck CHECK (id < 100)")
    val checks = log.snapshot("d").schema.get.checks
    assert(checks.get("ck").exists(_.contains("id < 100")),
      s"re-added constraint lost to txn replay: $checks")
    intercept[graft.lake.LakeValidationException] {
      LakeTable.insert(spark, log, "d",
        Seq((500L, "big")).toDF("id", "a"))
    }

    // column add → drop → re-add must land (fresh physical name)
    sql("ALTER TABLE d ADD COLUMN extra string")
    sql("ALTER TABLE d DROP COLUMN extra")
    sql("ALTER TABLE d ADD COLUMN extra string")
    assert(log.snapshot("d").schema.get.fields.map(_.name)
      .contains("extra"), "ADD COLUMN after DROP swallowed by txn replay")

    // rename cycle a -> b -> a -> b must end at b
    sql("ALTER TABLE d RENAME COLUMN a TO b")
    sql("ALTER TABLE d RENAME COLUMN b TO a")
    sql("ALTER TABLE d RENAME COLUMN a TO b")
    val names = log.snapshot("d").schema.get.fields.map(_.name)
    assert(names.contains("b") && !names.contains("a"),
      s"rename cycle swallowed by txn replay: $names")
  }

  test("TABLE_CHANGES('t', from[, to]) reads the CDC feed in plain SQL") {
    import graft.lake.{LakeLog, LakeTable, LakeValidationException}
    val log = new LakeLog(tmpDir("tblchg"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    val rows1 = (1L to 10L).map(i => (i, i * 2)).toDF("id", "v")
    val rows2 = (11L to 20L).map(i => (i, i * 2)).toDF("id", "v")
    LakeTable.createTable(log, "t", rows1.schema)
    LakeTable.insert(spark, log, "t", rows1, txnId = "b1") // v1
    LakeTable.insert(spark, log, "t", rows2, txnId = "b2") // v2
    LakeTable.deleteWhereMor(spark, log, "t", "id <= 3")   // v3 (DV)
    // full window since v1: 10 inserts + 3 delete pre-images
    val full = sql("SELECT _change_type, count(*) AS n FROM " +
        "TABLE_CHANGES('t', 1) GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect().toSeq
    assert(full === Seq(("delete", 3L), ("insert", 10L)))
    // bounded window (1, 2]: inserts only, and the feed composes with
    // plain SQL (filter + aggregate over the function's columns)
    assert(sql("SELECT sum(v) AS s FROM TABLE_CHANGES('t', 1, 2) " +
      "WHERE _change_type = 'insert'").as[Long].head() ===
      (11L to 20L).map(_ * 2).sum)
    // joins against regular tables work — the function is just a view
    assert(sql("SELECT count(*) AS n FROM TABLE_CHANGES('t', 1, 2) c " +
      "JOIN t ON c.id = t.id").as[Long].head() === 10L)
    // a CoW window has no pre-images: refuse loudly, never partial
    sql("DELETE /*+ COW */ FROM t WHERE id = 20")
    intercept[LakeValidationException](
      sql("SELECT * FROM TABLE_CHANGES('t', 1)"))
    // bounded windows BEFORE the CoW entry still read fine
    assert(sql("SELECT count(*) AS n FROM TABLE_CHANGES('t', 1, 3)")
      .as[Long].head() === 13L)
    // unknown table refuses
    intercept[LakeValidationException](
      sql("SELECT * FROM TABLE_CHANGES('nope', 0)"))
  }

  test("TABLE_DIFF('t', from, to, 'key') classifies rows in plain SQL") {
    import graft.lake.{LakeLog, LakeTable}
    val log = new LakeLog(tmpDir("tbldiff"))
    def sql(s: String) = LakeSql.execute(spark, log, s)
    val rows1 = (1L to 10L).map(i => (i, i * 2)).toDF("id", "v")
    LakeTable.createTable(log, "t", rows1.schema)
    LakeTable.insert(spark, log, "t", rows1)            // v1
    sql("DELETE /*+ COW */ FROM t WHERE id <= 2")        // v2 (CoW!)
    LakeTable.insert(spark, log, "t",
      Seq((11L, 22L), (12L, 24L)).toDF("id", "v"))       // v3
    sql("UPDATE t SET v = v + 1 WHERE id = 10")          // v4 (CoW)
    // the keyed diff works across the CoW window TABLE_CHANGES refuses
    val d = sql("SELECT change_type, count(*) AS n FROM " +
        "TABLE_DIFF('t', 1, 4, 'id') GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect().toSeq
    assert(d === Seq(("delete", 2L), ("insert", 2L), ("update", 1L)))
    // old/new value columns ride along for the updated key
    assert(sql("SELECT old_v, new_v FROM TABLE_DIFF('t', 1, 4, 'id') " +
      "WHERE change_type = 'update'").as[(Long, Long)].head() ===
      ((20L, 21L)))
  }

  test("TVF text inside string literals / comments is never substituted") {
    import graft.lake.{LakeLog, LakeTable}
    val log = new LakeLog(tmpDir("tvflit"))
    def sql(q: String) = LakeSql.execute(spark, log, q)
    val rows = (1L to 5L).map(i => (i, i * 2)).toDF("id", "v")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows)                        // v1
    LakeTable.insert(spark, log, "t", Seq((9L, 18L)).toDF("id", "v")) // v2
    // the literal keeps its exact text while the REAL call substitutes
    val out = sql("SELECT 'see TABLE_CHANGES(''t'', 1) for docs' AS note, " +
        "count(*) AS n FROM TABLE_CHANGES('t', 1)")
      .as[(String, Long)].head()
    assert(out._1 == "see TABLE_CHANGES('t', 1) for docs")
    assert(out._2 == 1L)
    // a -- comment mentioning a TVF registers nothing and stays verbatim
    assert(sql("SELECT count(*) AS n FROM TABLE_CHANGES('t', 1, 2)" +
      " -- TABLE_DIFF('t', 0, 1, 'id') would be wrong here\n")
      .as[Long].head() == 1L)
    // same for a bracketed /* */ comment (nesting is covered at the
    // scanner level by LakeSqlScannerFuzzSpec) and a DOUBLE-quoted
    // literal — Spark's default lexer reads "…" as a string
    assert(sql("SELECT count(*) AS n FROM TABLE_CHANGES('t', 1, 2) " +
      "/* TABLE_DIFF('t', 0, 1, 'id') would be wrong here */")
      .as[Long].head() == 1L)
    val dq = sql("SELECT \"quoted TABLE_CHANGES('t', 7)\" AS note, " +
        "count(*) AS n FROM TABLE_CHANGES('t', 1)")
      .as[(String, Long)].head()
    assert(dq._1 == "quoted TABLE_CHANGES('t', 7)" && dq._2 == 1L)
  }

  test("maintenance verbs: OPTIMIZE SKETCH STORE, VACUUM POLICIES, " +
      "VACUUM VIEW CATALOG") {
    import graft.lake.{LakeLog, LakeTable, Masking, RowFilter, Views}
    import graft.operators.QDigest
    val log = new LakeLog(tmpDir("maint"))
    def sql(q: String) = LakeSql.execute(spark, log, q)
    // sketch store: 3 batches of 2 keys -> 6 rows -> compact to 2
    val vals = (0 until 600).map(i => (s"k${i % 2}", (i * 37L) % 1024, i % 3))
      .toDF("k", "v", "day")
    (0 to 2).foreach { b =>
      val batch = QDigest.sketchRowsByKey(vals.filter(col("day") === b),
        "k", "v", depth = 12, k = 60L)
      if (b == 0) LakeTable.createTable(log, "sk", batch.schema)
      LakeTable.insert(spark, log, "sk", batch, txnId = s"d$b")
    }
    val pre = QDigest.quantilesOfSketchRows(
        LakeTable.read(spark, log, "sk"), "k", Seq(500000L))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val st = sql("OPTIMIZE SKETCH STORE sk KEY k").head()
    assert(st.getAs[Long]("rows_before") == 6L &&
      st.getAs[Long]("rows_after") == 2L)
    assert(QDigest.quantilesOfSketchRows(
        LakeTable.read(spark, log, "sk"), "k", Seq(500000L))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet == pre)
    // replaying the same statement at the same store state is a no-op
    val v = log.latestVersion("sk")
    sql("OPTIMIZE SKETCH STORE sk KEY k")
    assert(log.latestVersion("sk") == v, "replay must not commit again")

    // governance mini-log retention through SQL
    val rows = (1L to 9L).map(i => (i, i * 2)).toDF("id", "v")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows)
    (1 to 4).foreach(i => Masking.setMask(spark, log, "t", "v", s"v * $i"))
    (1 to 3).foreach(i => RowFilter.setFilter(spark, log, "t", s"id > $i"))
    // RETAIN 1 would let a mutation+vacuum delete the entry a concurrent
    // reader just resolved — the SQL face refuses anything below 2
    val low = intercept[graft.lake.LakeValidationException](
      sql("VACUUM POLICIES ON t RETAIN 1 VERSIONS"))
    assert(low.getMessage.contains("at least 2"))
    val vp = sql("VACUUM POLICIES ON t RETAIN 2 VERSIONS").head()
    assert(vp.getAs[Long]("masks_deleted") == 2L &&
      vp.getAs[Long]("rowfilters_deleted") == 1L)
    // governing policy unchanged: newest mask (v*4) + filter (id>3)
    assert(RowFilter.readGoverned(spark, log, "t", "analyst")
      .agg(org.apache.spark.sql.functions.sum("v")).as[Long].head() ==
      (4L to 9L).map(_ * 2 * 4).sum)

    (1 to 3).foreach(i =>
      Views.create(spark, log, s"w$i", s"SELECT id FROM t WHERE id >= $i"))
    intercept[graft.lake.LakeValidationException](
      sql("VACUUM VIEW CATALOG RETAIN 1 VERSIONS"))
    val vv = sql("VACUUM VIEW CATALOG RETAIN 2 VERSIONS").head()
    assert(vv.getAs[Long]("deleted") == 1L)
    assert(Views.catalog(log).views.map(_.name) == Seq("w1", "w2", "w3"))
  }

  test("time-travel clauses inside string literals are not parsed") {
    import graft.lake.{LakeLog, LakeTable}
    val log = new LakeLog(tmpDir("ttlit"))
    def sql(q: String) = LakeSql.execute(spark, log, q)
    val rows = (1L to 4L).map(i => (i, i * 2)).toDF("id", "v")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows)
    // 't VERSION AS OF 9' inside a literal: a raw-regex parse would pin
    // the real table t to the nonexistent version 9 and fail the read;
    // the literal must survive verbatim and the scan read latest
    val out = sql("SELECT 'read t VERSION AS OF 9 maybe' AS note, " +
      "count(*) AS n FROM t").as[(String, Long)].head()
    assert(out == (("read t VERSION AS OF 9 maybe", 4L)))
    // TIMESTAMP and quoted-tag forms likewise ('x' is not even a table —
    // the old path refused the whole statement)
    assert(sql("SELECT 'x TIMESTAMP AS OF ''2020-01-01''' AS note, " +
      "count(*) AS n FROM t").as[(String, Long)].head()._2 == 4L)
    assert(sql("SELECT 'x VERSION AS OF ''v1''' AS note, " +
      "count(*) AS n FROM t").as[(String, Long)].head()._2 == 4L)
    // the REAL clause still routes: version 1 read
    LakeTable.insert(spark, log, "t", Seq((9L, 18L)).toDF("id", "v"))
    assert(sql("SELECT count(*) AS n FROM t VERSION AS OF 1")
      .as[Long].head() == 4L)
  }
}
