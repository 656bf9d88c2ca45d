package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.LakeSql

/** UPDATE ... SET ... WHERE (copy-on-write) and timestamp time travel:
  * semantics, pruning, idempotency, constraint enforcement, SQL faces.
  */
class UpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String = "t"): (LakeLog, String) = {
    val log = new LakeLog(tmpDir("upd"))
    val df = (1 to 100).map(i =>
      (i.toLong, i.toDouble, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "price", "cat")
    LakeTable.createTable(log, name, df.schema)
    LakeTable.insert(spark, log, name, df, numFiles = 4,
      zOrderBy = Seq("id"))
    (log, name)
  }

  test("update applies SET to matching rows only; others byte-identical") {
    val (log, t) = freshTable()
    val r = LakeTable.updateWhere(spark, log, t, "id > 90",
      Seq("price" -> "price * 2", "cat" -> "'boosted'"))
    assert(r.rowsUpdated == 10L)
    val after = LakeTable.read(spark, log, t).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getString(2)))).toMap
    (1 to 90).foreach(i => assert(after(i.toLong) ==
      ((i.toDouble, if (i % 2 == 0) "even" else "odd"))))
    (91 to 100).foreach(i =>
      assert(after(i.toLong) == ((i * 2.0, "boosted"))))
    // row count conserved; update is one new version; pre-update state
    // time travels
    assert(after.size == 100)
    val before = LakeTable.read(spark, log, t, version = r.version - 1)
    assert(before.filter(col("cat") === "boosted").count() == 0)
  }

  test("stat pruning leaves out-of-range files untouched") {
    val (log, t) = freshTable()
    val r = LakeTable.updateWhere(spark, log, t, "id > 95",
      Seq("price" -> "0.0"))
    assert(r.rowsUpdated == 5L)
    assert(r.filesUntouched > 0,
      "id-sorted files + id predicate must prune")
    assert(r.filesRewritten < 4)
  }

  test("SET may reference other columns of the row") {
    val (log, t) = freshTable()
    LakeTable.updateWhere(spark, log, t, "id <= 3",
      Seq("price" -> "price + id"))
    val got = LakeTable.read(spark, log, t).filter(col("id") <= 3)
      .select("id", "price").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got == Map(1L -> 2.0, 2L -> 4.0, 3L -> 6.0))
  }

  test("duplicate txn id replays as a no-op at the same version") {
    val (log, t) = freshTable()
    val r1 = LakeTable.updateWhere(spark, log, t, "id = 1",
      Seq("price" -> "99.0"), txnId = "tx-upd")
    val r2 = LakeTable.updateWhere(spark, log, t, "id = 1",
      Seq("price" -> "12345.0"), txnId = "tx-upd")
    assert(r2.version == r1.version && r2.rowsUpdated == 0)
    assert(LakeTable.read(spark, log, t).filter(col("id") === 1)
      .head.getDouble(1) == 99.0)
  }

  test("rejects unknown columns, partition columns, and CHECK violations") {
    val (log, t) = freshTable()
    intercept[LakeValidationException] {
      LakeTable.updateWhere(spark, log, t, "id = 1", Seq("nope" -> "1"))
    }
    // partitioned table: partition column not updatable
    val log2 = new LakeLog(tmpDir("updp"))
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "part", "v")
    LakeTable.createTable(log2, "p", df.schema,
      partitionBy = Seq("part"))
    LakeTable.insert(spark, log2, "p", df)
    intercept[LakeValidationException] {
      LakeTable.updateWhere(spark, log2, "p", "id = 1",
        Seq("part" -> "'c'"))
    }
    // CHECK constraint: an update driving a row out of bounds aborts
    // atomically — table state unchanged
    val log3 = new LakeLog(tmpDir("updc"))
    val cdf = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
    LakeTable.createTable(log3, "c", cdf.schema,
      constraints = Map("price_pos" -> "price > 0"))
    LakeTable.insert(spark, log3, "c", cdf)
    val v = log3.latestVersion("c")
    intercept[LakeValidationException] {
      LakeTable.updateWhere(spark, log3, "c", "id = 1",
        Seq("price" -> "-5.0"))
    }
    assert(log3.latestVersion("c") == v)
    assert(LakeTable.read(spark, log3, "c").filter(col("id") === 1)
      .head.getDouble(1) == 10.0)
  }

  test("NULL predicate leaves rows untouched (SQL UPDATE semantics)") {
    val log = new LakeLog(tmpDir("updn"))
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0)))
      .toDF("id", "price")
    LakeTable.createTable(log, "n", df.schema)
    LakeTable.insert(spark, log, "n", df)
    val r = LakeTable.updateWhere(spark, log, "n", "price < 10",
      Seq("price" -> "0.0"))
    assert(r.rowsUpdated == 1L)
    val got = LakeTable.read(spark, log, "n").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(0.0), 2L -> None, 3L -> Some(50.0)))
  }

  test("UPDATE SQL face parses nested-comma SET lists") {
    val (log, t) = freshTable()
    val st = LakeSql.execute(spark, log,
      s"UPDATE $t SET price = round(price * 1.1, 2), cat = 'adj' " +
        "WHERE id <= 2").head
    assert(st.getAs[Long]("rows_updated") == 2L)
    val got = LakeTable.read(spark, log, t).filter(col("id") <= 2)
      .select("price", "cat").collect()
      .map(x => (x.getDouble(0), x.getString(1))).toSet
    assert(got == Set((1.1, "adj"), (2.2, "adj")))
  }

  test("splitAssignments: top-level commas only, '=' inside exprs kept") {
    assert(LakeSql.splitAssignments(
      "a = f(x, y), b = case when c = 2 then g(1,2) else 3 end") ==
      Seq("a" -> "f(x, y)",
        "b" -> "case when c = 2 then g(1,2) else 3 end"))
  }

  test("timestamp resolution: between commits, exact instants, pre-history") {
    val log = new LakeLog(tmpDir("ts"))
    val df = Seq((1L, 1.0)).toDF("id", "v")
    LakeTable.createTable(log, "tt", df.schema)
    LakeTable.insert(spark, log, "tt", df, txnId = "a")
    Thread.sleep(5)
    LakeTable.insert(spark, log, "tt", df, txnId = "b")
    val t1 = log.readEntry("tt", 1).timestamp_ms
    val t2 = log.readEntry("tt", 2).timestamp_ms
    assert(log.versionAtTimestamp("tt", t1) == 1L)
    assert(log.versionAtTimestamp("tt", t2) == 2L)
    assert(log.versionAtTimestamp("tt", t2 - 1) == 1L)
    assert(log.versionAtTimestamp("tt", t2 + 3600000) == 2L)
    intercept[LakeValidationException] {
      log.versionAtTimestamp("tt", log.readEntry("tt", 0).timestamp_ms - 1)
    }
    // SQL faces: SELECT ... TIMESTAMP AS OF and RESTORE ... TIMESTAMP
    val tsLit = new java.sql.Timestamp(t1).toString
    val n1 = LakeSql.execute(spark, log,
      s"SELECT count(*) AS n FROM tt TIMESTAMP AS OF '$tsLit'")
      .head.getLong(0)
    assert(n1 == 1L)
    LakeSql.execute(spark, log,
      s"RESTORE TABLE tt TO TIMESTAMP AS OF '$tsLit'")
    assert(LakeTable.read(spark, log, "tt").count() == 1L)
    // epoch-millis form resolves identically
    assert(LakeSql.execute(spark, log,
      s"SELECT count(*) AS n FROM tt TIMESTAMP AS OF '$t2'")
      .head.getLong(0) == 2L)
    // non-table word before the clause fails loudly
    intercept[LakeValidationException] {
      LakeSql.execute(spark, log,
        s"SELECT count(*) AS n FROM tt x TIMESTAMP AS OF '$tsLit'")
    }
  }

  test("update over a fully-DV-deleted candidate file is a clean no-op") {
    // All live rows of a stat-pruned candidate file may already be gone
    // via deletion vectors; the rewrite then stages a schema-only parquet
    // file, and promoting it would fail commit validation. updateWhere
    // must drop empty adds like its sibling rewrite paths do.
    val (log, t) = freshTable()
    // MOR-delete every row of the file(s) holding id > 75
    val d = LakeTable.deleteWhereMor(spark, log, t, "id > 75")
    assert(d.rowsDeleted == 25L)
    val r = LakeTable.updateWhere(spark, log, t, "id > 80",
      Seq("price" -> "0.0"))
    assert(r.rowsUpdated == 0L)
    assert(LakeTable.read(spark, log, t).count() == 75L)
    assert(LakeTable.read(spark, log, t)
      .filter(col("price") === 0.0).count() == 0L)
  }
}
