package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Keyed row-level diff between versions: classification, no-op
  * cancellation under layout-only rewrites, and the changed-files-only
  * read set.
  */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def mk(log: LakeLog): Unit = {
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType))))
    LakeTable.insert(spark, log, "t",
      (0L until 40L).map(i => (i, i * 1.0)).toDF("id", "v"), numFiles = 4)
  }

  test("classifies insert / delete / update; unchanged rows cancel") {
    val log = new LakeLog(tmpDir("diff"))
    mk(log)
    val v1 = log.latestVersion("t")
    LakeTable.deleteWhere(spark, log, "t", "id < 5")
    LakeTable.upsert(spark, log, "t",
      Seq((10L, 99.0), (100L, 1.0)).toDF("id", "v"), keyCol = "id")
    val d = LakeTable.diff(spark, log, "t", v1, keyCols = Seq("id"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(d.size == 7)
    (0L until 5L).foreach(i =>
      assert(d(i) == (("delete", Some(i * 1.0), None))))
    assert(d(10L) == (("update", Some(10.0), Some(99.0))))
    assert(d(100L) == (("insert", None, Some(1.0))))
  }

  test("a layout-only rewrite (compaction) diffs to nothing") {
    val log = new LakeLog(tmpDir("diff"))
    mk(log)
    val v1 = log.latestVersion("t")
    LakeTable.compact(spark, log, "t", force = true)
    assert(LakeTable.diff(spark, log, "t", v1, keyCols = Seq("id"))
      .count() == 0L)
  }

  test("reads only the symmetric difference of the file lists") {
    val log = new LakeLog(tmpDir("diff"))
    mk(log)
    // second insert adds one file that both snapshots share afterwards
    LakeTable.insert(spark, log, "t",
      Seq((200L, 2.0)).toDF("id", "v"))
    val v2 = log.latestVersion("t")
    LakeTable.upsert(spark, log, "t",
      Seq((200L, 3.0)).toDF("id", "v"), keyCol = "id")
    val df = LakeTable.diff(spark, log, "t", v2, keyCols = Seq("id"))
    // the 4 original files are common to both snapshots: the scan must
    // touch only the rewritten + rewriting files, not the whole table
    val m = graft.Metrics.measure("diff-read", df)
    assert(m.filesScanned <= 2,
      s"diff read ${m.filesScanned} files; expected only the changed ones")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((200L, "update")))
  }

  test("identical versions diff to nothing") {
    val log = new LakeLog(tmpDir("diff"))
    mk(log)
    val v = log.latestVersion("t")
    assert(LakeTable.diff(spark, log, "t", v, v, Seq("id")).count() == 0L)
  }

  test("diff from version 0 reports every current row as an insert") {
    // 0 is snapshot()'s latest-sentinel: an unguarded diff(0) would
    // compare latest against latest and return nothing
    val log = new LakeLog(tmpDir("diff0"))
    mk(log)
    val d = LakeTable.diff(spark, log, "t", 0L, 0L, Seq("id")).collect()
    assert(d.length == 40)
    assert(d.forall(_.getAs[String]("change_type") == "insert"))
  }

  test("upsert on a float key never duplicates a boundary key") {
    import org.apache.spark.sql.functions.col
    val log = new LakeLog(tmpDir("floatkey"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("k", FloatType, nullable = false),
      StructField("v", DoubleType))))
    // 0.3f renders as "0.3" via cast-to-string but its footer stat is the
    // exact decimal 0.30000001... — a range prune on the rendered key
    // would skip the file holding the OLD row and duplicate the key
    LakeTable.insert(spark, log, "t",
      Seq((0.3f, 1.0), (0.7f, 2.0)).toDF("k", "v"))
    LakeTable.upsert(spark, log, "t",
      Seq((0.3f, 99.0)).toDF("k", "v"), "k")
    val rows = LakeTable.read(spark, log, "t")
      .filter(col("k") === 0.3f).collect()
    assert(rows.length == 1, s"duplicate float key: ${rows.mkString(",")}")
    assert(rows.head.getDouble(1) == 99.0)
  }

  test("history flags schema changes only on create/evolve entries") {
    val log = new LakeLog(tmpDir("histflag"))
    mk(log) // create (v0) + insert (v1)
    LakeTable.deleteWhere(spark, log, "t", "id > 30") // v2
    val h = LakeTable.history(spark, log, "t")
      .select("version", "schema_change").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(h(0L), "create must flag a schema change")
    assert(!h(1L) && !h(2L), "data commits must not flag schema changes")
    // evolve flags again, and bloom columns inherit without restating
    val cur = log.snapshot("t").schema.get
    log.evolveSchema("t", TableSchema(
      cur.fields :+ Field("note", "string", nullable = true)), "ev1")
    val h2 = LakeTable.history(spark, log, "t")
      .select("version", "schema_change").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(h2(3L), "evolve must flag a schema change")
  }

  test("evolveSchema inherits bloom columns when the caller omits them") {
    val log = new LakeLog(tmpDir("bloominherit"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType))))
    val withBloom = log.snapshot("t").schema.get
      .copy(bloom_columns = Some(Seq("id")))
    log.evolveSchema("t", withBloom, "ev-bloom")
    // evolve WITHOUT restating blooms: they must survive
    val cur = log.snapshot("t").schema.get
    log.evolveSchema("t", TableSchema(
      cur.fields :+ Field("extra", "string", nullable = true)), "ev-add")
    assert(log.snapshot("t").schema.get.bloomCols == Seq("id"),
      "bloom columns silently dropped by evolution")
  }
}
