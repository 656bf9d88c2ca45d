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
}
