package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Shallow clone: zero-copy creation, independent evolution in both
  * directions, copy-on-write un-sharing, and the vacuum ownership guard
  * (a clone must never reclaim the SOURCE's storage).
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def mkSource(log: LakeLog): Unit = {
    LakeTable.createTable(log, "src", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType))))
    (0 until 3).foreach(i => LakeTable.insert(spark, log, "src",
      (0 until 40).map(j => ((i * 40 + j).toLong, (i * 40 + j) * 0.5))
        .toDF("id", "v")))
  }

  test("clone is zero-copy and reads the source snapshot") {
    val log = new LakeLog(tmpDir("clone"))
    mkSource(log)
    LakeTable.cloneTable(log, "src", "dst")
    val srcPaths = log.snapshot("src").files.map(_.path).toSet
    assert(log.snapshot("dst").files.map(_.path).toSet == srcPaths)
    assert(LakeTable.read(spark, log, "dst").count() == 120L)
    // stats ride along: metadata-only aggregates work on the clone
    val r = StatsAgg.fromStats(spark, log.snapshot("dst"), Seq("id"))
    assert(r.isDefined && r.get.collect().head.getAs[Long]("max_id") == 119L)
  }

  test("clone of an earlier version time-travels") {
    val log = new LakeLog(tmpDir("clone"))
    mkSource(log)
    // version 2 = after the second insert (create=1? depends; use count)
    val versions = log.versions("src")
    val afterTwo = versions(versions.length - 2)
    LakeTable.cloneTable(log, "src", "dst", version = afterTwo)
    assert(LakeTable.read(spark, log, "dst").count() == 80L)
  }

  test("independent evolution: writes to one side never move the other") {
    val log = new LakeLog(tmpDir("clone"))
    mkSource(log)
    LakeTable.cloneTable(log, "src", "dst")
    LakeTable.insert(spark, log, "dst",
      Seq((1000L, 1.0)).toDF("id", "v"))
    LakeTable.deleteWhere(spark, log, "src", "id < 40")
    assert(LakeTable.read(spark, log, "src").count() == 80L)
    assert(LakeTable.read(spark, log, "dst").count() == 121L)
  }

  test("compaction un-shares; vacuum(clone) never touches source files") {
    val log = new LakeLog(tmpDir("clone"))
    mkSource(log)
    LakeTable.cloneTable(log, "src", "dst")
    val shared = log.snapshot("src").files.map(_.path).toSet
    LakeTable.compact(spark, log, "dst", force = true)
    val dstNow = log.snapshot("dst").files.map(_.path).toSet
    assert(dstNow.intersect(shared).isEmpty, "compaction should un-share")
    // the shared files left the clone's snapshots, but they belong to the
    // source: vacuum on the clone must NOT delete them
    LakeTable.vacuum(log, "dst", retainVersions = 1, tmpRetainMs = 0L)
    assert(shared.forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "vacuum(clone) deleted source-owned files")
    assert(LakeTable.read(spark, log, "src").count() == 120L)
    // while the clone's own rewritten files vacuum normally
    LakeTable.compact(spark, log, "dst", force = true) // may no-op
    assert(LakeTable.read(spark, log, "dst").count() == 120L)
  }

  test("vacuum(source) past the clone breaks it — the documented caveat") {
    val log = new LakeLog(tmpDir("clone"))
    mkSource(log)
    LakeTable.cloneTable(log, "src", "dst")
    // rewrite everything in the source, then drop its history
    LakeTable.deleteWhere(spark, log, "src", "id >= 0")
    LakeTable.vacuum(log, "src", retainVersions = 1, tmpRetainMs = 0L)
    val ex = intercept[Exception] {
      LakeTable.read(spark, log, "dst").count()
    }
    assert(ex != null)
  }
}
