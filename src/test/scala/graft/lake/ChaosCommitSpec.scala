package graft.lake

import java.nio.file.{Files, StandardCopyOption}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit-path crash injection — the single-node analog of the reference's
  * leader-failure chaos suite (tests/chaos/leader_failure_test.go:21-278,
  * which kills the Raft leader mid-commit and asserts exactly-once). Our
  * write path has two crash windows:
  *
  *   stage (write parquet into _tmp/<txn>-<attempt>/)
  *     -- window A: crash here leaves an orphaned staging dir --
  *   promote (atomic rename into data/, fresh UUID names)
  *     -- window B: crash here leaves promoted-but-unreferenced data files --
  *   log commit (OCC, idempotency map)
  *
  * A crash skips every `finally`, so these tests fabricate the exact
  * post-crash filesystem state a dead writer leaves behind, then assert the
  * three invariants the chaos suite checks: (1) no partial visibility —
  * readers see only log-committed state; (2) retrying the SAME txn commits
  * exactly once; (3) vacuum reclaims every orphan byte while never touching
  * live files or fresh in-flight attempts.
  */
class ChaosCommitSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): (LakeLog, String) = {
    val log = new LakeLog(tmpDir(tag))
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    LakeTable.createTable(log, "t", df.schema)
    LakeTable.insert(spark, log, "t", df, txnId = "base")
    (log, "t")
  }

  private def listData(log: LakeLog): Set[String] = {
    val dir = log.dataDir("t")
    if (!Files.exists(dir)) Set.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.toString).toSet finally s.close()
    }
  }

  test("window A: crash between staging and promote — retry is exactly-once") {
    val (log, t) = freshTable("chaosA")
    val v1 = log.latestVersion(t)
    val before = LakeTable.read(spark, log, t).count()

    // dead writer's leftovers: a staging attempt that never promoted
    val staging = log.tmpDir(t, "txn-A")
    Files.createDirectories(staging)
    Files.write(staging.resolve("part-00000-dead.parquet"),
      Array[Byte](1, 2, 3))

    // (1) no partial visibility: staged bytes never surface to readers
    assert(log.latestVersion(t) == v1)
    assert(LakeTable.read(spark, log, t).count() == before)

    // (2) retrying the same txn commits exactly once
    val retry = (101 to 150).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    val r1 = LakeTable.insert(spark, log, t, retry, txnId = "txn-A")
    assert(!r1.duplicate && r1.version == v1 + 1)
    val r2 = LakeTable.insert(spark, log, t, retry, txnId = "txn-A")
    assert(r2.duplicate && r2.version == r1.version)
    assert(LakeTable.read(spark, log, t).count() == before + 50)

    // (3) vacuum sweeps the dead staging dir; the successful write's own
    // staging was already removed by its finally
    assert(Files.exists(staging))
    LakeTable.vacuum(log, t, retainVersions = 100, tmpRetainMs = 0L)
    assert(!Files.exists(staging))
    assert(LakeTable.read(spark, log, t).count() == before + 50)
  }

  test("window B: crash between promote and commit — orphans invisible, " +
      "vacuumed, retry exactly-once") {
    val (log, t) = freshTable("chaosB")
    val v1 = log.latestVersion(t)
    val before = LakeTable.read(spark, log, t)
      .agg(count(lit(1)), sum("v")).first()

    // dead writer's leftovers: files promoted into data/ under fresh UUID
    // names whose log commit never happened — clone a live file's bytes
    val live = listData(log).head
    val orphan = log.dataDir(t).resolve(
      "part-00000-deadbeef-dead-dead-dead-deaddeadbeef.parquet")
    Files.copy(java.nio.file.Paths.get(live), orphan,
      StandardCopyOption.REPLACE_EXISTING)

    // (1) no partial visibility: the orphan is in data/ but in no log
    // entry, so snapshot-driven reads don't see its rows
    assert(log.latestVersion(t) == v1)
    val after = LakeTable.read(spark, log, t)
      .agg(count(lit(1)), sum("v")).first()
    assert(after == before)

    // (2) same-txn retry commits exactly once and adopts NOTHING from the
    // dead attempt (fresh UUID destinations)
    val retry = (101 to 130).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    val r1 = LakeTable.insert(spark, log, t, retry, txnId = "txn-B")
    assert(!r1.duplicate && r1.version == v1 + 1)
    assert(LakeTable.insert(spark, log, t, retry, txnId = "txn-B").duplicate)

    // (3) vacuum deletes the never-referenced orphan, keeps every live file
    assert(Files.exists(orphan))
    val report = LakeTable.vacuum(log, t, retainVersions = 100,
      tmpRetainMs = 0L)
    assert(!Files.exists(orphan))
    assert(report.deleted >= 1)
    // every surviving data file is referenced by the log; reads intact
    val referenced = log.versions(t)
      .flatMap(v => log.readEntry(t, v).adds.map(_.path)).toSet
    assert(listData(log).subsetOf(referenced))
    assert(LakeTable.read(spark, log, t).count() ==
      before.getLong(0) + 30)
  }

  test("fresh in-flight attempts survive vacuum (age gate on tree mtime)") {
    val (log, t) = freshTable("chaosC")
    // a staging attempt whose top-level dir is OLD but whose nested
    // partition subdir just received a file — the in-flight shape the
    // naive top-level-mtime gate would wrongly reap
    val staging = log.tmpDir(t, "txn-C")
    val nested = staging.resolve("p=1")
    Files.createDirectories(nested)
    Files.write(nested.resolve("part-00000-hot.parquet"), Array[Byte](7))
    Files.setLastModifiedTime(staging,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    // default 24h retention: nested file is fresh → attempt kept
    LakeTable.vacuum(log, t, retainVersions = 100)
    assert(Files.exists(nested.resolve("part-00000-hot.parquet")))
    // zero retention: everything qualifies → attempt reaped
    LakeTable.vacuum(log, t, retainVersions = 100, tmpRetainMs = 0L)
    assert(!Files.exists(staging))
  }
}
