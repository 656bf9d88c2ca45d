package graft

import graft.lake.{LakeLog, LakeTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-query metrics: duration/rows plus the files-scanned-vs-pruned split
  * that makes the LakeFileIndex stat-pruning win observable per query. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("stat-pruned lake query reports exact scanned vs pruned file counts") {
    val log = new LakeLog(tmpDir("metrics"))
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("v", StringType)))
    LakeTable.createTable(log, "t", schema)
    // three commits → three files with disjoint id ranges in the log stats
    LakeTable.insert(spark, log, "t", (1L to 100L).map((_, "a")).toDF("id", "v"))
    LakeTable.insert(spark, log, "t", (101L to 200L).map((_, "b")).toDF("id", "v"))
    LakeTable.insert(spark, log, "t", (201L to 300L).map((_, "c")).toDF("id", "v"))

    val pruned = Metrics.measure("probe",
      LakeTable.readIndexed(spark, log, "t").filter(col("id") > 250))
    assert(pruned.rows == 50)
    assert(pruned.filesScanned == 1, pruned)
    assert(pruned.filesPruned == 2, pruned)
    assert(pruned.durationSec > 0.0)
    assert(pruned.bytesScanned > 0L)

    val full = Metrics.measure("full", LakeTable.readIndexed(spark, log, "t"))
    assert(full.rows == 300 && full.filesScanned == 3 && full.filesPruned == 0)
  }

  test("non-lake scans report scanned files with no snapshot to prune") {
    val dir = tmpDir("metricsplain").toString
    (1L to 1000L).toDF("id").repartition(4).write.parquet(s"$dir/t")
    val m = Metrics.measure("plain",
      spark.read.parquet(s"$dir/t").filter(col("id") <= 10))
    assert(m.rows == 10)
    assert(m.filesScanned > 0 && m.filesPruned == 0)
  }

  test("alert rules fire on the reference's SLO predicates") {
    def m(d: Double) = Metrics.QueryMetrics("q", d, 1, 1, 0, 1)
    // 20 queries, one slow: p95 (nearest-rank over 20) = 19th value
    val healthy = (1 to 19).map(_ => m(0.2)) :+ m(5.0)
    val a = Alerts.evaluate(healthy)
    assert(a.exists(x => x.rule == "query_p95_latency_seconds" && !x.firing))
    // half the batch breaches 1 s → p95 over the SLO, alert fires
    val slow = (1 to 10).map(_ => m(0.2)) ++ (1 to 10).map(_ => m(2.0))
    assert(Alerts.evaluate(slow).exists(x =>
      x.rule == "query_p95_latency_seconds" && x.firing))

    // commit-conflict ratio off the log's counters: force an OCC conflict
    import graft.lake.{CommitConflictException, LakeLog, LakeTable}
    import org.apache.spark.sql.types._
    val log = new LakeLog(tmpDir("alerts"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("id", LongType))))
    log.commit("t", 0, "a", Nil)
    intercept[CommitConflictException](log.commit("t", 0, "b", Nil))
    val rateAlert = Alerts.evaluate(healthy, Some(log))
      .find(_.rule == "commit_conflict_ratio").get
    assert(rateAlert.value == 0.5 && rateAlert.firing)
    // duplicate-txn replays are NOT attempts: ratio must not dilute
    log.commit("t", 1, "a", Nil) // replay of committed txn "a"
    assert(log.commitDuplicates.get() == 1)
    val after = Alerts.evaluate(healthy, Some(log))
      .find(_.rule == "commit_conflict_ratio").get
    assert(after.value == 0.5, after) // still conflicts=1 / attempts=2
    // strict > comparison (the reference rule's): at exactly the bound,
    // the alert stays quiet
    val quiet = Alerts.evaluate(healthy, Some(log), conflictRateSlo = 0.5)
      .find(_.rule == "commit_conflict_ratio").get
    assert(!quiet.firing)
  }

  test("live recorder: measured queries land in the rolling window") {
    Metrics.live.clear()
    val df = (1L to 10L).toDF("id")
    Metrics.measure("live-probe", df)
    val rec = Metrics.live.recent.filter(_.name == "live-probe")
    assert(rec.size == 1 && rec.head.rows == 10)
    // Alerts evaluate over the live window exactly like a harness batch
    assert(Alerts.evaluate(Metrics.live.recent)
      .exists(_.rule == "query_p95_latency_seconds"))
    Metrics.live.clear()
  }

  test("metrics serialize to the JSON shape Bench/Verify emit") {
    val m = Metrics.QueryMetrics("q", 0.5, 10, 1, 2, 1024)
    assert(m.toJson ==
      """{"name":"q","duration_sec":0.5,"rows":10,"files_scanned":1,"files_pruned":2,"bytes_scanned":1024}""")
    assert(Metrics.toJson(Seq(m)).startsWith("""{"q":{"""))
  }
}
