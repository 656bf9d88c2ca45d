package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.lake.LakeFileIndex

/** Per-query execution metrics — the observability surface the reference
  * exports as Prometheus series and alerts on (`monitoring/
  * lakehouse_alerts.yml:42-49`: `lakehouse_query_duration_seconds` p95 < 1 s
  * is its only latency SLO). Spark already meters every scan; this walks the
  * executed plan and reports:
  *
  *  - duration_sec / rows: the SLO series;
  *  - files_scanned vs files_pruned: the LakeFileIndex stat/partition/z-order
  *    skipping win, measurable per query rather than only in specs
  *    (files_pruned counts lake-snapshot files the scan never opened);
  *  - bytes_scanned: size of the files actually read.
  *
  * Emitted as JSON by both Bench (sidecar `bench_metrics.json`) and Verify
  * (`<outDir>/metrics.json`).
  */
object Metrics {

  final case class QueryMetrics(name: String, durationSec: Double, rows: Long,
                                filesScanned: Long, filesPruned: Long,
                                bytesScanned: Long) {
    def toJson: String =
      s"""{"name":"$name","duration_sec":$durationSec,"rows":$rows,""" +
        s""""files_scanned":$filesScanned,"files_pruned":$filesPruned,""" +
        s""""bytes_scanned":$bytesScanned}"""
  }

  /** All file scans, recursing through AQE wrappers (AdaptiveSparkPlanExec
    * re-plans hide the real scans behind query stages). */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  /** Execute `df` distributed (no driver materialization: the physical
    * plan's RDD is counted in place) and read the scan metrics off the
    * executed plan. `numFiles`/`filesSize` are driver-side metrics set at
    * file-listing time, so they reflect exactly what pruning left behind;
    * for lake scans the [[LakeFileIndex]] knows the snapshot total, making
    * the pruned count exact.
    */
  def measure(name: String, df: DataFrame): QueryMetrics = {
    val qe = df.queryExecution
    val t0 = System.nanoTime()
    val rows = qe.toRdd.count()
    val durationSec = (System.nanoTime() - t0) / 1e9
    var filesScanned = 0L
    var filesTotal = 0L
    var bytesScanned = 0L
    scans(qe.executedPlan).foreach { s =>
      val n = s.metrics.get("numFiles").map(_.value).getOrElse(0L)
      filesScanned += n
      bytesScanned += s.metrics.get("filesSize").map(_.value).getOrElse(0L)
      filesTotal += (s.relation.location match {
        case idx: LakeFileIndex => idx.totalFileCount.toLong
        case _ => n // non-lake scans: no snapshot notion of "total"
      })
    }
    QueryMetrics(name, durationSec, rows, filesScanned,
      math.max(0L, filesTotal - filesScanned), bytesScanned)
  }

  def toJson(ms: Seq[QueryMetrics]): String =
    ms.map(m => s""""${m.name}":${m.toJson}""").mkString("{", ",", "}")
}

/** The reference's alert rules (`monitoring/lakehouse_alerts.yml:42-49`)
  * evaluated driver-side over a metrics batch + the lake log's commit
  * counters — its whole SLO surface: p95 query latency < 1 s, and the
  * commit-conflict rate staying under a bound. The reference expresses
  * these as Prometheus rules over exported series; here the same
  * predicates run over [[Metrics.QueryMetrics]] directly, so Bench/Verify
  * output can be gated without a metrics stack.
  */
object Alerts {

  final case class Alert(rule: String, value: Double, threshold: Double,
                         firing: Boolean) {
    def toJson: String =
      s"""{"rule":"$rule","value":$value,"threshold":$threshold,""" +
        s""""firing":$firing}"""
  }

  /** p95 by the nearest-rank method over the batch's durations. */
  def p95(durations: Seq[Double]): Double =
    if (durations.isEmpty) 0.0
    else {
      val sorted = durations.sorted
      sorted(math.ceil(0.95 * sorted.size).toInt - 1)
    }

  def evaluate(ms: Seq[Metrics.QueryMetrics],
               log: Option[graft.lake.LakeLog] = None,
               p95LatencySloSec: Double = 1.0,
               conflictRateSlo: Double = 0.05): Seq[Alert] = {
    val lat = p95(ms.map(_.durationSec))
    val latency = Alert("query_p95_latency_seconds", lat, p95LatencySloSec,
      firing = lat >= p95LatencySloSec)
    val commit = log.map { l =>
      val attempts = l.commitAttempts.get()
      val conflicts = l.commitConflicts.get()
      val rate = if (attempts == 0) 0.0 else conflicts.toDouble / attempts
      Alert("commit_conflict_rate", rate, conflictRateSlo,
        firing = rate >= conflictRateSlo)
    }
    Seq(latency) ++ commit
  }
}
