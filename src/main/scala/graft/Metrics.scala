package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

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
    * re-plans hide the real scans behind query stages) and cache nodes (a
    * persisted DataFrame's first materialization runs the real scans inside
    * the InMemoryRelation's cached plan, outside the visible tree). */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      scans(c.relation.cachedPlan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  /** Scan-derived fields off an already-EXECUTED plan: files scanned vs the
    * lake snapshot's total (→ pruned), bytes read. */
  private def scanStats(plan: SparkPlan): (Long, Long, Long) = {
    var filesScanned = 0L
    var filesTotal = 0L
    var bytesScanned = 0L
    scans(plan).foreach { s =>
      val n = s.metrics.get("numFiles").map(_.value).getOrElse(0L)
      filesScanned += n
      bytesScanned += s.metrics.get("filesSize").map(_.value).getOrElse(0L)
      filesTotal += (s.relation.location match {
        case idx: LakeFileIndex => idx.totalFileCount.toLong
        case _ => n // non-lake scans: no snapshot notion of "total"
      })
    }
    (filesScanned, math.max(0L, filesTotal - filesScanned), bytesScanned)
  }

  /** Execute `df` distributed (no driver materialization: the physical
    * plan's RDD is counted in place) and read the scan metrics off the
    * executed plan. `numFiles`/`filesSize` are driver-side metrics set at
    * file-listing time, so they reflect exactly what pruning left behind;
    * for lake scans the [[LakeFileIndex]] knows the snapshot total, making
    * the pruned count exact. The result is also recorded into [[live]], so
    * harness passes and API traffic land in the same rolling series.
    */
  def measure(name: String, df: DataFrame): QueryMetrics = {
    val qe = df.queryExecution
    val t0 = System.nanoTime()
    val rows = qe.toRdd.count()
    val durationSec = (System.nanoTime() - t0) / 1e9
    val (filesScanned, filesPruned, bytesScanned) = scanStats(qe.executedPlan)
    val m = QueryMetrics(name, durationSec, rows, filesScanned, filesPruned,
      bytesScanned)
    live.record(m)
    m
  }

  def toJson(ms: Seq[QueryMetrics]): String =
    ms.map(m => s""""${m.name}":${m.toJson}""").mkString("{", ",", "}")

  /** Bounded rolling window of recent query metrics — the in-process
    * analogue of the reference's continuously scraped
    * `lakehouse_query_duration_seconds` series (`pkg/observability/
    * metrics.go`): every measured execution lands here as it happens, and
    * [[Alerts.evaluate]] can run over `recent` at any moment, not only at
    * the end of a harness pass.
    */
  final class Recorder(capacity: Int = 1024) {
    private val buf = new java.util.ArrayDeque[QueryMetrics]()
    def record(m: QueryMetrics): Unit = synchronized {
      buf.addLast(m)
      while (buf.size > capacity) buf.removeFirst()
    }
    def recent: Seq[QueryMetrics] = synchronized {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toList
    }
    def clear(): Unit = synchronized(buf.clear())
  }

  /** The session-wide live series. */
  val live: Recorder = new Recorder()

  private val listenerInstalled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Install a [[QueryExecutionListener]] that records EVERY materialized
    * query on the session — actions and writes, whoever triggered them —
    * into [[live]]. This is what makes the API surface (QueryApi / SqlApi /
    * Jobs) emit metrics continuously without each call site opting in:
    * their returned DataFrames are lazy, and the listener catches the
    * moment a caller executes them. Idempotent per session; listener
    * errors can never fail a query (Spark invokes them off the hot path).
    */
  def enableLive(spark: SparkSession): Unit =
    if (listenerInstalled.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          val rows = qe.executedPlan.metrics.get("numOutputRows")
            .map(_.value).getOrElse(-1L)
          val (fs, fp, bs) = scanStats(qe.executedPlan)
          live.record(QueryMetrics(funcName, durationNs / 1e9, rows,
            fs, fp, bs))
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }
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

  /** The commit rule is an ADAPTATION, not a transcription: the reference's
    * HighCommitFailureRate is `rate(lakehouse_commit_failures_total[5m]) >
    * 0.05` failures/second over a scrape window; with no scrape loop here,
    * the evaluated quantity is the lifetime conflicts/attempts RATIO
    * against the same 0.05 bound (duplicate-txn replays excluded from
    * attempts — [[graft.lake.LakeLog.commitDuplicates]]). The comparison is
    * strict `>`, matching the reference rule; the ratio is named
    * `commit_conflict_ratio` so the adapted units are visible in the alert
    * itself.
    */
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
      val ratio = if (attempts == 0) 0.0 else conflicts.toDouble / attempts
      Alert("commit_conflict_ratio", ratio, conflictRateSlo,
        firing = ratio > conflictRateSlo)
    }
    Seq(latency) ++ commit
  }
}
