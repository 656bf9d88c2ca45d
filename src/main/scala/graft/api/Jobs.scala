package graft.api

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.LakeLog

/** Async query-job lifecycle: the reference's submit → poll → fetch-results
  * model (`pkg/coordinator/rest_api.go:340-410`: POST /queries returns a
  * job_id; GET /queries/{jobId} returns the status object; GET
  * /queries/{jobId}/results returns a result LOCATION once status is
  * COMPLETED — results are a path, never streamed inline). Status values and
  * transitions follow `distributed_query_executor.go:42-49`:
  * PENDING → RUNNING → COMPLETED | FAILED.
  *
  * The HTTP transport is out of scope (the driver is the control plane, per
  * SURVEY §7.8); this is the state machine itself, exposed as driver-side
  * functions. Execution is genuinely asynchronous — jobs run on a daemon
  * pool, each under its own Spark job group (jobId), so a slow scan can be
  * cancelled without touching other jobs, and COMPLETED results are parquet
  * at `resultRoot/jobId` (the analogue of the reference's
  * `s3://lake/results/{jobId}/`).
  */
object Jobs {

  val Pending = "PENDING"
  val Running = "RUNNING"
  val Completed = "COMPLETED"
  val Failed = "FAILED"

  /** The GET /queries/{jobId} response shape: status + result location
    * (populated only once COMPLETED) + error (only once FAILED). */
  final case class JobStatus(jobId: String, status: String,
                             resultPath: Option[String] = None,
                             error: Option[String] = None)

  final class JobManager(spark: SparkSession, resultRoot: String) {
    private val jobs = new ConcurrentHashMap[String, JobStatus]()
    private val cancelled = ConcurrentHashMap.newKeySet[String]()
    private val jobMetrics =
      new ConcurrentHashMap[String, graft.Metrics.QueryMetrics]()
    // every materialization on this session (jobs, QueryApi/SqlApi results,
    // ad-hoc actions) feeds the live metrics series from here on
    graft.Metrics.enableLive(spark)
    private val pool = Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-job")
      t.setDaemon(true)
      t
    })

    /** POST /queries: register the job PENDING, return its id immediately,
      * run plan+execute+write asynchronously. `query` is by-name so even
      * planning happens on the job thread (a planning error FAILs the job,
      * it doesn't throw at submit time — matching the async contract).
      */
    def submit(query: => DataFrame): String = {
      val jobId = s"job-${UUID.randomUUID()}"
      jobs.put(jobId, JobStatus(jobId, Pending))
      pool.execute { () =>
        jobs.put(jobId, JobStatus(jobId, Running))
        try {
          // job group = jobId: cancel(jobId) reaches every Spark job this
          // query spawns, and the Spark UI groups its stages under the id
          spark.sparkContext.setJobGroup(jobId, s"graft job $jobId",
            interruptOnCancel = true)
          // a cancel that landed while the job was still PENDING found no
          // active Spark jobs to kill — honor it here instead of running
          if (cancelled.contains(jobId))
            throw new InterruptedException("cancelled before execution")
          val path = s"$resultRoot/$jobId"
          // metered execution (the reference's per-query duration series is
          // continuous, not harness-only): the measure pass computes the
          // result against the persisted plan — duration, rows and exact
          // files-pruned off the real scans — and the parquet write then
          // reads the cache, so the query itself still runs once
          val df = query.persist()
          try {
            jobMetrics.put(jobId, graft.Metrics.measure(jobId, df))
            df.write.mode("overwrite").parquet(path)
          } finally df.unpersist()
          jobs.put(jobId, JobStatus(jobId, Completed, resultPath = Some(path)))
        } catch {
          case e: Throwable =>
            jobs.put(jobId,
              JobStatus(jobId, Failed, error = Some(String.valueOf(e.getMessage))))
        } finally spark.sparkContext.clearJobGroup()
      }
      jobId
    }

    /** Submit the structured JSON query API (QueryApi) against flat tables. */
    def submitJson(dir: String, json: String): String =
      submit(QueryApi.run(spark, dir, json))

    /** Submit a snapshot-isolated lake query (version pinned at plan time). */
    def submitLakeJson(log: LakeLog, json: String): String =
      submit(QueryApi.runLake(spark, log, json))

    /** GET /queries/{jobId}. Unknown ids are an error, not an empty status. */
    def status(jobId: String): JobStatus = {
      val s = jobs.get(jobId)
      if (s == null) throw new NoSuchElementException(s"unknown job: $jobId")
      s
    }

    /** GET /queries/{jobId}/results: refuse until COMPLETED (the reference
      * 400s with the current status), then read back from the result path. */
    def result(jobId: String): DataFrame = {
      val s = status(jobId)
      if (s.status != Completed)
        throw new IllegalStateException(
          s"Query not completed, current status: ${s.status}")
      spark.read.parquet(s.resultPath.get)
    }

    /** Cancel a job: PENDING jobs fail before executing anything (the
      * cancelled-set check on the worker thread), RUNNING jobs have their
      * current AND future Spark jobs in the group killed — so a cancel in
      * the window between RUNNING and the first stage submission still
      * takes effect. No-op if already finished. */
    def cancel(jobId: String): Unit = {
      status(jobId) // unknown-id check
      cancelled.add(jobId)
      spark.sparkContext.cancelJobGroupAndFutureJobs(jobId)
    }

    /** Poll until the job leaves PENDING/RUNNING or the timeout elapses. */
    def await(jobId: String, timeoutMs: Long = 120000): JobStatus = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var s = status(jobId)
      while ((s.status == Pending || s.status == Running) &&
             System.nanoTime() < deadline) {
        Thread.sleep(20)
        s = status(jobId)
      }
      s
    }

    /** All known jobs (the reference's activeExecutions map). */
    def list(): Seq[JobStatus] = {
      import scala.jdk.CollectionConverters._
      jobs.values().asScala.toSeq.sortBy(_.jobId)
    }

    /** Execution metrics for a completed job (duration, rows, files
      * scanned/pruned, bytes) — the per-query observability the reference
      * serves from its Prometheus registry, keyed by job id here. Absent
      * until the job's execution finished its metered pass. */
    def metrics(jobId: String): Option[graft.Metrics.QueryMetrics] = {
      status(jobId) // unknown-id check
      Option(jobMetrics.get(jobId))
    }
  }
}
