package graft.api

import java.util.concurrent.CountDownLatch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Async job lifecycle: submit → PENDING/RUNNING → COMPLETED + result path,
  * FAILED + error, unknown-id and premature-result guards. */
class JobsSpec extends SparkSpec {
  import spark.implicits._
  import Jobs._

  private def manager() = new JobManager(spark, tmpDir("jobres").toString)

  test("submit returns immediately; poll reaches COMPLETED with a result path") {
    val m = manager()
    val jobId = m.submit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").filter(col("id") > 1))
    assert(jobId.startsWith("job-"))
    val done = m.await(jobId)
    assert(done.status == Completed)
    assert(done.resultPath.exists(_.endsWith(jobId)))
    assert(done.error.isEmpty)
    val rows = m.result(jobId).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 2L)
  }

  test("a completed job's execution metrics are queryable by job id") {
    import graft.lake.{LakeLog, LakeTable}
    import org.apache.spark.sql.types._
    val log = new LakeLog(tmpDir("jobmetrics"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("id", LongType, false))))
    // three stat-disjoint files so the job's filter measurably prunes
    LakeTable.insert(spark, log, "t", (1L to 100L).toDF("id"))
    LakeTable.insert(spark, log, "t", (101L to 200L).toDF("id"))
    LakeTable.insert(spark, log, "t", (201L to 300L).toDF("id"))
    val m = manager()
    val jobId = m.submit(
      LakeTable.readIndexed(spark, log, "t").filter(col("id") > 250))
    assert(m.await(jobId).status == Completed)
    val qm = m.metrics(jobId).get
    assert(qm.name == jobId)
    assert(qm.durationSec > 0.0)
    assert(qm.rows == 50)
    assert(qm.filesScanned == 1 && qm.filesPruned == 2, qm)
    // the job also landed in the session-wide live series
    assert(graft.Metrics.live.recent.exists(_.name == jobId))
    // and the result on disk matches what the metered pass computed
    assert(m.result(jobId).count() == 50)
    intercept[NoSuchElementException](m.metrics("job-unknown"))
  }

  test("status is RUNNING while the job executes; results refuse until done") {
    val m = manager()
    val gate = new CountDownLatch(1)
    val started = new CountDownLatch(1)
    val jobId = m.submit {
      started.countDown()
      gate.await() // hold the job open so RUNNING is observable
      Seq(1L).toDF("id")
    }
    started.await()
    assert(m.status(jobId).status == Running)
    val premature = intercept[IllegalStateException](m.result(jobId))
    assert(premature.getMessage.contains("RUNNING"))
    gate.countDown()
    assert(m.await(jobId).status == Completed)
  }

  test("a failing query transitions to FAILED with the error captured") {
    val m = manager()
    // analysis error (missing column) surfaces on the job thread, not at
    // submit time — the async contract
    val jobId = m.submit(Seq(1L).toDF("id").select(col("nope")))
    val done = m.await(jobId)
    assert(done.status == Failed)
    assert(done.error.exists(_.toLowerCase.contains("nope")))
    assert(done.resultPath.isEmpty)
    intercept[IllegalStateException](m.result(jobId))
  }

  test("unknown job ids are an error; list sees every submitted job") {
    val m = manager()
    intercept[NoSuchElementException](m.status("job-nope"))
    intercept[NoSuchElementException](m.cancel("job-nope"))
    val a = m.submit(Seq(1L).toDF("id"))
    val b = m.submit(Seq(2L).toDF("id"))
    m.await(a); m.await(b)
    assert(m.list().map(_.jobId).toSet == Set(a, b))
  }

  test("the JSON query API runs through the job model end to end") {
    val dir = tmpDir("jobsjson").toString
    Seq((1L, "east", 50.0), (2L, "west", 150.0), (3L, "west", 300.0))
      .toDF("id", "region", "price").write.parquet(s"$dir/sales.parquet")
    val m = manager()
    val jobId = m.submitJson(dir, """
      {"table_name": "sales", "filter": "price > 100",
       "group_by": ["region"],
       "aggregates": [{"function": "sum", "column": "price", "alias": "rev"}]}""")
    assert(m.await(jobId).status == Completed)
    val rows = m.result(jobId).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "west" && rows.head.getDouble(1) == 450.0)
  }
}
