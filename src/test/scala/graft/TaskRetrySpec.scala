package graft

import org.apache.spark.{SparkException, TaskContext}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Task-retry under injected failure — the Spark-native stand-in for the
  * reference's chaos suite (worker_failure_test.go: kill a worker
  * mid-query, assert the query still completes with the right answer, and
  * that a worker that stays dead fails the query).
  *
  * Spark's `spark.task.maxFailures` is the subsumed mechanism (SURVEY §4:
  * do-not-rebuild). Local mode pins maxFailures=1, so this suite runs its
  * own `local[4, 2]` session (2 attempts per task) instead of the shared
  * SparkSpec one; failure is injected per-attempt via TaskContext, exactly
  * the attempt-isolation surface the reference tests.
  */
class TaskRetrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the shared SparkSpec session (if any suite ran before us) pins
    // maxFailures=1; replace it for this suite, restore-by-recreation after
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4, 2]") // second master arg = task attempts
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    super.afterAll()
  }

  test("a task failing on its first attempt retries and the answer is exact") {
    val s2 = spark; import s2.implicits._
    val flaky = spark.range(0, 1000, 1, 8).as[Long].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() == 3 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected first-attempt failure")
      it
    }
    // retried partition contributes exactly once: sum(0..999) = 499500
    assert(flaky.reduce(_ + _) == 499500L)
  }

  test("retried write commits exactly-once output (no partial-attempt files)") {
    val s2 = spark; import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("retrywrite").toString
    spark.range(0, 400, 1, 8).as[Long].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() % 4 == 1 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected write-side failure")
      it
    }.toDF("id").write.mode("overwrite").parquet(s"$dir/out")
    // the task commit protocol (the reference's SUCCESS-manifest analogue)
    // publishes only committed attempts: no lost and no duplicated rows
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 400)
    assert(back.distinct().count() == 400)
  }

  test("a task failing on every attempt fails the job (attempts exhausted)") {
    val s2 = spark; import s2.implicits._
    val doomed = spark.range(0, 100, 1, 4).as[Long].mapPartitions { it =>
      if (TaskContext.get().partitionId() == 2)
        throw new RuntimeException("injected permanent failure")
      it
    }
    val e = intercept[SparkException](doomed.reduce(_ + _))
    assert(e.getMessage.contains("injected permanent failure"))
  }
}
