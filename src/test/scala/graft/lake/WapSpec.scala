package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class WapSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("wap"))
    LakeTable.createTable(log, "t", schema)
    LakeTable.insert(spark, log, "t",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))           // v1
    log
  }

  test("staged batches are invisible to main readers until publish") {
    val log = setup()
    Wap.stage(spark, log, "t", Seq((3L, "c"), (4L, "d")).toDF("id", "v"),
      wapId = "batch-7")
    // main line: unchanged, at the same version
    assert(LakeTable.read(spark, log, "t").count() == 2)
    assert(log.latestVersion("t") == 1L)
    // audit view: base + staged
    val audit = Wap.readStaged(spark, log, "t", "batch-7")
    assert(audit.count() == 4)
    assert(audit.filter(col("id") >= 3L).count() == 2)
    // publish adopts the files atomically
    val r = Wap.publish(spark, log, "t", "batch-7")
    assert(r.version == 2L && !r.duplicate)
    assert(LakeTable.read(spark, log, "t").count() == 4)
    assert(Wap.listStaged(log, "t").isEmpty)
  }

  test("publish is idempotent; stage ids are single-use") {
    val log = setup()
    Wap.stage(spark, log, "t", Seq((3L, "c")).toDF("id", "v"), "b1")
    val first = Wap.publish(spark, log, "t", "b1")
    // a replayed publish (crash between commit and record cleanup,
    // client retry) returns the ORIGINAL version and writes nothing
    val again = Wap.publish(spark, log, "t", "b1")
    assert(again.version == first.version && again.duplicate)
    assert(LakeTable.read(spark, log, "t").count() == 3)
    // restaging a published id is refused — its txn is spent
    intercept[LakeValidationException] {
      Wap.stage(spark, log, "t", Seq((9L, "x")).toDF("id", "v"), "b1")
    }
    // staging an id twice is refused while staged
    Wap.stage(spark, log, "t", Seq((5L, "e")).toDF("id", "v"), "b2")
    intercept[LakeValidationException] {
      Wap.stage(spark, log, "t", Seq((6L, "f")).toDF("id", "v"), "b2")
    }
  }

  test("abort deletes staged files; published ids refuse abort") {
    val log = setup()
    val b = Wap.stage(spark, log, "t",
      Seq((3L, "c")).toDF("id", "v"), "bad-batch")
    assert(b.adds.forall(a =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(a.path))))
    Wap.abort(log, "t", "bad-batch")
    assert(b.adds.forall(a =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(a.path))))
    assert(Wap.staged(log, "t", "bad-batch").isEmpty)
    Wap.abort(log, "t", "bad-batch") // idempotent no-op
    // a published id's files are table data — abort must refuse
    Wap.stage(spark, log, "t", Seq((4L, "d")).toDF("id", "v"), "good")
    Wap.publish(spark, log, "t", "good")
    intercept[LakeValidationException] { Wap.abort(log, "t", "good") }
    assert(LakeTable.read(spark, log, "t").count() == 3)
  }

  test("publish composes with interleaved main-line commits (OCC rebase)") {
    val log = setup()
    Wap.stage(spark, log, "t", Seq((3L, "c")).toDF("id", "v"), "b1")
    // a concurrent writer lands AFTER the stage, BEFORE the publish
    LakeTable.insert(spark, log, "t", Seq((10L, "z")).toDF("id", "v"))
    val r = Wap.publish(spark, log, "t", "b1")
    assert(r.version == 3L)
    val rows = LakeTable.read(spark, log, "t").select("id")
      .as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L, 10L))
  }

  test("audits gate publication: a failing gate aborts, main unharmed") {
    val log = setup()
    // batch with a planted duplicate of id 1 — the audit's dedup gate
    Wap.stage(spark, log, "t",
      Seq((1L, "a"), (5L, "e")).toDF("id", "v"), "crawl-9")
    val audit = Wap.readStaged(spark, log, "t", "crawl-9")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(audit == 1L) // gate fails
    Wap.abort(log, "t", "crawl-9")
    assert(LakeTable.read(spark, log, "t").count() == 2)
    assert(log.latestVersion("t") == 1L) // no version ever minted
  }
}
