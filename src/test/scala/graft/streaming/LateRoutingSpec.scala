package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.lake.{LakeLog, LakeTable}
import org.apache.spark.sql.types._

class LateRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  private val evSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_id", LongType)))
  private val wmSchema = StructType(Seq(
    StructField("batch_id", LongType), StructField("max_ts", TimestampType)))

  private def setup(tag: String): (LakeLog, java.nio.file.Path) = {
    val tmp = tmpDir(tag)
    val log = new LakeLog(tmp.resolve("lake"))
    LakeTable.createTable(log, "src", evSchema)
    LakeTable.createTable(log, "ontime", evSchema)
    LakeTable.createTable(log, "late", evSchema)
    LakeTable.createTable(log, "wm", wmSchema)
    (log, tmp)
  }

  private def run(log: LakeLog, tmp: java.nio.file.Path,
                  latenessMs: Long = 30 * 60 * 1000L): Unit = {
    val q = Streams.lateRoutingSinkToLake(
      Streams.lakeStream(spark, log, "src", maxVersionsPerBatch = Some(1L)),
      log, "ontime", "late", "wm", "ts", latenessMs,
      tmp.resolve("ckpt").toString)
    q.processAllAvailable(); q.stop()
  }

  private def ids(log: LakeLog, table: String) =
    LakeTable.read(spark, log, table).select("event_id")
      .as[Long].collect().toSet

  test("stragglers older than the prior-batch watermark quarantine") {
    val (log, tmp) = setup("late1")
    LakeTable.insert(spark, log, "src",
      Seq((ts("10:00:00"), 1L), (ts("10:30:00"), 2L)).toDF("ts", "event_id"),
      txnId = "v1")
    LakeTable.insert(spark, log, "src",
      Seq((ts("09:15:00"), 3L), (ts("11:00:00"), 4L)).toDF("ts", "event_id"),
      txnId = "v2")
    run(log, tmp)
    // batch 0 has no prior watermark — everything on time; batch 1's
    // watermark is 10:30 − 30m = 10:00, so 09:15 is late, 11:00 is not
    assert(ids(log, "ontime") === Set(1L, 2L, 4L))
    assert(ids(log, "late") === Set(3L))
    // one watermark row per batch, cumulative max
    val wm = LakeTable.read(spark, log, "wm")
      .as[(Long, Timestamp)].collect().toMap
    assert(wm === Map(0L -> ts("10:30:00"), 1L -> ts("11:00:00")))
  }

  test("restart from the checkpoint neither duplicates nor re-splits") {
    val (log, tmp) = setup("late2")
    LakeTable.insert(spark, log, "src",
      Seq((ts("10:00:00"), 1L)).toDF("ts", "event_id"), txnId = "v1")
    run(log, tmp)
    LakeTable.insert(spark, log, "src",
      Seq((ts("08:00:00"), 2L), (ts("10:10:00"), 3L)).toDF("ts", "event_id"),
      txnId = "v2")
    run(log, tmp) // second query instance, same checkpoint
    assert(ids(log, "ontime") === Set(1L, 3L))
    assert(ids(log, "late") === Set(2L)) // 08:00 < 10:00 − 30m
    assert(LakeTable.read(spark, log, "ontime").count() === 2) // no dups
  }

  test("a batch ignores watermark rows at or beyond its own id (replay)") {
    val (log, tmp) = setup("late3")
    LakeTable.insert(spark, log, "src",
      Seq((ts("10:00:00"), 1L)).toDF("ts", "event_id"), txnId = "v1")
    // plant a FUTURE batch's watermark row, as a crash between the wm
    // write and the checkpoint commit would leave behind
    LakeTable.insert(spark, log, "wm",
      Seq((1L, ts("23:00:00"))).toDF("batch_id", "max_ts"), txnId = "crash")
    LakeTable.insert(spark, log, "src",
      Seq((ts("09:50:00"), 2L)).toDF("ts", "event_id"), txnId = "v2")
    run(log, tmp)
    // batch 1 must split against batch 0's max (10:00), NOT the planted
    // 23:00 — 09:50 ≥ 10:00 − 30m, so it stays on time
    assert(ids(log, "ontime") === Set(1L, 2L))
    assert(ids(log, "late") === Set())
  }

  test("an all-late batch still advances nothing and quarantines all") {
    val (log, tmp) = setup("late4")
    LakeTable.insert(spark, log, "src",
      Seq((ts("12:00:00"), 1L)).toDF("ts", "event_id"), txnId = "v1")
    LakeTable.insert(spark, log, "src",
      Seq((ts("09:00:00"), 2L), (ts("09:10:00"), 3L)).toDF("ts", "event_id"),
      txnId = "v2")
    run(log, tmp)
    assert(ids(log, "late") === Set(2L, 3L))
    // the watermark never regresses: batch 1's max (09:10) < batch 0's
    val wm = LakeTable.read(spark, log, "wm")
      .as[(Long, Timestamp)].collect().toMap
    assert(wm(1L) === ts("12:00:00"))
  }
}
