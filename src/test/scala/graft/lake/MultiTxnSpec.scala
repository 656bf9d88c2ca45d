package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

class MultiTxnSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("mtxn"))
    for (t <- Seq("a", "b")) {
      LakeTable.createTable(log, t, schema)
      LakeTable.insert(spark, log, t, Seq((1L, t)).toDF("id", "v"))
    }
    log
  }

  private def counts(log: LakeLog) =
    (LakeTable.read(spark, log, "a").count(),
      LakeTable.read(spark, log, "b").count())

  test("commit publishes every participant; readAt pins the snapshot") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx1", "a", Seq((2L, "x")).toDF("id", "v"))
    MultiTxn.stage(spark, log, "tx1", "b", Seq((2L, "y")).toDF("id", "v"))
    assert(counts(log) === ((1L, 1L))) // invisible until decide
    val versions = MultiTxn.commit(spark, log, "tx1", Seq("a", "b"))
    assert(versions === Map("a" -> 2L, "b" -> 2L))
    assert(counts(log) === ((2L, 2L)))
    // replayed commit is idempotent
    assert(MultiTxn.commit(spark, log, "tx1", Seq("a", "b")) === versions)
    // later writes don't leak into the pinned snapshot
    LakeTable.insert(spark, log, "a", Seq((9L, "later")).toDF("id", "v"))
    val snap = MultiTxn.readAt(spark, log, "tx1")
    assert(snap("a").count() === 2L && snap("b").count() === 2L)
  }

  test("abort before the decision discards both stages; id is reusable") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx2", "a", Seq((2L, "x")).toDF("id", "v"))
    MultiTxn.stage(spark, log, "tx2", "b", Seq((2L, "y")).toDF("id", "v"))
    MultiTxn.abort(log, "tx2", Seq("a", "b"))
    assert(counts(log) === ((1L, 1L)))
    assert(Wap.listStaged(log, "a").isEmpty && Wap.listStaged(log, "b").isEmpty)
    // an aborted id never decided, so it can stage again
    MultiTxn.stage(spark, log, "tx2", "a", Seq((3L, "z")).toDF("id", "v"))
    assert(MultiTxn.commit(spark, log, "tx2", Seq("a")) === Map("a" -> 2L))
  }

  test("commit refuses when a participant was never staged") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx3", "a", Seq((2L, "x")).toDF("id", "v"))
    intercept[LakeValidationException] {
      MultiTxn.commit(spark, log, "tx3", Seq("a", "b"))
    }
    // nothing decided, nothing published
    assert(counts(log) === ((1L, 1L)))
    MultiTxn.abort(log, "tx3", Seq("a"))
  }

  test("commit refuses a participant staged under the txn but omitted") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx7", "a", Seq((2L, "x")).toDF("id", "v"))
    MultiTxn.stage(spark, log, "tx7", "b", Seq((2L, "y")).toDF("id", "v"))
    // deciding over only {a} would orphan b's stage forever (post-
    // decision it can neither re-stage nor abort) — must fail loudly
    intercept[LakeValidationException] {
      MultiTxn.commit(spark, log, "tx7", Seq("a"))
    }
    assert(MultiTxn.intent(log, "tx7").isEmpty, "no decision was taken")
    assert(counts(log) === ((1L, 1L)))
    // the full list still commits fine afterwards
    assert(MultiTxn.commit(spark, log, "tx7", Seq("a", "b"))
      === Map("a" -> 2L, "b" -> 2L))
  }

  test("crash after the decision rolls forward, never back") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx4", "a", Seq((2L, "x")).toDF("id", "v"))
    MultiTxn.stage(spark, log, "tx4", "b", Seq((2L, "y")).toDF("id", "v"))
    // simulate the coordinator dying mid-protocol: the decision record
    // exists (written exactly as commit writes it) and only table a's
    // publish landed before the crash
    val txns = log.root.resolve("_txns")
    Files.createDirectories(txns)
    Files.writeString(txns.resolve("tx4.json"),
      """{"txn_id":"tx4","tables":["a","b"],"created_ms":1}""")
    Wap.publish(spark, log, "a", "tx4")
    assert(counts(log) === ((2L, 1L))) // the torn window
    // a decided txn refuses abort
    intercept[LakeValidationException] {
      MultiTxn.abort(log, "tx4", Seq("a", "b"))
    }
    // recovery drives it to done — idempotently past the landed publish
    assert(MultiTxn.recover(spark, log) === Seq("tx4"))
    assert(counts(log) === ((2L, 2L)))
    assert(MultiTxn.done(log, "tx4").get.versionMap
      === Map("a" -> 2L, "b" -> 2L))
    assert(!Files.exists(txns.resolve("tx4.json")))
    // a second recovery sweep finds nothing pending
    assert(MultiTxn.recover(spark, log).isEmpty)
  }

  test("staging into a decided txn is refused") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx5", "a", Seq((2L, "x")).toDF("id", "v"))
    MultiTxn.commit(spark, log, "tx5", Seq("a"))
    intercept[LakeValidationException] {
      MultiTxn.stage(spark, log, "tx5", "b", Seq((2L, "y")).toDF("id", "v"))
    }
  }

  test("concurrent commits of one txn agree on a single decision") {
    val log = setup()
    MultiTxn.stage(spark, log, "tx6", "a", Seq((2L, "x")).toDF("id", "v"))
    MultiTxn.stage(spark, log, "tx6", "b", Seq((2L, "y")).toDF("id", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (1 to 4).map(_ => pool.submit(
      new java.util.concurrent.Callable[Map[String, Long]] {
        def call(): Map[String, Long] =
          MultiTxn.commit(spark, log, "tx6", Seq("a", "b"))
      }))
    val results = futures.map(_.get()).toList
    pool.shutdown()
    assert(results.distinct.size === 1)
    assert(counts(log) === ((2L, 2L)))
  }
}
