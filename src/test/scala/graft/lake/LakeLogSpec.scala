package graft.lake

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Try
import org.scalatest.funsuite.AnyFunSuite

/** Log/commit semantics, mirroring the reference's unit + property tests:
  * `pkg/metadata/state_test.go`, Property 4 (log-controlled visibility),
  * 6 (concurrent commit exclusion), 9 (replay determinism),
  * 10 (commit idempotency).
  */
class LakeLogSpec extends AnyFunSuite {

  private def newLog(): LakeLog = {
    val dir = Files.createTempDirectory("lake")
    dir.toFile.deleteOnExit()
    new LakeLog(dir)
  }
  private val schema = TableSchema(Seq(
    Field("id", "int64", nullable = false), Field("v", "float64")))
  private def add(p: String, rows: Long = 10, size: Long = 100) =
    FileAdd(p, rows, size)

  test("createTable writes version 0 with schema") {
    val log = newLog()
    log.createTable("t1", schema)
    assert(log.latestVersion("t1") == 0)
    val snap = log.snapshot("t1")
    assert(snap.version == 0 && snap.files.isEmpty &&
      snap.schema.contains(schema))
  }

  test("createTable validates name and schema") {
    val log = newLog()
    assertThrows[LakeValidationException](log.createTable("bad name", schema))
    assertThrows[LakeValidationException](
      log.createTable("t", TableSchema(Nil)))
    assertThrows[LakeValidationException](log.createTable("t",
      TableSchema(Seq(Field("a", "int64"), Field("a", "string")))))
    assertThrows[LakeValidationException](log.createTable("t",
      TableSchema(Seq(Field("a", "uint128")))))
    log.createTable("t", schema)
    assertThrows[LakeValidationException](log.createTable("t", schema))
  }

  test("commit advances version; snapshot replays adds and removes") {
    val log = newLog()
    log.createTable("t", schema)
    assert(log.commit("t", 0, "tx1", Seq(add("a"), add("b"))) ==
      CommitResult(1, duplicate = false))
    assert(log.commit("t", 1, "tx2", Seq(add("c")), removes = Seq("a")) ==
      CommitResult(2, duplicate = false))
    assert(log.snapshot("t").files.map(_.path) == Seq("b", "c"))
    // time travel: visibility is exactly the log replay at each version;
    // version 0 means "latest" (reference GetSnapshot, state.go:323-369)
    assert(log.snapshot("t", 1).files.map(_.path) == Seq("a", "b"))
    assert(log.snapshot("t", 0).files.map(_.path) == Seq("b", "c"))
  }

  test("snapshot bounds: future versions rejected, missing tables rejected") {
    val log = newLog()
    log.createTable("t", schema)
    assertThrows[LakeValidationException](log.snapshot("t", 99))
    assertThrows[LakeValidationException](log.snapshot("nope"))
    assertThrows[LakeValidationException](log.latestVersion("nope"))
    assertThrows[LakeValidationException](
      log.commit("nope", 0, "tx", Nil))
  }

  test("OCC rejects stale base version") {
    val log = newLog()
    log.createTable("t", schema)
    log.commit("t", 0, "tx1", Seq(add("a")))
    val e = intercept[CommitConflictException](
      log.commit("t", 0, "tx2", Seq(add("b"))))
    assert(e.getMessage.contains("base version 0"))
  }

  test("idempotency: duplicate txn id returns prior version, no new changes") {
    val log = newLog()
    log.createTable("t", schema)
    assert(log.commit("t", 0, "tx1", Seq(add("a"))) ==
      CommitResult(1, duplicate = false))
    // retry with any base version: same result, duplicate flag, no new version
    assert(log.commit("t", 1, "tx1", Seq(add("zzz"))) ==
      CommitResult(1, duplicate = true))
    assert(log.commit("t", 99, "tx1", Nil) == CommitResult(1, duplicate = true))
    assert(log.latestVersion("t") == 1)
    assert(log.snapshot("t").files.map(_.path) == Seq("a"))
  }

  test("file-operation validation: removes must exist, adds must be new") {
    val log = newLog()
    log.createTable("t", schema)
    log.commit("t", 0, "tx1", Seq(add("a")))
    assertThrows[LakeValidationException](
      log.commit("t", 1, "tx2", Nil, removes = Seq("nope")))
    assertThrows[LakeValidationException](
      log.commit("t", 1, "tx3", Seq(add("a"))))
    // re-add in same txn as remove is allowed (rewrite in place)
    assert(log.commit("t", 1, "tx4", Seq(add("a", rows = 5)),
      removes = Seq("a")).version == 2)
    assertThrows[LakeValidationException](
      log.commit("t", 2, "tx5", Seq(FileAdd("", 1, 1))))
    assertThrows[LakeValidationException](
      log.commit("t", 2, "tx6", Seq(FileAdd("s", 0, 10))))
  }

  test("Property 9: replay is deterministic — fresh LakeLog over the same dir") {
    val log = newLog()
    log.createTable("t", schema)
    log.commit("t", 0, "tx1", Seq(add("b"), add("a")))
    log.commit("t", 1, "tx2", Seq(add("c")), removes = Seq("a"))
    val replayed = new LakeLog(log.root)
    assert(replayed.snapshot("t") == log.snapshot("t"))
    assert(replayed.snapshot("t", 1) == log.snapshot("t", 1))
    assert(replayed.snapshot("t").files.map(_.path) ==
      replayed.snapshot("t").files.map(_.path).sorted)
  }

  test("Property 6: N concurrent commits at the same base → exactly one winner") {
    val log = newLog()
    log.createTable("t", schema)
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Try[CommitResult]] {
        def call(): Try[CommitResult] = {
          start.await()
          Try(log.commit("t", 0, s"tx$i", Seq(add(s"f$i"))))
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    val outcomes = results.map(_.get())
    assert(outcomes.count(_.isSuccess) == 1)
    assert(outcomes.filter(_.isFailure).forall(
      _.failed.get.isInstanceOf[CommitConflictException]))
    assert(log.latestVersion("t") == 1)
    assert(log.snapshot("t").files.size == 1)
  }

  test("Property 10 concurrent: same txn retried in parallel commits once") {
    val log = newLog()
    log.createTable("t", schema)
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = (0 until n).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Try[CommitResult]] {
        def call(): Try[CommitResult] = {
          start.await()
          Try(log.commitWithRetry("t", "same-txn")(
            _ => Some((Seq(add("once")), Nil))).get)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    val ok = results.map(_.get()).collect { case scala.util.Success(r) => r }
    assert(ok.size == n) // every retry converges to the same commit
    assert(ok.map(_.version).distinct == Seq(1))
    assert(ok.count(!_.duplicate) == 1)
    assert(log.snapshot("t").files.map(_.path) == Seq("once"))
  }

  test("commitWithRetry replans against the fresh snapshot on conflict") {
    val log = newLog()
    log.createTable("t", schema)
    log.commit("t", 0, "setup", Seq(add("a")))
    var attempts = 0
    val result = log.commitWithRetry("t", "retry-tx") { snap =>
      attempts += 1
      if (attempts == 1) {
        // sneak in a competing commit between plan and commit
        log.commit("t", snap.version, "competitor", Seq(add("b")))
      }
      Some((Seq(add(s"mine")), Nil))
    }
    assert(result.exists(!_.duplicate))
    assert(attempts == 2)
    assert(log.snapshot("t").files.map(_.path) == Seq("a", "b", "mine"))
  }
}
