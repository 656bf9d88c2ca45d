package graft.api

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Field, LakeLog, Refs, TableSchema}

class ResultCacheSpec extends AnyFunSuite {

  private def seededLog(): LakeLog = {
    val log = new LakeLog(Files.createTempDirectory("rcspec"))
    log.createTable("t", TableSchema(Seq(Field("id", "int64", true))))
    log.commitWithRetry("t", "seed") { _ =>
      Some((Seq(graft.lake.FileAdd("f1", rows = 1L, size = 1L)), Nil))
    }
    log
  }

  test("fingerprint changes on commit AND on every ref mutation") {
    val log = seededLog()
    val cache = new ResultCache[String]()
    val fp0 = cache.fingerprint(log)
    // a commit moves the version part
    log.commitWithRetry("t", "c2") { _ =>
      Some((Seq(graft.lake.FileAdd("f2", rows = 1L, size = 1L)), Nil))
    }
    val fp1 = cache.fingerprint(log)
    assert(fp1 != fp0)
    // CREATE TAG: no commit, but DESCRIBE REFS now answers differently —
    // the fingerprint must move (this was the round-8 staleness hole)
    Refs.createTag(log, "t", "rel", 1L)
    val fp2 = cache.fingerprint(log)
    assert(fp2 != fp1)
    // MOVE BRANCH: `VERSION AS OF 'prod'` resolves to new rows commitless
    Refs.createBranch(log, "t", "prod", 1L)
    val fp3 = cache.fingerprint(log)
    assert(fp3 != fp2)
    Refs.moveBranch(log, "t", "prod", 2L)
    val fp4 = cache.fingerprint(log)
    assert(fp4 != fp3)
    // DROP + recreate at the SAME version still distinguishes (created_ms)
    Refs.drop(log, "t", "rel")
    val fp5 = cache.fingerprint(log)
    assert(fp5 != fp4)
    Thread.sleep(2)
    Refs.createTag(log, "t", "rel", 1L)
    assert(cache.fingerprint(log) != fp4)
  }

  test("stale-serving repro: branch move invalidates a cached branch read") {
    val log = seededLog()
    log.commitWithRetry("t", "c2") { _ =>
      Some((Seq(graft.lake.FileAdd("f2", rows = 1L, size = 1L)), Nil))
    }
    Refs.createBranch(log, "t", "prod", 1L)
    val cache = new ResultCache[Long]()
    val sql = "SELECT count(*) FROM t VERSION AS OF 'prod'"
    def readBranch(): Long = Refs.resolveOrThrow(log, "t", "prod").version
    val (v1, hit1) = cache.getOrCompute(sql, cache.fingerprint(log))(readBranch())
    assert(v1 == 1L && !hit1)
    // promotion WITHOUT any table commit
    Refs.moveBranch(log, "t", "prod", 2L)
    val (v2, hit2) = cache.getOrCompute(sql, cache.fingerprint(log))(readBranch())
    assert(v2 == 2L, "cache served the pre-promotion branch target")
    assert(!hit2)
  }

  test("single-flight is per key: a slow miss never blocks another key") {
    val cache = new ResultCache[String]()
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() =>
      cache.getOrCompute("SLOW", "fp") {
        slowStarted.countDown()
        release.await(30, TimeUnit.SECONDS)
        "slow-done"
      })
    slow.start()
    assert(slowStarted.await(10, TimeUnit.SECONDS))
    // while SLOW is mid-compute, an unrelated statement must proceed
    val (v, hit) = cache.getOrCompute("FAST", "fp")("fast-done")
    assert(v == "fast-done" && !hit)
    release.countDown()
    slow.join(30000)
    assert(!slow.isAlive)
    assert(cache.getOrCompute("SLOW", "fp")("never")._1 == "slow-done")
  }

  test("concurrent identical keys compute once; waiters count as hits") {
    val cache = new ResultCache[String]()
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val inCompute = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val r1 = new java.util.concurrent.atomic.AtomicReference[String]()
    val t1 = new Thread(() => r1.set(cache.getOrCompute("Q", "fp") {
      computes.incrementAndGet(); inCompute.countDown()
      release.await(30, TimeUnit.SECONDS); "v"
    }._1))
    t1.start()
    assert(inCompute.await(10, TimeUnit.SECONDS))
    val t2 = new Thread(() => cache.getOrCompute("Q", "fp") {
      computes.incrementAndGet(); "v2"
    })
    t2.start()
    Thread.sleep(100) // let t2 reach the in-flight wait
    release.countDown()
    t1.join(30000); t2.join(30000)
    assert(computes.get() == 1, s"computed ${computes.get()} times")
    assert(r1.get() == "v")
    assert(cache.hits >= 1 && cache.misses == 1)
  }

  test("a failed compute propagates to waiters and caches nothing") {
    val cache = new ResultCache[String]()
    intercept[IllegalStateException] {
      cache.getOrCompute("BAD", "fp")(
        throw new IllegalStateException("boom"))
    }
    // nothing cached: the next call recomputes (and can succeed)
    val (v, hit) = cache.getOrCompute("BAD", "fp")("recovered")
    assert(v == "recovered" && !hit)
  }
}
