package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("forget"))
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("user_id", "v")
    LakeTable.createTable(log, "t1", rows.schema)
    LakeTable.insert(spark, log, "t1", rows, numFiles = 2)
    val prof = rows.groupBy("user_id").agg(count(lit(1)).as("n"))
    LakeTable.createTable(log, "t2", prof.schema)
    LakeTable.insert(spark, log, "t2", prof, numFiles = 2)
    log
  }

  test("erases the key from every table; reports per-table evidence") {
    val log = setup()
    val r = Forget.forgetKey(spark, log, Seq("t1", "t2"), "user_id",
      "1", "req-a")
    assert(r.map(x => x.table -> x.rowsDeleted).toMap ==
      Map("t1" -> 2L, "t2" -> 1L))
    assert(LakeTable.read(spark, log, "t1")
      .filter($"user_id" === 1).count() == 0)
    assert(LakeTable.read(spark, log, "t2")
      .filter($"user_id" === 1).count() == 0)
    // untouched subjects intact
    assert(LakeTable.read(spark, log, "t1").count() == 2)
  }

  test("string keys are typed: quoting, escaping, no numeric cast") {
    val log = new LakeLog(tmpDir("forget-str"))
    val rows = Seq(("O'Brien", 1L), ("07", 2L), ("7", 3L), ("x y", 4L))
      .toDF("subject", "v")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows, numFiles = 1)
    // embedded quote must not reach the SQL-expression parser
    val r1 = Forget.forgetKey(spark, log, Seq("t"), "subject",
      "O'Brien", "req-q")
    assert(r1.head.rowsDeleted == 1)
    // "07" must match ONLY the string "07", never integer-cast onto "7"
    val r2 = Forget.forgetKey(spark, log, Seq("t"), "subject",
      "07", "req-07")
    assert(r2.head.rowsDeleted == 1)
    assert(LakeTable.read(spark, log, "t").select("subject")
      .as[String].collect().sorted.toSeq == Seq("7", "x y"))
    // whitespace value stays one literal through the 3-token grammar
    val r3 = Forget.forgetKey(spark, log, Seq("t"), "subject",
      "x y", "req-ws")
    assert(r3.head.rowsDeleted == 1)
    // numeric key column rejects a non-numeric value loudly
    val logN = setup()
    intercept[LakeValidationException] {
      Forget.forgetKey(spark, logN, Seq("t1"), "user_id", "abc", "req-x")
    }
    intercept[LakeValidationException] {
      Forget.forgetKey(spark, logN, Seq("t1"), "no_such_col", "1", "req-y")
    }
  }

  test("staged WAP batches carrying the subject are aborted, not missed") {
    val log = setup()
    // two staged batches: one carries subject 2, one does not
    Wap.stage(spark, log, "t1",
      Seq((2L, "staged-of-2"), (9L, "x")).toDF("user_id", "v"), "w-dirty")
    Wap.stage(spark, log, "t1",
      Seq((8L, "y")).toDF("user_id", "v"), "w-clean")
    val r = Forget.forgetKey(spark, log, Seq("t1"), "user_id", "2", "req-w")
    assert(r.head.stagedAborted == 1L)
    assert(Wap.staged(log, "t1", "w-dirty").isEmpty,
      "the dirty staged batch must be aborted")
    assert(Wap.staged(log, "t1", "w-clean").nonEmpty,
      "the clean staged batch must survive")
    // publishing the survivor must not resurrect the subject
    Wap.publish(spark, log, "t1", "w-clean")
    assert(LakeTable.read(spark, log, "t1")
      .filter($"user_id" === 2).count() == 0)
  }

  test("an UNDECIDED MultiTxn stage aborts; its commit then fails loudly") {
    val log = setup()
    MultiTxn.stage(spark, log, "txn-g", "t1",
      Seq((3L, "staged-of-3")).toDF("user_id", "v"))
    Forget.forgetKey(spark, log, Seq("t1"), "user_id", "3", "req-g")
    assert(Wap.staged(log, "t1", "txn-g").isEmpty)
    // presumed abort: the coordinator's later commit fails loudly
    // instead of resurrecting the subject
    intercept[LakeValidationException] {
      MultiTxn.commit(spark, log, "txn-g", Seq("t1"))
    }
    assert(LakeTable.read(spark, log, "t1")
      .filter($"user_id" === 3).count() == 0)
  }

  test("forget drives a decided-but-unfinished txn to done, not abort") {
    val log = setup()
    // the real mid-crash state: both participants staged, the DECISION
    // record written (what commit creates before publishing), no roll-
    // forward yet — a coordinator crash between decide and publish.
    // forget must roll the txn forward (then erase), never abort it.
    MultiTxn.stage(spark, log, "txn-h", "t1",
      Seq((2L, "decided-of-2")).toDF("user_id", "v"))
    MultiTxn.stage(spark, log, "txn-h", "t2",
      Seq((2L, 7L)).toDF("user_id", "n"))
    val txns = log.root.resolve("_txns")
    java.nio.file.Files.createDirectories(txns)
    java.nio.file.Files.writeString(txns.resolve("txn-h.json"),
      """{"txn_id":"txn-h","tables":["t1","t2"],"created_ms":1}""")
    val r = Forget.forgetKey(spark, log, Seq("t1", "t2"), "user_id",
      "2", "req-h")
    // the staged copy was resolved (rolled forward) and counted
    assert(r.find(_.table == "t1").get.stagedAborted == 1L)
    assert(MultiTxn.done(log, "txn-h").nonEmpty,
      "decided txn must roll forward to done, not wedge")
    assert(MultiTxn.recover(spark, log).isEmpty) // nothing left pending
    // the subject is erased from BOTH tables' main lines…
    assert(LakeTable.read(spark, log, "t1")
      .filter($"user_id" === 2).count() == 0)
    assert(LakeTable.read(spark, log, "t2")
      .filter($"user_id" === 2).count() == 0)
    // …and non-subject rows survive: seed (1,a),(1,b),(3,d)
    assert(LakeTable.read(spark, log, "t1").count() == 3)
  }

  test("a half-completed request resumes without double-deleting") {
    val log = setup()
    // crash after the first table: only t1 processed
    val first = Forget.forgetKey(spark, log, Seq("t1"), "user_id",
      "2", "req-b")
    assert(first.head.rowsDeleted == 1)
    // operator replays the FULL list under the same request id
    val resumed = Forget.forgetKey(spark, log, Seq("t1", "t2"),
      "user_id", "2", "req-b")
    assert(resumed.find(_.table == "t1").get.rowsDeleted == 0) // skipped
    assert(resumed.find(_.table == "t2").get.rowsDeleted == 1) // done now
    // a DIFFERENT request for the same key is its own transaction
    val again = Forget.forgetKey(spark, log, Seq("t1", "t2"), "user_id",
      "2", "req-c")
    assert(again.forall(_.rowsDeleted == 0)) // nothing left to erase
  }
}
