package graft.lake

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Coordinator subprocess: waits for the barrier file, then drives the
  * requested MultiTxn verb against the shared log directory. The 2PC
  * layer is pure log metadata — `Wap.publish` adopts already-staged
  * files through `log.commitWithRetry` and never touches the
  * SparkSession — so the subprocess is Spark-free and starts in
  * milliseconds, same as [[CommitRaceMain]]. (Passing null pins that
  * metadata-only property too: if a future change makes the decision
  * path need Spark, this spec fails loudly.)
  */
object TxnRaceMain {
  def main(args: Array[String]): Unit = {
    val (root, txnId, mode) = (Paths.get(args(0)), args(1), args(2))
    val start = root.resolve("__start__")
    while (!Files.exists(start)) Thread.sleep(1)
    val log = new LakeLog(root)
    mode match {
      case "commit" =>
        val vs = MultiTxn.commit(null, log, txnId, Seq("a", "b"))
        vs.toSeq.sortBy(_._1).foreach { case (t, v) =>
          println(s"published $t $v")
        }
      case "recover" =>
        MultiTxn.recover(null, log).foreach(id => println(s"recovered $id"))
    }
  }
}

/** Cross-process evidence for the 2PC decision point, the same
  * evidentiary bar CrossProcessCommitSpec set for the log's commit
  * point: the decision file `_txns/<id>.json` rides the identical
  * link(2) create-if-absent device, so two coordinators racing
  * `commit(id)` from SEPARATE JVMs (no shared table lock) must agree on
  * one decision and publish each participant exactly once; a
  * coordinator killed between decide and done must be driven to
  * completion by `recover()` from another process.
  */
class CrossProcessTxnSpec extends AnyFunSuite {

  private def java: String =
    Paths.get(sys.props("java.home"), "bin", "java").toString

  private def spawn(root: Path, txnId: String, mode: String): Process = {
    val pb = new ProcessBuilder(java, "-cp", sys.props("java.class.path"),
      "graft.lake.TxnRaceMain", root.toString, txnId, mode)
    pb.redirectErrorStream(true)
    pb.start()
  }

  /** Stage a batch as metadata directly (what Wap.stage records after
    * writing the data files — the files themselves are irrelevant to
    * the decision protocol, and zero-row adds are valid commits). */
  private def stageByHand(log: LakeLog, table: String, txnId: String): Unit = {
    val dir = log.tableDir(table).resolve("_wap")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"$txnId.json"),
      s"""{"wap_id":"$txnId","base_version":${log.latestVersion(table)},""" +
        s""""created_ms":1,"adds":[{"path":"$table-$txnId-file","rows":0,""" +
        """"size":0,"partition":{},"rewrite":false}]}""")
  }

  private def setup(): (Path, LakeLog) = {
    val root = Files.createTempDirectory("xtxn")
    val log = new LakeLog(root)
    val sch = TableSchema(Seq(Field("id", "int64", true)))
    Seq("a", "b").foreach(log.createTable(_, sch))
    (root, log)
  }

  test("two JVMs racing commit(id) on one txn id get one decision") {
    val (root, log) = setup()
    stageByHand(log, "a", "tx")
    stageByHand(log, "b", "tx")
    val p1 = spawn(root, "tx", "commit")
    val p2 = spawn(root, "tx", "commit")
    Files.createFile(root.resolve("__start__"))
    val out1 = new String(p1.getInputStream.readAllBytes())
    val out2 = new String(p2.getInputStream.readAllBytes())
    assert(p1.waitFor() == 0, s"coordinator 1 failed:\n$out1")
    assert(p2.waitFor() == 0, s"coordinator 2 failed:\n$out2")
    def parse(out: String) = out.linesIterator.collect {
      case l if l.startsWith("published ") =>
        val p = l.split(" "); p(1) -> p(2).toLong
    }.toMap
    val (vs1, vs2) = (parse(out1), parse(out2))
    // both coordinators succeeded AND report the SAME version map — the
    // loser of the decision race adopted the winner's decision
    assert(vs1.keySet == Set("a", "b"))
    assert(vs1 == vs2, s"coordinators disagree: $vs1 vs $vs2\n$out1\n$out2")
    // each participant published exactly once (idempotent under wap-tx)
    val fresh = new LakeLog(root)
    Seq("a", "b").foreach { t =>
      assert(fresh.latestVersion(t) == 1L,
        s"$t must carry exactly ONE publish commit")
      assert(fresh.committedVersion(t, "wap-tx").contains(vs1(t)))
      assert(fresh.snapshot(t).files.map(_.path) == Seq(s"$t-tx-file"))
    }
    // decision retired into exactly one done record; no staged leftovers
    assert(MultiTxn.done(fresh, "tx").exists(_.versionMap == vs1))
    assert(MultiTxn.intent(fresh, "tx").isEmpty)
    Seq("a", "b").foreach(t => assert(Wap.staged(fresh, t, "tx").isEmpty))
  }

  test("killed between decide and done: recover() from a second JVM " +
      "rolls forward") {
    val (root, log) = setup()
    stageByHand(log, "a", "txk")
    stageByHand(log, "b", "txk")
    // the crash state: intent written (the decision EXISTS), coordinator
    // gone before any publish — exactly what a kill -9 after the link(2)
    // leaves behind
    val txns = root.resolve("_txns")
    Files.createDirectories(txns)
    Files.writeString(txns.resolve("txk.json"),
      """{"txn_id":"txk","tables":["a","b"],"created_ms":1}""")
    val p = spawn(root, "txk", "recover")
    Files.createFile(root.resolve("__start__"))
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"recovery JVM failed:\n$out")
    assert(out.contains("recovered txk"), s"recover missed the txn:\n$out")
    val fresh = new LakeLog(root)
    val done = MultiTxn.done(fresh, "txk")
    assert(done.isDefined, "decided txn must be driven to done")
    assert(done.get.versionMap == Map("a" -> 1L, "b" -> 1L))
    assert(MultiTxn.intent(fresh, "txk").isEmpty)
    Seq("a", "b").foreach { t =>
      assert(fresh.committedVersion(t, "wap-txk").contains(1L),
        s"$t was not published by recovery")
      assert(Wap.staged(fresh, t, "txk").isEmpty)
    }
    // recovery is idempotent: a second sweep finds nothing pending
    assert(MultiTxn.recover(null, fresh).isEmpty)
  }
}
