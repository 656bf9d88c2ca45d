package graft.lake

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The racer: a SECOND JVM hammering commits against the same table
  * directory. Pure LakeLog (no Spark) so the subprocess starts in
  * milliseconds. Protocol: wait for `<root>/__start__`, then loop
  * `count` commits via commitWithRetry (generous attempt budget — the
  * contract under test is exclusion and retry-ability, not 3-attempt
  * starvation), printing `committed <version> <txnId>` per win.
  */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val (root, table, count) = (Paths.get(args(0)), args(1), args(2).toInt)
    val start = root.resolve("__start__")
    while (!Files.exists(start)) Thread.sleep(1)
    val log = new LakeLog(root)
    (0 until count).foreach { i =>
      val txn = s"racer-$i"
      val r = log.commitWithRetry(table, txn, maxAttempts = 1000) { _ =>
        Some((Seq(FileAdd(s"racer-file-$i", rows = 0L, size = 0L)), Nil))
      }.get
      println(s"committed ${r.version} $txn")
    }
  }
}

/** Cross-process OCC exclusion: the commit point is link(2)'s atomic
  * create-if-absent — rename(2) silently REPLACES on POSIX, so before
  * this contract existed a second process racing the same version could
  * overwrite a committed entry (the in-JVM table lock can't see another
  * process). The reference gets multi-writer exclusion from Raft
  * (`pkg/metadata/state.go:162-164`); this pins the single-sequencer
  * analog: every version number is won by exactly one writer, losers
  * conflict cleanly and retry onto fresh versions, nothing is lost.
  */
class CrossProcessCommitSpec extends AnyFunSuite {

  test("two JVMs racing the same table: every commit wins a unique version") {
    val root = Files.createTempDirectory("xproc")
    val log = new LakeLog(root)
    log.createTable("t", TableSchema(Seq(Field("id", "int64", true))))
    val base = log.latestVersion("t")
    val perSide = 40

    // second JVM: same classpath as this forked test JVM, no Spark needed
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(java, "-cp", sys.props("java.class.path"),
      "graft.lake.CommitRaceMain", root.toString, "t", perSide.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    // barrier: release the racer, then hammer from this side concurrently
    Files.createFile(root.resolve("__start__"))
    val mine = (0 until perSide).map { i =>
      val txn = s"local-$i"
      val r = log.commitWithRetry("t", txn, maxAttempts = 1000) { _ =>
        Some((Seq(FileAdd(s"local-file-$i", rows = 0L, size = 0L)), Nil))
      }.get
      r.version -> txn
    }

    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"racer JVM failed:\n$out")
    val theirs = out.linesIterator.toSeq.collect {
      case l if l.startsWith("committed ") =>
        val p = l.split(" "); p(1).toLong -> p(2)
    }
    assert(theirs.size == perSide, s"racer lost commits:\n$out")

    // exactly one winner per version: both sides' versions are disjoint
    // and together form the contiguous range (base, base + 2*perSide]
    val all = mine ++ theirs
    val versions = all.map(_._1)
    assert(versions.distinct.size == all.size,
      s"a version was won twice: ${versions.groupBy(identity)
        .filter(_._2.size > 1).keys.toSeq.sorted}")
    assert(versions.sorted == (base + 1 to base + 2L * perSide),
      "committed versions must be the contiguous post-base range")

    // nothing overwritten: replaying the FULL log finds every txn exactly
    // once at the version its writer reported, and every entry parses
    val fresh = new LakeLog(root)
    assert(fresh.latestVersion("t") == base + 2L * perSide)
    all.foreach { case (v, txn) =>
      assert(fresh.committedVersion("t", txn).contains(v),
        s"txn $txn lost its version $v — an entry was overwritten")
    }
    val files = fresh.snapshot("t").files.map(_.path).toSet
    assert((0 until perSide).forall(i => files.contains(s"racer-file-$i") &&
      files.contains(s"local-file-$i")))

    // losers left nothing behind: the log dir holds only canonical
    // entries/checkpoints — staged temps are cleaned on both outcomes
    val logDir = log.logDir("t")
    val leftovers = Files.list(logDir).toArray.map(_.toString)
      .filter(p => p.contains(".staged"))
    assert(leftovers.isEmpty, s"staged leftovers: ${leftovers.toSeq}")
  }
}
