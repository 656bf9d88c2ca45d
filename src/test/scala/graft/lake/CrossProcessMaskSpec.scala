package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The racer: a SECOND JVM mutating the same table's mask policy. Pure
  * LakeLog+Masking (no Spark: `dropMask` drives the identical OCC
  * `mutate` read-modify-write path as `setMask`, without needing a
  * session for type validation). Protocol: wait for `<root>/__start__`,
  * then commit `n` policy mutations. */
object MaskRaceMain {
  def main(args: Array[String]): Unit = {
    val (root, table, count) = (Paths.get(args(0)), args(1), args(2).toInt)
    val start = root.resolve("__start__")
    while (!Files.exists(start)) Thread.sleep(1)
    val log = new LakeLog(root)
    (0 until count).foreach { i =>
      Masking.dropMask(log, table, s"b_gone_$i")
    }
    println("done")
  }
}

/** Cross-process mask-policy exclusion: every mutation commits through
  * the link(2) create-if-absent OCC mini-log, so two PROCESSES
  * interleaving mutations must never lose each other's updates and
  * never leave a torn policy — the CrossProcessCommitSpec treatment for
  * the governance surface, where a lost mask is a data-exposure event.
  */
class CrossProcessMaskSpec extends AnyFunSuite {

  test("two JVMs interleaving policy mutations: no update lost, no torn file") {
    val root = Files.createTempDirectory("xprocmask")
    val log = new LakeLog(root)
    log.createTable("t", TableSchema(Seq(
      Field("id", "int64", true), Field("seg", "string", true))))
    val n = 40

    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(java, "-cp", sys.props("java.class.path"),
      "graft.lake.MaskRaceMain", root.toString, "t", n.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    Files.createFile(root.resolve("__start__"))
    // parent: n mutations through the same OCC path, racing the child's.
    // Every mutation (even a content-identity dropMask) commits one new
    // policy version, so the version line below accounts for exactly one
    // commit per mutation — a lost OCC race shows up as a gap or a short
    // count. (Content-level no-lost-update is additionally covered by
    // the threaded MaskingSpec case.)
    (0 until n).foreach { i =>
      Masking.dropMask(log, "t", s"a_gone_$i")
    }

    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"racer JVM failed:\n$out")
    assert(out.contains("done"), s"racer did not finish:\n$out")

    // every committed policy version parses (no torn files), versions are
    // gapless 1..2n (every mutation landed exactly once — a lost OCC race
    // that silently dropped a commit would leave a gap or a short count)
    val dir = root.resolve("tables").resolve("t").resolve("_masks")
    val entries = Files.list(dir).toArray.map(_.toString)
      .filter(p => p.endsWith(".json") && !Paths.get(p).getFileName
        .toString.startsWith("."))
      .sorted
    assert(entries.length == 2 * n,
      s"expected ${2 * n} policy versions, found ${entries.length}")
    val versions = entries.map(p =>
      Paths.get(p).getFileName.toString.stripSuffix(".json").toLong)
    assert(versions.toSeq == (1L to 2L * n),
      "policy version line has gaps — a mutation was lost")
    // and the newest parses cleanly through the public read
    assert(Masking.policy(log, "t").masks.isEmpty)
    // no staged temp leftovers
    val leftovers = Files.list(dir).toArray.map(_.toString)
      .filter(_.contains(".staged"))
    assert(leftovers.isEmpty, s"staged leftovers: ${leftovers.toSeq}")
  }
}
