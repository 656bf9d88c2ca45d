package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The racer: a SECOND JVM trying to create the same tag names against
  * the same table directory. Pure LakeLog+Refs (no Spark). Protocol:
  * wait for `<root>/__start__`, then for each name `tag-0..tag-(n-1)`
  * attempt createTag, printing `won <name>` or `lost <name>`. */
object TagRaceMain {
  def main(args: Array[String]): Unit = {
    val (root, table, count) = (Paths.get(args(0)), args(1), args(2).toInt)
    val start = root.resolve("__start__")
    while (!Files.exists(start)) Thread.sleep(1)
    val log = new LakeLog(root)
    (0 until count).foreach { i =>
      try {
        Refs.createTag(log, table, s"tag-$i", 1L)
        println(s"won tag-$i")
      } catch {
        case _: LakeValidationException => println(s"lost tag-$i")
      }
    }
  }
}

/** Cross-process ref exclusion: tag creation shares the log's link(2)
  * create-if-absent commit point, so two processes racing the same tag
  * name must produce exactly one winner and one CLEAN loser — never a
  * silent overwrite (rename(2) would replace) and never a torn/corrupt
  * ref file. The same two-JVM rigor as [[CrossProcessCommitSpec]],
  * applied to the refs surface. */
class CrossProcessRefsSpec extends AnyFunSuite {

  test("two JVMs racing the same tag names: one winner per name") {
    val root = Files.createTempDirectory("xprocrefs")
    val log = new LakeLog(root)
    log.createTable("t", TableSchema(Seq(Field("id", "int64", true))))
    log.commitWithRetry("t", "seed") { _ =>
      Some((Seq(FileAdd("seed-file", rows = 0L, size = 0L)), Nil))
    }
    val names = 60

    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(java, "-cp", sys.props("java.class.path"),
      "graft.lake.TagRaceMain", root.toString, "t", names.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    Files.createFile(root.resolve("__start__"))
    val mine = (0 until names).map { i =>
      try { Refs.createTag(log, "t", s"tag-$i", 1L); true }
      catch { case _: LakeValidationException => false }
    }

    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"racer JVM failed:\n$out")
    val theirs = out.linesIterator.toSeq.collect {
      case l if l.startsWith("won ") => l.stripPrefix("won ") -> true
      case l if l.startsWith("lost ") => l.stripPrefix("lost ") -> false
    }.toMap
    assert(theirs.size == names, s"racer skipped names:\n$out")

    // EXACTLY one winner per name (no double-create, no lost create)
    (0 until names).foreach { i =>
      val winners = Seq(mine(i), theirs(s"tag-$i")).count(identity)
      assert(winners == 1,
        s"tag-$i had $winners winners (must be exactly 1)")
    }
    // every ref file parses and points at the seeded version — a torn
    // or overwritten file would fail the JSON parse or the version pin
    val listed = Refs.list(log, "t")
    assert(listed.size == names)
    assert(listed.forall(r => r.version == 1L && r.kind == Refs.Tag))
    // no staged temp leftovers from the losing side
    val refsDir = root.resolve("tables").resolve("t").resolve("_refs")
    val leftovers = Files.list(refsDir).toArray.map(_.toString)
      .filter(_.contains(".staged"))
    assert(leftovers.isEmpty, s"staged leftovers: ${leftovers.toSeq}")
  }
}
