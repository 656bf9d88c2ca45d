package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.annotation.JsonInclude
import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

/** Named refs over table versions — Iceberg-style TAGS (immutable named
  * snapshots: `release-2024-01`, `eval-freeze`) for the lake's version
  * line. A tag pins the exact version a downstream consumer (a training
  * run, an eval harness, an auditor) read, surviving later writes and
  * making "what data trained this model" a name, not a number someone
  * wrote down. The reference has no ref surface; the published pattern
  * is Iceberg's ref system (`UpdateSnapshotReferencesOperation`) and
  * Delta's named commits.
  *
  * Storage: one JSON file per ref under `tables/<t>/_refs/`, created
  * with the SAME create-if-absent link(2) commit point as the log's
  * version entries — two processes racing the same tag name get one
  * winner and one clean conflict, never a silent overwrite. Tags are
  * immutable by construction (create fails on an existing name; drop is
  * delete). VACUUM safety: tags pin VERSIONS, so version-retention
  * policies must keep every tagged version's files ([[LakeTable.vacuum]]
  * takes the floor over [[taggedVersions]]).
  */
object Refs {

  final case class TableRef(name: String, version: Long, created_ms: Long)

  private val mapper = JsonMapper.builder()
    .addModule(DefaultScalaModule)
    .serializationInclusion(JsonInclude.Include.NON_ABSENT)
    .build() :: ClassTagExtensions

  private val NameRe = "^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$".r

  private def refsDir(log: LakeLog, table: String): Path =
    log.tableDir(table).resolve("_refs")

  private def refPath(log: LakeLog, table: String, name: String): Path =
    refsDir(log, table).resolve(s"$name.json")

  /** Create an immutable tag pinning `version` (must be a committed
    * version ≥ 1 — 0 is the snapshot resolver's latest-sentinel, so a
    * tag named through it would silently float). */
  def createTag(log: LakeLog, table: String, name: String,
                version: Long): TableRef = {
    if (NameRe.findFirstIn(name).isEmpty)
      throw new LakeValidationException(
        s"invalid ref name '$name' (allowed: [A-Za-z0-9._-], max 128)")
    if (version < 1 || version > log.latestVersion(table))
      throw new LakeValidationException(
        s"cannot tag $table@$version: not a committed version " +
          s"(latest is ${log.latestVersion(table)})")
    val dir = refsDir(log, table)
    Files.createDirectories(dir)
    val ref = TableRef(name, version, System.currentTimeMillis())
    val staged = Files.createTempFile(dir, ".staged", ".json")
    Files.writeString(staged, mapper.writeValueAsString(ref))
    val target = refPath(log, table, name)
    // same atomic create-if-absent commit point as LakeLog.writeEntry:
    // link(2) fails with EEXIST atomically across processes; the rename
    // fallback covers linkless filesystems (single-process-safe there)
    try
      try Files.createLink(target, staged)
      catch {
        case e: java.nio.file.FileAlreadyExistsException => throw e
        case _: UnsupportedOperationException
             | _: java.nio.file.FileSystemException =>
          if (Files.exists(target))
            throw new java.nio.file.FileAlreadyExistsException(target.toString)
          Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
      }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new LakeValidationException(
          s"tag '$name' already exists on $table (tags are immutable — " +
            "drop it first to re-point)")
    } finally Files.deleteIfExists(staged)
    ref
  }

  /** Resolve a ref name to its pinned version. */
  def resolve(log: LakeLog, table: String, name: String): Option[TableRef] = {
    val p = refPath(log, table, name)
    if (!Files.exists(p)) None
    else Some(mapper.readValue[TableRef](Files.readString(p)))
  }

  /** Resolve or fail loudly — the read-path entry point. */
  def resolveOrThrow(log: LakeLog, table: String, name: String): TableRef =
    resolve(log, table, name).getOrElse(throw new LakeValidationException(
      s"no tag '$name' on table $table"))

  def dropTag(log: LakeLog, table: String, name: String): Unit = {
    if (!Files.deleteIfExists(refPath(log, table, name)))
      throw new LakeValidationException(s"no tag '$name' on table $table")
  }

  /** All refs on a table, name-sorted. */
  def list(log: LakeLog, table: String): Seq[TableRef] = {
    val dir = refsDir(log, table)
    if (!Files.isDirectory(dir)) return Nil
    val names = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    names.filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(n => n.stripSuffix(".json")).sorted
      .flatMap(n => resolve(log, table, n))
  }

  /** The set of versions pinned by any tag — the vacuum floor. */
  def taggedVersions(log: LakeLog, table: String): Set[Long] =
    list(log, table).map(_.version).toSet
}
