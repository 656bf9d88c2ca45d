package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.annotation.JsonInclude
import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish — Iceberg's WAP pattern (`spark.wap.id` staged
  * snapshots) for the lake: a new batch lands as REAL data files with
  * real stats, but in a staged commit main-line readers cannot see;
  * audit queries (row counts, gate metrics, dedup probes) run against
  * the staged overlay; only a passing audit publishes the batch as an
  * atomic OCC commit. The curation use is exactly the reference corpus
  * pipeline's shape: a crawl batch must pass quality/dedup gates BEFORE
  * any training job can list its files — with WAP that invariant is
  * structural, not procedural.
  *
  *  - `stage` writes files through the same promote+stat path as
  *    [[LakeTable.insert]] ([[LakeTable.stageFiles]]) and records them
  *    in `tables/<t>/_wap/<wapId>.json` (create-if-absent, same crash-
  *    safe commit point as log entries). Data is written ONCE: publish
  *    adopts the staged files by path, no rewrite.
  *  - `readStaged` = the current snapshot PLUS the staged adds — the
  *    audit's view. Main readers ([[LakeTable.read]]) never see staged
  *    files because snapshots only list committed adds.
  *  - `publish` commits the staged adds under txn id `wap-<wapId>`
  *    (idempotent: a replayed publish returns the original version) and
  *    removes the staging record. Staged batches are APPEND-ONLY, so a
  *    publish composes with any interleaved main-line commit — the OCC
  *    retry re-bases like every insert.
  *  - `abort` deletes the staged files and the record; a crashed stage
  *    attempt's leftovers age out via VACUUM's `_tmp` sweep plus
  *    [[listStaged]]-driven abort.
  */
object Wap {

  final case class StagedBatch(wap_id: String, base_version: Long,
                               created_ms: Long, adds: Seq[FileAdd])

  private val mapper = JsonMapper.builder()
    .addModule(DefaultScalaModule)
    .serializationInclusion(JsonInclude.Include.NON_ABSENT)
    .build() :: ClassTagExtensions

  private def wapDir(log: LakeLog, table: String): Path =
    log.tableDir(table).resolve("_wap")

  private def wapPath(log: LakeLog, table: String, wapId: String): Path =
    wapDir(log, table).resolve(s"$wapId.json")

  /** Stage `df` as an unpublished batch. Fails if `wapId` is already
    * staged (stage ids are single-use; publish/abort consume them). */
  def stage(spark: SparkSession, log: LakeLog, table: String,
            df: DataFrame, wapId: String, numFiles: Int = 1): StagedBatch = {
    require(wapId.nonEmpty && !wapId.contains('/'), s"bad wap id '$wapId'")
    // an already-PUBLISHED id must replay as a no-op, not restage: the
    // publish txn map is the durable record
    log.committedVersion(table, s"wap-$wapId").foreach(v =>
      throw new LakeValidationException(
        s"wap id '$wapId' was already published as version $v of $table"))
    if (Files.exists(wapPath(log, table, wapId)))
      throw new LakeValidationException(
        s"wap id '$wapId' is already staged on $table (publish or abort it)")
    val adds = LakeTable.stageFiles(spark, log, table, df,
      txnId = s"wap-$wapId", numFiles = numFiles)
    val batch = StagedBatch(wapId, log.latestVersion(table),
      System.currentTimeMillis(), adds)
    val dir = wapDir(log, table)
    Files.createDirectories(dir)
    val staged = Files.createTempFile(dir, ".staged", ".json")
    Files.writeString(staged, mapper.writeValueAsString(batch))
    val target = wapPath(log, table, wapId)
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
        // lost a concurrent stage race for the same id: our files are
        // orphans, the winner's record stands
        LakeTable.discardAdds(adds)
        throw new LakeValidationException(
          s"wap id '$wapId' is already staged on $table (publish or abort it)")
    } finally Files.deleteIfExists(staged)
    batch
  }

  def staged(log: LakeLog, table: String, wapId: String): Option[StagedBatch] = {
    val p = wapPath(log, table, wapId)
    try {
      if (!Files.exists(p)) None
      else Some(mapper.readValue[StagedBatch](Files.readString(p)))
    } catch {
      // a concurrent publish/abort can retire the record between the
      // exists check and the read — same answer as "not staged"; the
      // caller's txn-map fallback resolves what happened to it
      case _: java.nio.file.NoSuchFileException => None
    }
  }

  def listStaged(log: LakeLog, table: String): Seq[StagedBatch] = {
    val dir = wapDir(log, table)
    if (!Files.isDirectory(dir)) return Nil
    val names = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    names.filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json")).sorted
      .flatMap(id => staged(log, table, id))
  }

  /** The audit's view: current committed snapshot + the staged adds. */
  def readStaged(spark: SparkSession, log: LakeLog, table: String,
                 wapId: String): DataFrame = {
    val b = staged(log, table, wapId).getOrElse(
      throw new LakeValidationException(
        s"no staged wap batch '$wapId' on $table"))
    val snap = log.snapshot(table)
    val sch = snap.schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema"))
    val st = LakeTable.toStructType(sch)
    val files = snap.files ++ b.adds
    // per-file partition reattachment whenever ANY file carries logged
    // partition values — legacy files after spec evolution back to flat
    // would otherwise lose them (readFlat fills missing columns as NULL)
    if (sch.partCols.nonEmpty || files.exists(_.partition.nonEmpty))
      LakeTable.readWithPartitions(spark, sch, st, files)
    else LakeTable.readFlat(spark, sch, st, files)
  }

  /** Just the staged batch's rows (no main-line data) — the face an
    * audit gate uses to score the NEW data alone (rate-of-junk checks,
    * schema drift) while [[readStaged]] supplies the overlay for
    * history-relative checks (duplicates against accepted data). */
  def readBatch(spark: SparkSession, log: LakeLog, table: String,
                wapId: String): DataFrame = {
    val b = staged(log, table, wapId).getOrElse(
      throw new LakeValidationException(
        s"no staged wap batch '$wapId' on $table"))
    val snap = log.snapshot(table)
    val sch = snap.schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema"))
    val st = LakeTable.toStructType(sch)
    if (sch.partCols.nonEmpty || b.adds.exists(_.partition.nonEmpty))
      LakeTable.readWithPartitions(spark, sch, st, b.adds)
    else LakeTable.readFlat(spark, sch, st, b.adds)
  }

  /** Publish the staged batch: one OCC commit adopting the staged files.
    * Idempotent — a replay (crash between commit and record removal,
    * client retry) returns the originally committed version. */
  def publish(spark: SparkSession, log: LakeLog, table: String,
              wapId: String, maxAttempts: Int = 3): CommitResult = {
    val txn = s"wap-$wapId"
    log.committedVersion(table, txn) match {
      case Some(v) =>
        Files.deleteIfExists(wapPath(log, table, wapId)) // finish cleanup
        CommitResult(v, duplicate = true)
      case None =>
        val b = staged(log, table, wapId).getOrElse(
          throw new LakeValidationException(
            s"no staged wap batch '$wapId' on $table"))
        val res = log.commitWithRetry(table, txn, maxAttempts)(
          _ => Some((b.adds, Nil))).get
        Files.deleteIfExists(wapPath(log, table, wapId))
        res
    }
  }

  /** Abort: delete the staged files and the staging record. Idempotent
    * (aborting an unknown id is a no-op — the crash-recovery sweep calls
    * this for every leftover id). Refuses to abort a PUBLISHED id: its
    * files are committed table data. */
  def abort(log: LakeLog, table: String, wapId: String): Unit = {
    log.committedVersion(table, s"wap-$wapId").foreach(v =>
      throw new LakeValidationException(
        s"wap id '$wapId' was published as version $v of $table — " +
          "aborting would delete committed data"))
    staged(log, table, wapId).foreach { b =>
      LakeTable.discardAdds(b.adds)
      Files.deleteIfExists(wapPath(log, table, wapId))
    }
  }
}
