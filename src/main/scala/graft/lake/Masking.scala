package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

/** Column masking policies — the governance face beside [[Redact]]
  * (PII span scrubbing in the data), [[graft.operators.Anonymize]]
  * (k-anon/l-div/t-close release gates) and [[Forget]] (erasure):
  * masks rewrite columns AT READ TIME per caller role, so one physical
  * table serves both the privileged pipeline and the restricted
  * analyst without copying data — Snowflake/Databricks column-mask
  * semantics on lake primitives.
  *
  * A policy is (column → mask SQL expression, exempt roles). Policies
  * persist as a VERSIONED mini-log under `_masks/` beside the table
  * (versionless with respect to table time travel, like `_wap` staging
  * records — masks govern READS and are deliberately not part of
  * time-travelable table state: revoking a mask must never be undone
  * by reading an old snapshot). Every mutation is OCC over that
  * mini-log with the lake's own commit device — stage a temp file,
  * link(2) it to the next version number, retry on EEXIST — so:
  *
  *  - a crash mid-write leaves only an invisible temp file, never a
  *    truncated policy (the commit point is the atomic link);
  *  - two concurrent mutators (two SET MASKs on different columns,
  *    even from different PROCESSES) serialize through version-number
  *    collisions and both land — a lost mask update would be a silent
  *    data-exposure event, the one failure mode a governance control
  *    must not have;
  *  - reads FAIL CLOSED: an unparseable newest policy entry refuses
  *    masked reads with a governance error instead of crashing with a
  *    JSON stack trace or — worse — falling back to an older, more
  *    permissive policy.
  *
  * ALL mask expressions are applied against the RAW row in one
  * projection: a mask referencing another masked column sees the raw
  * value regardless of policy file order (order-independent by
  * construction, not by the accident of install sequence).
  *
  * Scale shape: masking is a projection — zero extra shuffles, codegen
  * inlines the mask expressions into the scan's project, and column
  * pruning/file skipping on UNMASKED columns are untouched.
  */
object Masking {

  final case class Mask(column: String, expr: String,
                        exempt_roles: Seq[String] = Nil)
  final case class Policy(masks: Seq[Mask])

  private val mapper = JsonMapper.builder()
    .addModule(DefaultScalaModule).build() :: ClassTagExtensions

  private def masksDir(log: LakeLog, table: String): Path =
    log.tableDir(table).resolve("_masks")

  private def entryPath(log: LakeLog, table: String, v: Long): Path =
    masksDir(log, table).resolve(f"$v%020d.json")

  /** Pre-mini-log location (single mutable file) — read-only fallback so
    * policies written by older builds keep governing reads. */
  private def legacyPath(log: LakeLog, table: String): Path =
    log.tableDir(table).resolve("_masks.json")

  /** Newest committed policy version, 0 when none. */
  private def currentVersion(log: LakeLog, table: String): Long = {
    val dir = masksDir(log, table)
    if (!Files.isDirectory(dir)) return 0L
    val s = Files.list(dir)
    val names = try s.iterator()
    catch { case e: Throwable => s.close(); throw e }
    try {
      var max = 0L
      names.forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".json") && !n.startsWith("."))
          try max = math.max(max, n.stripSuffix(".json").toLong)
          catch { case _: NumberFormatException => }
      }
      max
    } finally s.close()
  }

  private def parseOrFailClosed(table: String, p: Path): Policy =
    try mapper.readValue[Policy](Files.readString(p))
    catch {
      case e: Exception =>
        // fail CLOSED: an unreadable policy must refuse reads, never
        // crash opaquely or silently serve raw/stale-masked data
        throw new LakeValidationException(
          s"mask policy for table $table is unreadable ($p: " +
            s"${e.getMessage}) — refusing masked reads until an " +
            "operator repairs or re-sets the policy (fail-closed)")
    }

  /** Install or replace the mask for one column. Validates the column
    * exists and the mask expression preserves its type; commits via the
    * OCC mini-log so concurrent mutators (any process) never lose each
    * other's policies. */
  def setMask(spark: SparkSession, log: LakeLog, table: String,
              column: String, maskExpr: String,
              exemptRoles: Seq[String] = Nil): Unit = {
    val sch = log.snapshot(table).schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema"))
    if (!sch.fields.exists(_.name == column))
      throw new LakeValidationException(
        s"table $table has no column $column")
    val st = LakeTable.toStructType(sch)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    val masked = try empty.withColumn(column, expr(maskExpr))
    catch { case e: Exception => throw new LakeValidationException(
      s"mask for $table.$column does not analyze: ${e.getMessage}") }
    val orig = st(column).dataType
    val got = masked.schema(column).dataType
    if (got != orig)
      throw new LakeValidationException(
        s"mask for $table.$column changes its type ($orig → $got) — " +
          "masked reads must be drop-in for consumers")
    mutate(log, table) { cur =>
      Policy(cur.masks.filterNot(_.column == column) :+
        Mask(column, maskExpr, exemptRoles))
    }
  }

  def dropMask(log: LakeLog, table: String, column: String): Unit =
    mutate(log, table) { cur =>
      Policy(cur.masks.filterNot(_.column == column))
    }

  /** OCC read-modify-write: read the newest policy, transform, commit as
    * version N+1 with link(2) create-if-absent. EEXIST means another
    * mutator won version N+1 — re-read THEIR policy and reapply `f`, so
    * no concurrent update is ever lost (the exact discipline of
    * [[LakeLog.commitWithRetry]], scoped to the policy mini-log). */
  private def mutate(log: LakeLog, table: String)(f: Policy => Policy)
      : Unit = {
    val dir = masksDir(log, table)
    Files.createDirectories(dir)
    var attempts = 0
    while (true) {
      attempts += 1
      val base = currentVersion(log, table)
      val next = f(policy(log, table))
      val staged = Files.createTempFile(dir, ".staged", ".json")
      try {
        Files.writeString(staged, mapper.writeValueAsString(next))
        try {
          try Files.createLink(entryPath(log, table, base + 1), staged)
          catch {
            case e: java.nio.file.FileAlreadyExistsException => throw e
            case _: UnsupportedOperationException
                 | _: java.nio.file.FileSystemException =>
              // linkless filesystem fallback (single-process-safe there,
              // same caveat as LakeLog.writeEntry)
              val target = entryPath(log, table, base + 1)
              if (Files.exists(target))
                throw new java.nio.file.FileAlreadyExistsException(
                  target.toString)
              Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
          }
          return
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            if (attempts >= 100)
              throw new LakeValidationException(
                s"mask policy on $table: lost $attempts OCC races in a " +
                  "row — giving up")
            // lost the race: loop re-reads the winner's policy and
            // reapplies f on top of it
        }
      } finally Files.deleteIfExists(staged)
    }
  }

  /** The governing policy: newest mini-log entry, else the legacy
    * single-file location, else empty. Unparseable files fail closed. */
  def policy(log: LakeLog, table: String): Policy = {
    val v = currentVersion(log, table)
    if (v > 0L) parseOrFailClosed(table, entryPath(log, table, v))
    else {
      val legacy = legacyPath(log, table)
      if (Files.exists(legacy)) parseOrFailClosed(table, legacy)
      else Policy(Nil)
    }
  }

  /** The role-gated read: every mask whose exempt list does not carry
    * `role` rewrites its column; exempt roles read raw. All masks are
    * built against the RAW scan in ONE projection, so a mask expression
    * referencing another masked column sees the raw value (policy-order
    * independence). Projection only — pruning and stats skipping on
    * other columns unchanged. */
  def readMasked(spark: SparkSession, log: LakeLog, table: String,
                 role: String, version: Long = 0L): DataFrame = {
    val base = LakeTable.readIndexed(spark, log, table, version)
    val active = policy(log, table).masks
      .filterNot(_.exempt_roles.contains(role))
      .map(m => m.column -> m.expr).toMap
    if (active.isEmpty) base
    else base.select(base.columns.map(c =>
      active.get(c).map(e => expr(e).as(c)).getOrElse(col(c))).toSeq: _*)
  }
}
