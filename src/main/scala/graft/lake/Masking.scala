package graft.lake

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
  * persist as `_masks.json` beside the table (versionless policy
  * metadata, like `_wap` staging records — masks govern READS and are
  * deliberately not part of time-travelable table state: revoking a
  * mask must never be undone by reading an old snapshot). The mask
  * expression sees the raw column and must yield the SAME type (the
  * read face validates), so masked reads are drop-in for consumers.
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

  private def path(log: LakeLog, table: String) =
    log.tableDir(table).resolve("_masks.json")

  /** Install or replace the mask for one column. Validates the column
    * exists and the mask expression preserves its type. */
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
    val cur = policy(log, table).masks.filterNot(_.column == column)
    val next = Policy(cur :+ Mask(column, maskExpr, exemptRoles))
    java.nio.file.Files.createDirectories(path(log, table).getParent)
    java.nio.file.Files.writeString(path(log, table),
      mapper.writeValueAsString(next))
  }

  def dropMask(log: LakeLog, table: String, column: String): Unit = {
    val cur = policy(log, table).masks.filterNot(_.column == column)
    java.nio.file.Files.writeString(path(log, table),
      mapper.writeValueAsString(Policy(cur)))
  }

  def policy(log: LakeLog, table: String): Policy = {
    val p = path(log, table)
    if (!java.nio.file.Files.exists(p)) Policy(Nil)
    else mapper.readValue[Policy](java.nio.file.Files.readString(p))
  }

  /** The role-gated read: every mask whose exempt list does not carry
    * `role` rewrites its column; exempt roles read raw. Projection
    * only — pruning and stats skipping on other columns unchanged. */
  def readMasked(spark: SparkSession, log: LakeLog, table: String,
                 role: String, version: Long = 0L): DataFrame = {
    val base = LakeTable.readIndexed(spark, log, table, version)
    policy(log, table).masks.foldLeft(base) { (df, m) =>
      if (m.exempt_roles.contains(role)) df
      else df.withColumn(m.column, expr(m.expr))
    }
  }
}
