package graft.lake

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

/** Row-level security policies — the row half of the governance pair
  * whose column half is [[Masking]] (Snowflake row access policies /
  * Databricks ROW FILTER semantics on lake primitives): one boolean SQL
  * predicate per table decides WHICH ROWS a non-exempt caller sees, so
  * one physical table serves per-tenant / per-region / need-to-know
  * slices without copies or views-per-role.
  *
  * The policy is (filter SQL expression over the table's raw columns,
  * exempt roles), persisted in a `_rowfilters/` [[PolicyLog]] mini-log —
  * the same crash/race discipline as masks (OCC link(2) commits, torn
  * newest entry FAILS CLOSED refusing non-exempt reads; a lost filter
  * update or a fallback to an older, more permissive filter would be a
  * data-exposure event). Like masks, row filters are deliberately NOT
  * time-travelable table state: revoking access must never be undone by
  * reading an old snapshot.
  *
  * The filter sees RAW column values (it runs BEFORE masking in
  * [[readGoverned]] — a policy like `region = 'EU'` must not be judged
  * on masked regions), and exactly because of that, its output columns
  * are then masked for the same role: filter decides membership, masks
  * decide appearance.
  *
  * Scale shape: a row filter is one `Filter` node over the scan — it
  * PUSHES DOWN like any predicate (file skipping via min/max stats,
  * partition pruning if the filter hits a partition column), adds zero
  * shuffles, and composes with pruning on every other column.
  */
object RowFilter {

  final case class RowPolicy(expr: String, exempt_roles: Seq[String] = Nil)

  private val mapper = JsonMapper.builder()
    .addModule(DefaultScalaModule).build() :: ClassTagExtensions

  private def dir(log: LakeLog, table: String): Path =
    log.tableDir(table).resolve("_rowfilters")

  private def parseOrFailClosed(table: String, p: Path): Option[RowPolicy] =
    try {
      val pol = mapper.readValue[RowPolicy](Files.readString(p))
      // an entry with an empty expr is the tombstone DROP writes
      if (pol.expr.isEmpty) None else Some(pol)
    } catch {
      case e: Exception =>
        throw new LakeValidationException(
          s"row filter for table $table is unreadable ($p: " +
            s"${e.getMessage}) — refusing governed reads until an " +
            "operator repairs or re-sets the policy (fail-closed)")
    }

  /** Retention sweep over the `_rowfilters/` mini-log
    * ([[PolicyLog.vacuum]]): entries older than the newest `keep` go;
    * the governing filter, the commit point and fail-closed reads are
    * untouched. */
  def vacuumPolicyLog(log: LakeLog, table: String, keep: Int = 8): Int =
    PolicyLog.vacuum(dir(log, table), keep)

  /** Install or replace the table's row filter. Validates the predicate
    * analyzes against the schema and is BooleanType. */
  def setFilter(spark: SparkSession, log: LakeLog, table: String,
                filterExpr: String,
                exemptRoles: Seq[String] = Nil): Unit = {
    val sch = log.snapshot(table).schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema"))
    val st = LakeTable.toStructType(sch)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    val analyzed = try empty.select(expr(filterExpr).as("__rf"))
    catch { case e: Exception => throw new LakeValidationException(
      s"row filter for $table does not analyze: ${e.getMessage}") }
    if (analyzed.schema("__rf").dataType != BooleanType)
      throw new LakeValidationException(
        s"row filter for $table must be BOOLEAN, got " +
          s"${analyzed.schema("__rf").dataType} — a non-boolean " +
          "predicate would silently admit every row")
    if (filterExpr.trim.isEmpty)
      throw new LakeValidationException(
        s"row filter for $table is empty — use dropFilter to remove")
    PolicyLog.commit(s"row filter on $table", dir(log, table)) { () =>
      mapper.writeValueAsString(RowPolicy(filterExpr.trim, exemptRoles))
    }
  }

  def dropFilter(log: LakeLog, table: String): Unit =
    PolicyLog.commit(s"row filter on $table", dir(log, table)) { () =>
      mapper.writeValueAsString(RowPolicy("", Nil)) // tombstone
    }

  /** The governing filter, None when never set or dropped. Unparseable
    * newest entry fails closed. */
  def policy(log: LakeLog, table: String): Option[RowPolicy] =
    PolicyLog.readNewest(dir(log, table))
      .flatMap(p => parseOrFailClosed(table, p))

  /** The role-gated row slice: non-exempt roles see only rows where the
    * predicate holds (NULL predicate = row hidden, standard WHERE
    * semantics — fail closed on unknown); exempt roles see every row. */
  def readFiltered(spark: SparkSession, log: LakeLog, table: String,
                   role: String, version: Long = 0L): DataFrame = {
    val base = LakeTable.readIndexed(spark, log, table, version)
    policy(log, table) match {
      case Some(p) if !p.exempt_roles.contains(role) => base.filter(expr(p.expr))
      case _ => base
    }
  }

  /** The full governed read — row filter FIRST (judged on raw values),
    * then column masks ([[Masking.applyMasks]]): filter decides
    * membership, masks decide appearance. This is the face a serving
    * layer should put in front of untrusted roles. */
  def readGoverned(spark: SparkSession, log: LakeLog, table: String,
                   role: String, version: Long = 0L): DataFrame =
    Masking.applyMasks(
      readFiltered(spark, log, table, role, version),
      Masking.policy(log, table), role)
}
