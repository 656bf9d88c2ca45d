package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * shape): a check suite compiles into ONE aggregate pass over the data —
  * every check contributes a counter/extremum expression to the same
  * `agg(...)`, so a 100 TB validation costs one scan regardless of how
  * many checks run. The observed values land in a single metadata-sized
  * row; the report is built driver-side from that row (no second pass).
  *
  * Checks are exact by construction (counts, distinct counts, extremes —
  * no sampling), so the report replays bit-for-bit in any engine.
  */
object Validate {

  sealed trait Check { def name: String; def target: String }
  /** No NULLs in `col`. */
  final case class NotNull(col: String) extends Check {
    val name = "not_null"; def target = col }
  /** `col` values are unique (no duplicates). */
  final case class Unique(col: String) extends Check {
    val name = "unique"; def target = col }
  /** Every non-null value within [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check { val name = "in_range"; def target = col }
  /** Every non-null value in the allowed set. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    val name = "in_set"; def target = col }
  /** Every non-null value rlike the pattern. */
  final case class Matches(col: String, pattern: String) extends Check {
    val name = "matches"; def target = col }
  /** Table row count within [lo, hi]. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check {
    val name = "row_count"; def target = "*" }

  /** Violation counter for one check (0 ⇒ pass), except RowCountBetween
    * which observes the row count itself. */
  private def observedExpr(c: Check, idx: Int): Column = (c match {
    case NotNull(col) => count(lit(1)) - count(org.apache.spark.sql
      .functions.col(col))
    case Unique(col) => count(org.apache.spark.sql.functions.col(col)) -
      countDistinct(org.apache.spark.sql.functions.col(col))
    case InRange(col, lo, hi) =>
      val v = org.apache.spark.sql.functions.col(col)
      sum(when(v.isNotNull && (v < lo || v > hi), 1L).otherwise(0L))
    case InSet(col, values) =>
      val v = org.apache.spark.sql.functions.col(col)
      sum(when(v.isNotNull && !v.isin(values: _*), 1L).otherwise(0L))
    case Matches(col, pattern) =>
      val v = org.apache.spark.sql.functions.col(col)
      sum(when(v.isNotNull && !v.rlike(pattern), 1L).otherwise(0L))
    case RowCountBetween(_, _) => count(lit(1))
  }).cast("long").as(s"__c$idx")

  private def passed(c: Check, observed: Long): Boolean = c match {
    case RowCountBetween(lo, hi) => observed >= lo && observed <= hi
    case _ => observed == 0L
  }

  /** Run the suite: (check_name, target, passed, observed) — `observed` is the
    * violation count (or the row count for RowCountBetween). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggd = df.agg(observedExpr(checks.head, 0),
      checks.tail.zipWithIndex.map { case (c, i) =>
        observedExpr(c, i + 1) }: _*)
    val row = aggd.head() // ONE metadata-sized row; the only collect
    val out = checks.zipWithIndex.map { case (c, i) =>
      val obs = if (row.isNullAt(i)) 0L else row.getLong(i)
      Row(c.name, c.target, passed(c, obs), obs)
    }
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(out: _*)),
      StructType(Seq(
        StructField("check_name", StringType, nullable = false),
        StructField("target", StringType, nullable = false),
        StructField("passed", BooleanType, nullable = false),
        StructField("observed", LongType, nullable = false))))
  }
}
