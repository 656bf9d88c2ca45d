package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-query parity layer.
  *
  * Re-expresses the reference's only fully-implemented query path — the
  * structured `POST /queries` API (`pkg/coordinator/rest_api.go:328-367` →
  * `pkg/coordinator/query_planner.go:110-212` → the worker operator dispatch at
  * `worker/src/task_executor.rs:112-148`) — as one declarative DataFrame plan.
  * Stage planning, two-phase aggregation, shuffle, retries and manifests all
  * collapse into Catalyst + the DAG scheduler.
  *
  * Divergences from the reference (intended semantics, see SURVEY.md §2.4):
  *   - aggregate outputs keep their natural Spark types instead of Float64;
  *   - AVG really divides by count; MIN/MAX have no 0.0 sentinel bug;
  *   - group keys keep their native types instead of being stringified.
  */
object QueryEngine {

  /** One aggregate, mirroring `proto/common.proto:23-27`:
    * function ∈ {count,sum,avg,min,max}, column "*" allowed for count.
    */
  final case class AggregateSpec(function: String, column: String,
                                 alias: Option[String] = None) {
    /** Reference output naming: alias if given else `{fn}_{col}`
      * (`worker/src/task_executor.rs:650-653`). */
    def outputName: String = alias.getOrElse(s"${function}_$column")
  }

  /** The reference's `SimpleQuery` (`pkg/coordinator/query_planner.go:93-108`):
    * single table, optional single predicate, optional projection, optional
    * GROUP BY + aggregates, optional LIMIT (reader supports it, see
    * `worker/src/parquet_reader.rs:45,122-134`).
    */
  final case class SimpleQuery(
      table: String,
      filter: Option[String] = None,
      projection: Seq[String] = Nil,
      groupBy: Seq[String] = Nil,
      aggregates: Seq[AggregateSpec] = Nil,
      limit: Option[Int] = None)

  /** Parse the reference's 3-token predicate grammar
    * (`worker/src/task_executor.rs:474-516`): `<col> <op> <literal>` with ops
    * `= == > < >= <= != <>`; literal inference = quoted string, else
    * i64 → f64 → bool. Anything richer falls through to Spark SQL `expr`
    * (a strict superset, documented as an extension).
    */
  def parsePredicate(s: String): Column = {
    val parts = s.trim.split("\\s+", 3)
    // the grammar is EXACTLY three tokens (task_executor.rs:478-480): a
    // multi-token tail like "100 AND x >= 2" is not a literal — fall through
    // to the SQL-expression extension instead of mis-parsing.
    def literalIsOneToken = {
      val t = parts(2).trim
      val quoted = t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') ||
          (t.head == '"' && t.last == '"'))
      quoted || !t.exists(_.isWhitespace)
    }
    if (parts.length == 3 && Ops.contains(parts(1)) && literalIsOneToken) {
      val c = col(parts(0))
      val v = inferLiteral(parts(2))
      parts(1) match {
        case "=" | "==" => c === v
        case "!=" | "<>" => c =!= v
        case ">" => c > v
        case "<" => c < v
        case ">=" => c >= v
        case "<=" => c <= v
      }
    } else expr(s)
  }

  private val Ops = Set("=", "==", ">", "<", ">=", "<=", "!=", "<>")

  /** Literal inference per `worker/src/task_executor.rs:488-501`:
    * quoted → string; else i64; else f64; else bool; else raw string.
    * Extension over the reference grammar: inside a quoted literal a
    * doubled delimiter decodes to one (`'O''Brien'` → `O'Brien`, SQL's
    * escape) — what lets callers like [[graft.lake.Forget]] render any
    * string value safely. */
  private[operators] def inferLiteral(raw: String): Column = {
    val t = raw.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      lit(t.substring(1, t.length - 1)
        .replace(s"${t.head}${t.head}", s"${t.head}"))
    else t.toLongOption.map(lit)
      .orElse(t.toDoubleOption.map(lit))
      .orElse(t.toBooleanOption.map(lit))
      .getOrElse(lit(t))
  }

  /** Aggregate spec → Spark function. COUNT(*) via column "*"
    * (`worker/src/task_executor.rs:43-67`). */
  def aggColumn(a: AggregateSpec): Column = {
    val in = if (a.column == "*") lit(1) else col(a.column)
    val f = a.function.toLowerCase match {
      case "count" => count(in)
      case "sum"   => sum(in)
      case "avg"   => avg(in)
      case "min"   => min(in)
      case "max"   => max(in)
      case other   => throw new IllegalArgumentException(
        s"unsupported aggregate function: $other")
    }
    f.as(a.outputName)
  }

  /** Execute a SimpleQuery against an already-resolved table DataFrame.
    *
    * Operator selection mirrors `determineMapOperation`
    * (`pkg/coordinator/query_planner.go:259-273`): aggregates → agg, else
    * filter → filter(+project), else projection → project, else scan.
    * Aggregate results are ordered by group key for determinism, matching the
    * reference's lexicographic group sort (`task_executor.rs:661-663`).
    */
  def run(df: DataFrame, q: SimpleQuery): DataFrame = {
    val filtered = q.filter.fold(df)(f => df.filter(parsePredicate(f)))
    val shaped =
      if (q.aggregates.nonEmpty) {
        val aggs = q.aggregates.map(aggColumn)
        val grouped =
          if (q.groupBy.nonEmpty)
            filtered.groupBy(q.groupBy.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
              .orderBy(q.groupBy.map(col): _*)
          else filtered.agg(aggs.head, aggs.tail: _*)
        grouped
      } else if (q.projection.nonEmpty)
        filtered.select(q.projection.map(col): _*)
      else filtered
    q.limit.fold(shaped)(shaped.limit)
  }
}
