package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent materialized-view answering: a Catalyst optimizer rule
  * that rewrites `SELECT key, count(*)/sum/min/max ... GROUP BY key`
  * over a lake base table into a scan of its [[MaterializedView]] table
  * — the query-rewrite half of IVM that warehouses (Oracle MV rewrite,
  * BigQuery/Snowflake MV auto-routing) pair with incremental refresh,
  * and the reference's full-rescan query plane
  * (`query_planner.go:238-256`) has no analog of. The caller keeps
  * writing the naive aggregate; the optimizer substitutes the
  * O(|MV rows|) read when — and only when — it is PROVABLY the same
  * result:
  *
  *  - the aggregate's child is a pure scan of the MV's base table (any
  *    Filter/Join/expression in between disqualifies — conservative by
  *    construction, through the column-mapping alias projection);
  *  - grouping is exactly the MV's key; every output is the key,
  *    `count(*)`, or sum/min/max of a covered column, with the result
  *    type matching the MV's stored type EXACTLY (no silent casts —
  *    sum-of-long stays unrewritten because the MV stores double sums);
  *  - the scanned snapshot IS the base's latest version AND the MV's
  *    refresh high-water mark equals it (a stale MV never answers).
  *
  * Output attribute exprIds are preserved (each MV column is aliased
  * under the original output's exprId), so operators above the
  * aggregate — HAVING filters, sorts, projections — keep resolving
  * untouched.
  *
  * Installation is session-local and code-driven:
  * `MvRewrite.register(spark, log, defs)` appends the rule to
  * `spark.experimental.extraOptimizations` once and records the
  * session's MV registry (re-registering replaces it). At 100 TB this
  * is the difference between an O(corpus) shuffle per dashboard query
  * and an O(groups) scan the log keeps fresh incrementally.
  */
object MvRewrite {

  final case class Registration(log: LakeLog,
                                defs: Seq[MaterializedView.MvDef])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Registration]()

  def register(spark: SparkSession, log: LakeLog,
               defs: Seq[MaterializedView.MvDef]): Unit = {
    registry.put(spark, Registration(log, defs))
    val installed = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[MvRewriteRule])
    if (!installed)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule(spark)
  }

  def clear(spark: SparkSession): Unit = registry.remove(spark)

  private[lake] def registered(spark: SparkSession): Option[Registration] =
    Option(registry.get(spark))
}

final case class MvRewriteRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    MvRewrite.registered(spark) match {
      case None => plan
      case Some(reg) => plan.transformUp {
        case agg: Aggregate =>
          reg.defs.view.flatMap(d => tryRewrite(agg, reg.log, d))
            .headOption.getOrElse(agg)
      }
    }

  /** Walk the aggregate's child through alias-only projections down to
    * a single lake scan: (table, scanned version, attr → physical
    * column). Any other operator (Filter, Join, computed expression)
    * returns None — the rewrite must be provably result-identical. */
  private def scanInfo(p: LogicalPlan)
      : Option[(String, Long, Map[ExprId, String])] = p match {
    case SubqueryAlias(_, c) => scanInfo(c)
    case Project(list, c) =>
      scanInfo(c).flatMap { case (t, v, m) =>
        val mapped = list.map {
          case a: AttributeReference =>
            m.get(a.exprId).map(n => a.exprId -> n)
          case al @ Alias(ar: AttributeReference, _) =>
            m.get(ar.exprId).map(n => al.exprId -> n)
          case _ => None
        }
        if (mapped.contains(None)) None
        else Some((t, v, mapped.flatten.toMap))
      }
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case lfi: LakeFileIndex =>
          Some((lfi.tableName, lfi.tableVersion,
            lr.output.map(a => a.exprId -> a.name).toMap))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate, log: LakeLog,
                         d: MaterializedView.MvDef): Option[LogicalPlan] =
    for {
      (table, version, attrPhys) <- scanInfo(agg.child)
      if table == d.base
      // freshness: the query scans the base's LATEST version and the
      // MV's refresh high-water mark equals it
      if version == log.latestVersion(d.base)
      if MaterializedView.lastRefreshed(log, d) == version
      sch <- log.snapshot(d.base).schema
      physToLogical = sch.fields.map(f => sch.physFor(f.name) -> f.name).toMap
      colOf = (a: Attribute) =>
        attrPhys.get(a.exprId).flatMap(physToLogical.get)
      groupAttr <- agg.groupingExpressions match {
        case Seq(ga: Attribute) if colOf(ga).contains(d.keyCol) => Some(ga)
        case _ => None
      }
      mvPlan = LakeTable.readIndexed(spark, log, d.name)
        .queryExecution.analyzed
      mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      outs <- traverse(agg.aggregateExpressions) {
        case a: Attribute if a.exprId == groupAttr.exprId =>
          Some(Alias(mvAttr(d.keyCol), a.name)(exprId = a.exprId))
        case al @ Alias(ar: Attribute, name)
            if ar.exprId == groupAttr.exprId =>
          Some(Alias(mvAttr(d.keyCol), name)(exprId = al.exprId))
        case al @ Alias(AggregateExpression(f, _, false, None, _), name) =>
          val target = f match {
            case Count(Seq(Literal(_, _))) => Some("n_rows")
            case s: Sum => s.child match {
              case c: Attribute =>
                colOf(c).filter(d.sumCols.contains).map(n => s"sum_$n")
              case _ => None
            }
            case mn: Min => mn.child match {
              case c: Attribute =>
                colOf(c).filter(d.minCols.contains).map(n => s"min_$n")
              case _ => None
            }
            case mx: Max => mx.child match {
              case c: Attribute =>
                colOf(c).filter(d.maxCols.contains).map(n => s"max_$n")
              case _ => None
            }
            case _ => None
          }
          target.flatMap(mvAttr.get)
            .filter(_.dataType == al.dataType) // exact type or no rewrite
            .map(attr => Alias(attr, name)(exprId = al.exprId))
        case _ => None
      }
    } yield Project(outs, mvPlan)

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.contains(None)) None else Some(out.flatten)
  }
}
