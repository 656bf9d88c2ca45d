package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction from a query's analyzed plan — the
  * governance answer to "which physical columns can influence this
  * output column": every output attribute resolves transitively through
  * projections, aggregates, joins, windows, generators and unions down
  * to leaf scan columns, tagged with the scanned source (the lake
  * table's name via [[graft.lake.LakeFileIndex]], or the scan
  * directory's base name for plain file relations).
  *
  * The walk is deliberately CONSERVATIVE (dependency closure, not
  * minimal slices): an expression's lineage is the union of its
  * attribute references, a union/intersect/except merges positionally,
  * and a generator's outputs inherit the generator's inputs. Filter /
  * sort / limit do not ADD column lineage (they gate rows, not values)
  * — the standard dataflow-lineage convention (OpenLineage's column
  * facet does the same); callers wanting control-flow taint can union
  * in the filter columns themselves.
  *
  * Plan-sized work on the driver — this reads plan metadata, never
  * data, so it prices like EXPLAIN at any corpus size.
  */
object Lineage {

  /** (out_col, src_table, src_col) rows, distinct + sorted. */
  def columnLineage(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val plan = df.queryExecution.analyzed
    val lin = lineageOf(plan)
    val rows = plan.output.flatMap { out =>
      lin.getOrElse(out.exprId, Set.empty).toSeq
        .map { case (t, c) => (out.name, t, c) }
    }.distinct.sortBy(identity)
    rows.toDF("out_col", "src_table", "src_col")
  }

  private type Lin = Map[ExprId, Set[(String, String)]]

  private def sourceName(lr: LogicalRelation): String = lr.relation match {
    case h: HadoopFsRelation => h.location match {
      case i: graft.lake.LakeFileIndex => i.tableName
      case loc =>
        // plain file scans: the scanned path's base name sans extension
        // (".../lineitem.parquet" → "lineitem")
        loc.rootPaths.headOption.map { p =>
          val n = p.getName
          if (n.contains(".")) n.substring(0, n.lastIndexOf('.')) else n
        }.getOrElse("files")
    }
    case other => other.getClass.getSimpleName
  }

  private def exprRefs(e: Expression, childLin: Lin): Set[(String, String)] =
    e.references.toSeq.flatMap(a =>
      childLin.getOrElse(a.exprId, Set.empty)).toSet

  private def lineageOf(p: LogicalPlan): Lin = p match {
    case lr: LogicalRelation =>
      val src = sourceName(lr)
      lr.output.map(a => a.exprId -> Set(src -> a.name)).toMap
    case l: LeafNode =>
      // LocalRelation, ranges, etc: literals/in-memory — no source
      l.output.map(a => a.exprId -> Set.empty[(String, String)]).toMap
    case g: Generate =>
      // explode/posexplode etc: every generator output inherits the
      // generator's inputs
      val childLin = lineageOf(g.child)
      childLin ++
        g.generatorOutput.map(a =>
          a.exprId -> exprRefs(g.generator, childLin)).toMap
    case u: Union =>
      // positional merge across all children
      val kids = u.children.map(c => (lineageOf(c), c.output))
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> kids.flatMap { case (lin, cols) =>
          if (i < cols.length) lin.getOrElse(cols(i).exprId, Set.empty)
          else Set.empty[(String, String)]
        }.toSet
      }.toMap
    case _ =>
      val childLin: Lin =
        p.children.map(lineageOf).foldLeft(Map.empty: Lin)(_ ++ _)
      val fromNamed: Lin = p.expressions.flatMap(collectNamed).map {
        case a: Alias => a.exprId -> exprRefs(a.child, childLin)
        case ne: NamedExpression =>
          ne.exprId -> childLin.getOrElse(ne.exprId,
            exprRefs(ne, childLin))
      }.toMap
      childLin ++ fromNamed
  }

  private def collectNamed(e: Expression): Seq[NamedExpression] =
    e match {
      case ne: NamedExpression => ne +: e.children.flatMap(collectNamed)
      case _ => e.children.flatMap(collectNamed)
    }
}
