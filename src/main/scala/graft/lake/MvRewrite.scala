package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Transparent materialized-view answering: a Catalyst optimizer rule
  * that rewrites `SELECT keys, count(*)/sum/avg/min/max ... [WHERE
  * <key-only predicate>] GROUP BY keys` over a lake base table into a
  * scan of its [[MaterializedView]] table — the query-rewrite half of
  * IVM that warehouses (Oracle MV rewrite, BigQuery/Snowflake MV
  * auto-routing) pair with incremental refresh, and the reference's
  * full-rescan query plane (`query_planner.go:238-256`) has no analog
  * of. The caller keeps writing the naive aggregate; the optimizer
  * substitutes the O(|MV rows|) read when — and only when — it is
  * PROVABLY the same result:
  *
  *  - the aggregate's child is a scan of the MV's base table, possibly
  *    under alias-only projections and deterministic Filters whose
  *    every reference is a GROUP KEY column (a key-only predicate
  *    partitions whole groups, so it commutes with the grouping: it is
  *    re-applied over the MV's stored key columns). Any other operator
  *    or any filter touching a non-key column disqualifies —
  *    conservative by construction;
  *  - grouping covers the MV's key set exactly (direct substitution: a
  *    Project over the MV scan) or a STRICT SUBSET of it, including
  *    none (ROLLUP: an Aggregate re-aggregating the MV — sum of sums,
  *    sum of counts, min of mins, total-sum/total-count avg — the
  *    dashboard-hierarchy query, O(|MV rows|) instead of O(corpus));
  *    every output is a grouped key, `count(*)`, sum/min/max of a
  *    covered column (result type matching the MV's stored type
  *    EXACTLY — no silent casts; sum-of-long stays unrewritten because
  *    the MV stores double sums), or `avg` of a covered sum column when
  *    the query's avg is DoubleType — answered as `sum_c / n_rows`, the
  *    same IEEE division Spark's Average finalizes with over the same
  *    double partial sum;
  *  - the scanned snapshot IS the base's latest version AND the MV's
  *    refresh high-water mark equals it (a stale MV never answers);
  *    the MV is then read AT THE SNAPSHOT whose refresh commit folded
  *    exactly that base version ([[MaterializedView.refreshVersionAt]])
  *    — never "latest", which could tear if a base-commit + refresh
  *    lands between the freshness check and the read.
  *
  * Output attribute exprIds are preserved (each MV column is aliased
  * under the original output's exprId), so operators above the
  * aggregate — HAVING filters, sorts, projections — keep resolving
  * untouched.
  *
  * Installation is session-local and code-driven:
  * `MvRewrite.register(spark, log, defs)` appends the rule to
  * `spark.experimental.extraOptimizations` once and records the
  * session's MV registry (re-registering replaces it; `clear` removes
  * BOTH the registration and the installed rule). The registry holds
  * sessions by WEAK reference, so a stopped-and-dropped session's
  * Registration is collectable — no leak in a server reusing the JVM
  * across many sessions. At 100 TB this rewrite is the difference
  * between an O(corpus) shuffle per dashboard query and an O(groups)
  * scan the log keeps fresh incrementally.
  */
object MvRewrite {

  final case class Registration(log: LakeLog,
                                defs: Seq[MaterializedView.MvDef])

  // weak keys: a session that is stopped and dropped by the caller must
  // not pin its Registration (or the LakeLog it holds) forever
  private val registry = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, Registration]())

  def register(spark: SparkSession, log: LakeLog,
               defs: Seq[MaterializedView.MvDef]): Unit = {
    registry.put(spark, Registration(log, defs))
    val installed = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[MvRewriteRule])
    if (!installed)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule(spark)
  }

  /** Remove the registration AND the installed rule (the rule is also
    * no-op-cheap while unregistered, but a cleared session should not
    * keep paying even the registry probe per plan). */
  def clear(spark: SparkSession): Unit = {
    registry.remove(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[MvRewriteRule])
  }

  private[lake] def registered(spark: SparkSession): Option[Registration] =
    Option(registry.get(spark))

  private[lake] def registrySize: Int = registry.size()
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

  /** Walk the aggregate's child through alias-only projections and
    * deterministic Filters down to a single lake scan: (table, scanned
    * version, attr → physical column, filter conditions). The attr map
    * is the UNION across levels, so a filter's references resolve no
    * matter which side of a projection it sits on. Any other operator
    * (Join, Generate, computed projection) returns None — the rewrite
    * must be provably result-identical. */
  private def scanInfo(p: LogicalPlan)
      : Option[(String, Long, Map[ExprId, String], Seq[Expression])] =
    p match {
      case SubqueryAlias(_, c) => scanInfo(c)
      case Filter(cond, c) if cond.deterministic =>
        scanInfo(c).map { case (t, v, m, fs) => (t, v, m, fs :+ cond) }
      case Project(list, c) =>
        scanInfo(c).flatMap { case (t, v, m, fs) =>
          val mapped = list.map {
            case a: AttributeReference =>
              m.get(a.exprId).map(n => a.exprId -> n)
            case al @ Alias(ar: AttributeReference, _) =>
              m.get(ar.exprId).map(n => al.exprId -> n)
            case _ => None
          }
          if (mapped.contains(None)) None
          else Some((t, v, m ++ mapped.flatten.toMap, fs))
        }
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case lfi: LakeFileIndex =>
            Some((lfi.tableName, lfi.tableVersion,
              lr.output.map(a => a.exprId -> a.name).toMap, Nil))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def tryRewrite(agg: Aggregate, log: LakeLog,
                         d: MaterializedView.MvDef): Option[LogicalPlan] =
    if (d.joinTable.isEmpty) tryRewriteSingle(agg, log, d)
    else tryRewriteJoin(agg, log, d)

  private def tryRewriteSingle(agg: Aggregate, log: LakeLog,
                               d: MaterializedView.MvDef)
      : Option[LogicalPlan] =
    for {
      (table, version, attrPhys, filters) <- scanInfo(agg.child)
      if table == d.base
      // freshness: the query scans the base's LATEST version and the
      // MV's refresh high-water mark equals it
      if version == log.latestVersion(d.base)
      if MaterializedView.lastRefreshed(log, d) == version
      // pin the MV read to the refresh commit that folded `version` —
      // NOT latest (a racing base-commit + refresh would tear)
      mvVersion <- MaterializedView.refreshVersionAt(log, d, version)
      sch <- log.snapshot(d.base).schema
      physToLogical = sch.fields.map(f => sch.physFor(f.name) -> f.name).toMap
      colOf = (a: Attribute) =>
        attrPhys.get(a.exprId).flatMap(physToLogical.get)
      plan <- buildRewrite(agg, log, d, colOf, filters, mvVersion)
    } yield plan

  /** Join-MV rewrite, for the PROVABLE case only: a GROUP BY over the
    * MV's key columns (exact set or a rollup subset) on exactly
    * `fact ⋈_joinOn dim` (inner equi-join, both sides bare lake scans),
    * when the MV is fresh on BOTH tables — the fact high-water mark AND
    * the folded dim version both equal the scanned latest versions, and
    * the MV is read at the refresh commit that folded exactly that
    * (factV, dimV) pair. The MV stores the joined-row aggregate, so the
    * same O(|MV|)-never-O(corpus) substitution argument transfers
    * verbatim; anything beyond this shape (outer joins, extra
    * operators, a second join, non-key filters) keeps the conservative
    * refusal and the MV stays readable by name. `isnotnull(joinOn)`
    * filters the optimizer infers from the inner equi-join are implied
    * no-ops over the join result and are accepted-and-dropped (the join
    * key need not be an MV column). */
  private def tryRewriteJoin(agg: Aggregate, log: LakeLog,
                             d: MaterializedView.MvDef)
      : Option[LogicalPlan] = {
    val dimT = d.joinTable.get
    val on = d.joinOn.getOrElse(return None)
    for {
      (lt, lv, rt, rv, sides, jk, filters) <- joinScan(agg.child)
      // accept either join order; resolve which side is the fact
      factIsLeft <- if (lt == d.base && rt == dimT) Some(true)
        else if (lt == dimT && rt == d.base) Some(false) else None
      factV = if (factIsLeft) lv else rv
      dimV = if (factIsLeft) rv else lv
      // freshness on BOTH tables: scanned latest == folded versions
      if factV == log.latestVersion(d.base)
      if dimV == log.latestVersion(dimT)
      if MaterializedView.lastRefreshed(log, d) == factV
      if MaterializedView.lastDimVersion(log, d) == dimV
      mvVersion <- MaterializedView.refreshVersionAt(log, d, factV, dimV)
      factSch <- log.snapshot(d.base).schema
      dimSch <- log.snapshot(dimT).schema
      factP2L = factSch.fields
        .map(f => factSch.physFor(f.name) -> f.name).toMap
      dimP2L = dimSch.fields
        .map(f => dimSch.physFor(f.name) -> f.name).toMap
      colOf = (a: Attribute) => sides.get(a.exprId).flatMap {
        case (isLeft, phys) =>
          if (isLeft == factIsLeft) factP2L.get(phys) else dimP2L.get(phys)
      }
      // the join condition must be exactly fact.joinOn = dim.joinOn
      sideOf = (id: ExprId) => sides.get(id).map(_._1)
      nameOf = (id: ExprId) => sides.get(id).flatMap {
        case (isLeft, phys) =>
          if (isLeft == factIsLeft) factP2L.get(phys) else dimP2L.get(phys)
      }
      if nameOf(jk._1).contains(on) && nameOf(jk._2).contains(on)
      if sideOf(jk._1) != sideOf(jk._2)
      // isnotnull(joinOn) pushdowns are implied by the inner equi-join —
      // drop them; everything else must pass the key-only filter proof.
      // Split CONJUNCTS first: the optimizer folds a pushed key filter
      // and its inferred isnotnulls into one AND tree (`(isnotnull(k)
      // AND k <> 'x') AND isnotnull(joinOn)`), and the joinOn conjunct
      // buried inside would otherwise poison the whole filter (a
      // conjunction applies each conjunct independently, so dropping an
      // implied one is sound — only for AND, never OR)
      realFilters = filters.flatMap(conjuncts).filterNot {
        case IsNotNull(a: Attribute) => nameOf(a.exprId).contains(on)
        case _ => false
      }
      plan <- buildRewrite(agg, log, d, colOf, realFilters, mvVersion)
    } yield plan
  }

  /** Walk alias-only Projects / deterministic Filters / SubqueryAliases
    * down to ONE inner equi-join of two lake scans. Returns (left table,
    * left version, right table, right version, exprId → (isLeft,
    * physical column) union map, the equality's two attr ids, filters
    * from every level including each side below the join). */
  private def joinScan(p: LogicalPlan)
      : Option[(String, Long, String, Long,
                Map[ExprId, (Boolean, String)], (ExprId, ExprId),
                Seq[Expression])] = p match {
    case SubqueryAlias(_, c) => joinScan(c)
    case Filter(cond, c) if cond.deterministic =>
      joinScan(c).map { case (lt, lv, rt, rv, m, jk, fs) =>
        (lt, lv, rt, rv, m, jk, fs :+ cond)
      }
    case Project(list, c) =>
      joinScan(c).flatMap { case (lt, lv, rt, rv, m, jk, fs) =>
        val mapped = list.map {
          case a: AttributeReference =>
            m.get(a.exprId).map(v => a.exprId -> v)
          case al @ Alias(ar: AttributeReference, _) =>
            m.get(ar.exprId).map(v => al.exprId -> v)
          case _ => None
        }
        if (mapped.contains(None)) None
        else Some((lt, lv, rt, rv, m ++ mapped.flatten.toMap, jk, fs))
      }
    case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
              Some(EqualTo(a: AttributeReference, b: AttributeReference)),
              _) =>
      for {
        (lt, lv, lm, lfs) <- scanInfo(l)
        (rt, rv, rm, rfs) <- scanInfo(r)
      } yield {
        val m = lm.map { case (id, n) => id -> (true, n) } ++
          rm.map { case (id, n) => id -> (false, n) }
        (lt, lv, rt, rv, m, (a.exprId, b.exprId), lfs ++ rfs)
      }
    case _ => None
  }

  /** The shared substitution proof over a resolved attribute→MV-column
    * mapping: grouping must cover the MV key set exactly (direct scan)
    * or a strict subset (rollup re-aggregation), every filter must be
    * key-only, every output a covered key/count/sum/min/max/avg with
    * exact result type — identical for single-table and join MVs once
    * `colOf` resolves attrs to the (joined-)row's logical names. */
  private def buildRewrite(agg: Aggregate, log: LakeLog,
                           d: MaterializedView.MvDef,
                           colOf: Attribute => Option[String],
                           filters: Seq[Expression],
                           mvVersion: Long): Option[LogicalPlan] =
    for {
      _ <- Some(()) // a for-comprehension must open with a generator
      // every grouping expr must be a bare attribute over a distinct MV
      // key column; the grouped SET may be all keys (direct scan) or a
      // strict subset incl. none (rollup re-aggregation below)
      groupCols = agg.groupingExpressions.map {
        case ga: Attribute => colOf(ga).filter(d.keyCols.contains)
          .map(k => ga.exprId -> k)
        case _ => None
      }
      if !groupCols.contains(None)
      keyByExprId = groupCols.flatten.toMap
      if keyByExprId.values.toSet.subsetOf(d.keyCols.toSet)
      if keyByExprId.size == agg.groupingExpressions.size
      if keyByExprId.values.toSeq.distinct.size == keyByExprId.size
      // every filter must reference ONLY MV key columns: each MV row's
      // rows share one key tuple, so a key predicate keeps or drops
      // WHOLE MV rows — it commutes with both the direct substitution
      // and the rollup re-aggregation
      if filters.forall(_.references.toSeq.forall(a =>
        colOf(a).exists(d.keyCols.contains)))
      exact = keyByExprId.values.toSet == d.keyCols.toSet
      mvPlan = LakeTable.readIndexed(spark, log, d.name, mvVersion)
        .queryExecution.analyzed
      mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      outs <- traverse(agg.aggregateExpressions) {
        case a: Attribute if keyByExprId.contains(a.exprId) =>
          Some(Alias(mvAttr(keyByExprId(a.exprId)), a.name)(exprId = a.exprId))
        case al @ Alias(ar: Attribute, name)
            if keyByExprId.contains(ar.exprId) =>
          Some(Alias(mvAttr(keyByExprId(ar.exprId)), name)(exprId = al.exprId))
        case al @ Alias(AggregateExpression(f, _, false, None, _), name) =>
          val replacement: Option[Expression] = f match {
            // count(*) over a group = the stored count (exact match) or
            // the sum of stored counts over the rolled-up MV rows; the
            // coalesce covers the empty-input global aggregate, where
            // base count(*) is 0 but sum-over-nothing is NULL
            case Count(Seq(Literal(_, _))) =>
              if (exact) mvAttr.get("n_rows")
              else mvAttr.get("n_rows").map(n => Coalesce(Seq(
                Sum(n).toAggregateExpression(), Literal(0L))))
            case s: Sum => s.child match {
              case c: Attribute =>
                colOf(c).filter(d.sumCols.contains)
                  .flatMap(n => mvAttr.get(s"sum_$n"))
                  .map(a => if (exact) a
                    else Sum(a).toAggregateExpression())
              case _ => None
            }
            case av: Average if al.dataType == DoubleType => av.child match {
              // avg answered as stored sum / stored count: the MV's
              // sum_<c> is the same double partial sum Spark's Average
              // accumulates, and this division is Average's own
              // finalization — exact-type-preserving (DoubleType only;
              // decimal avgs carry scale rules this does not prove).
              // Rollup: total sum / total count over the grouped MV rows.
              case c: Attribute =>
                colOf(c).filter(d.sumCols.contains).flatMap(n =>
                  for { s <- mvAttr.get(s"sum_$n"); cnt <- mvAttr.get("n_rows") }
                    yield if (exact) Divide(s, Cast(cnt, DoubleType))
                      else Divide(Sum(s).toAggregateExpression(),
                        Cast(Sum(cnt).toAggregateExpression(), DoubleType)))
              case _ => None
            }
            case mn: Min => mn.child match {
              case c: Attribute =>
                colOf(c).filter(d.minCols.contains)
                  .flatMap(n => mvAttr.get(s"min_$n"))
                  .map(a => if (exact) a
                    else Min(a).toAggregateExpression()) // min of mins
              case _ => None
            }
            case mx: Max => mx.child match {
              case c: Attribute =>
                colOf(c).filter(d.maxCols.contains)
                  .flatMap(n => mvAttr.get(s"max_$n"))
                  .map(a => if (exact) a
                    else Max(a).toAggregateExpression())
              case _ => None
            }
            case _ => None
          }
          replacement
            .filter(_.dataType == al.dataType) // exact type or no rewrite
            .map(e => Alias(e, name)(exprId = al.exprId))
        case _ => None
      }
      // re-anchor the key-only filters onto the MV's stored key columns
      mvFilters = filters.map(_.transform {
        case a: AttributeReference => mvAttr(colOf(a).get)
      })
      scan = mvFilters.reduceOption(And)
        .map(Filter(_, mvPlan)).getOrElse(mvPlan)
    } yield
      if (exact) Project(outs, scan)
      // rollup: re-aggregate the (filtered) MV over the grouped key
      // subset — still O(|MV rows|), never the base corpus
      else Aggregate(
        agg.groupingExpressions.map {
          case ga: Attribute => mvAttr(keyByExprId(ga.exprId))
        }, outs, scan)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.contains(None)) None else Some(out.flatten)
  }
}
