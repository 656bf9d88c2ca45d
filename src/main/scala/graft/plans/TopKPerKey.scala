package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension (the (c) rung of the custom-op ladder:
  * logical node + optimizer rule + strategy + physical exec, injected via
  * [[TopKPerKeyExtensions]]):
  * `filter(row_number().over(partitionBy(k).orderBy(o)) <= n)` — the
  * ubiquitous per-key top-N — normally executes as a full SORT of every
  * partition followed by a running row_number and a filter. For n ≪ rows
  * per key that's O(rows·log rows) sorting plus sort-buffer spill pressure.
  * [[TopKPerKeyExec]] replaces it with one bounded heap per key:
  * O(rows·log n) and O(keys·n) memory, emitting ranks from the final heap.
  *
  * Opt-in (not registered by the default session) because it rewrites plans
  * globally; the oracle-checked query surface stays on stock Spark.
  */
object TopKPerKey {

  /** Logical placeholder carrying the window's partition/order specs, the
    * rank attribute produced by row_number, and the bound. */
  final case class TopKPerKeyNode(partitionExprs: Seq[Expression],
                                  order: Seq[SortOrder], limit: Int,
                                  rankAttr: Attribute, child: LogicalPlan)
      extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
    override protected def withNewChildInternal(newChild: LogicalPlan) =
      copy(child = newChild)
  }

  /** Optimizer rule: match `Filter(rank <= n)` directly above the Window
    * that defines `rank` as a lone row_number. Conservative on shape —
    * anything else is left to stock Spark.
    */
  object RewriteRule extends Rule[LogicalPlan] {
    private def bound(cond: Expression, rank: Attribute): Option[Int] =
      cond match {
        case LessThanOrEqual(a: Attribute, Literal(n: Int, _))
          if a.semanticEquals(rank) => Some(n)
        case LessThan(a: Attribute, Literal(n: Int, _))
          if a.semanticEquals(rank) => Some(n - 1)
        case EqualTo(a: Attribute, Literal(1, _))
          if a.semanticEquals(rank) => Some(1)
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
            _, _, child, _)) if partitionSpec.nonEmpty =>
        bound(cond, alias.toAttribute) match {
          case Some(n) if n >= 1 =>
            TopKPerKeyNode(partitionSpec, orderSpec, n,
              alias.toAttribute, child)
          case _ => f
        }
    }
  }

  object PlanStrategy extends Strategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(p, o, n, rank, child) =>
        TopKPerKeyExec(p, o, n, rank, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  final case class TopKPerKeyExec(partitionExprs: Seq[Expression],
                                  order: Seq[SortOrder], limit: Int,
                                  rankAttr: Attribute, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

    // all rows of a key must meet in one partition; no sort required —
    // that's the point
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(partitionExprs) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val pExprs = partitionExprs
      val sOrder = order
      val n = limit
      child.execute().mapPartitions { rows =>
        val keyProj = UnsafeProjection.create(pExprs, childOutput)
        val ordering = new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(sOrder, childOutput)
        // per key: bounded "heap" as a sorted buffer of ≤ n rows (binary
        // search insert; n is small by construction)
        val heaps = new java.util.HashMap[UnsafeRow,
          java.util.ArrayList[UnsafeRow]]()
        rows.foreach { r =>
          val key = keyProj(r)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.ArrayList[UnsafeRow](n + 1)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < n ||
              ordering.compare(r, heap.get(heap.size() - 1)) < 0) {
            val copy = r.asInstanceOf[UnsafeRow].copy()
            var lo = 0; var hi = heap.size()
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (ordering.compare(copy, heap.get(mid)) < 0) hi = mid
              else lo = mid + 1
            }
            heap.add(lo, copy)
            if (heap.size() > n) heap.remove(n)
          }
        }
        val joiner = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        // downstream operators expect UnsafeRow-shaped output
        val toUnsafe = UnsafeProjection.create(
          (childOutput :+ rankAttr).map(_.dataType).toArray)
        val it = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var cur: java.util.ArrayList[UnsafeRow] = _
          private var i = 0
          override def hasNext: Boolean =
            (cur != null && i < cur.size()) || it.hasNext
          override def next(): InternalRow = {
            if (cur == null || i >= cur.size()) { cur = it.next(); i = 0 }
            val r = cur.get(i)
            i += 1
            rankRow.update(0, i)
            toUnsafe(joiner(r, rankRow))
          }
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan) =
      copy(child = newChild)
  }
}

/** Opt-in session extensions enabling the top-k rewrite. */
class TopKPerKeyExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TopKPerKey.RewriteRule)
    ext.injectPlannerStrategy(_ => TopKPerKey.PlanStrategy)
  }
}
