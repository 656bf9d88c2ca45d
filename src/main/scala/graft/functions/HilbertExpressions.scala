package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Hilbert-curve index — the locality-better sibling of the Morton
  * (z-order) interleave in [[graft.lake.ZOrder]]. The Hilbert curve never
  * makes the long diagonal jumps Morton makes at quadrant boundaries, so
  * points close on the curve are close in BOTH dimensions and per-file
  * min/max boxes come out tighter — measurably fewer files read for the
  * same 2-D range predicate (pinned in HilbertSpec / LakeTableSpec).
  * Delta's OPTIMIZE ZORDER and modern lakehouse writers offer exactly this
  * curve choice for the same reason.
  *
  * Why a native Expression: the curve transform is a 16-step loop with
  * rotate/reflect STATE per step — unrolled as Column algebra the
  * expression tree doubles per step (the swap makes x' depend on y and
  * y' on x), so by step 16 the tree is ~2¹⁶ nodes. `doGenCode` emits the
  * loop directly and stays inside WholeStageCodegen; this is the custom-
  * Expression rung of the operator ladder, same standing as
  * [[VecDotProduct]].
  *
  * Inputs are the two bucketed ranks in [0, 2^bits); output is the curve
  * position in [0, 4^bits) — pure integer arithmetic, deterministic.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits=$bits out of range")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case IntegerType | LongType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_2d expects integer ranks, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_2d"

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = asLong(left, a)
    var y = asLong(right, b)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = (long) $a;
         |long $y = (long) $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column access for the Hilbert kernel. */
object HilbertExpressions {
  val Hilbert2DName = "graft_hilbert_2d"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Hilbert2DName,
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          s"$Hilbert2DName expects (x, y, bits-literal)")
        val bits = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
            v.asInstanceOf[Int]
          case other =>
            throw new IllegalArgumentException(
              s"$Hilbert2DName bits must be an int literal, got $other")
        }
        HilbertIndex2D(exprs.head, exprs(1), bits)
      },
      "built-in")

  /** Codegen'd 2-D Hilbert position (requires [[register]] first). */
  def hilbert2d(x: Column, y: Column, bits: Int): Column =
    call_function(Hilbert2DName, x, y,
      org.apache.spark.sql.functions.lit(bits))
}
