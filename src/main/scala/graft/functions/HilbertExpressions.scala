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

/** Shared n-dimensional Hilbert encode — Skilling's transpose algorithm
  * (AIP Conf. Proc. 707, 2004): undo the excess Gray-code work per bit
  * plane, Gray-encode across axes, then interleave the transposed bits.
  * A plain static-forwardable object so generated Java can call it
  * directly (`HilbertCurveKernel.encode(xs, bits)`) — one call per row,
  * no boxing, one scalar-replaceable array. CLOBBERS `xs` in place:
  * both call sites build a fresh throwaway array per row, so a
  * defensive copy would just double the per-row allocation on the
  * clustering write path. */
object HilbertCurveKernel {
  def encode(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    val X = xs
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((X(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // transposed → index: bit j of axis i lands at j*n + (n-1-i)
    // (X(0) carries the most-significant bit of each n-bit group)
    var d = 0L
    var j = 0
    while (j < bits) {
      var k = 0
      while (k < n) {
        d |= ((X(k) >> j) & 1L) << (j * n + (n - 1 - k))
        k += 1
      }
      j += 1
    }
    d
  }
}

/** N-ary sibling of [[HilbertIndex2D]] for 3+ clustering columns: same
  * native-kernel rationale, Skilling's algorithm instead of the 2-D
  * rotate/reflect recursion. Inputs are integer ranks in [0, 2^bits);
  * output is the curve position in [0, 2^(n·bits)). The 2-D case keeps
  * its specialized expression (hand-pinned base case in HilbertSpec);
  * both are pinned by the same bijectivity + unit-step-adjacency
  * properties, which fail for ANY mis-wired bit. */
case class HilbertIndexN(coords: Seq[Expression], bits: Int)
    extends Expression {

  require(coords.size >= 2, "HilbertIndexN needs at least 2 coordinates")
  require(bits >= 1 && bits * coords.size <= 62,
    s"bits=$bits × ${coords.size} dims exceeds a long")

  override def children: Seq[Expression] = coords
  override def nullable: Boolean = coords.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_nd"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (coords.forall(c => c.dataType == IntegerType ||
        c.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_nd expects integer ranks, got ${coords.map(_.dataType)}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](coords.size)
    var i = 0
    while (i < coords.size) {
      val v = coords(i).eval(input)
      if (v == null) return null
      xs(i) = v match {
        case x: java.lang.Integer => x.toLong
        case x: java.lang.Long => x
        case x => x.asInstanceOf[Long]
      }
      i += 1
    }
    HilbertCurveKernel.encode(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = coords.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCheck =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ")
      else "false"
    val setup = evals.zipWithIndex
      .map { case (e, i) => s"$xs[$i] = (long) ${e.value};" }
      .mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $nullCheck;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $xs = new long[${coords.size}];
        $setup
        ${ev.value} = graft.functions.HilbertCurveKernel.encode($xs, $bits);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(coords = newChildren)
}

/** Registration + Column access for the Hilbert kernel. */
object HilbertExpressions {
  val Hilbert2DName = "graft_hilbert_2d"
  val HilbertNDName = "graft_hilbert_nd"

  private def bitsLiteral(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
      v.asInstanceOf[Int]
    case other =>
      throw new IllegalArgumentException(
        s"$name bits must be an int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Hilbert2DName,
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          s"$Hilbert2DName expects (x, y, bits-literal)")
        HilbertIndex2D(exprs.head, exprs(1),
          bitsLiteral(Hilbert2DName, exprs(2)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HilbertNDName,
      { exprs: Seq[Expression] =>
        require(exprs.length >= 3,
          s"$HilbertNDName expects (x1, x2, ..., bits-literal)")
        HilbertIndexN(exprs.init, bitsLiteral(HilbertNDName, exprs.last))
      },
      "built-in")
  }

  /** Codegen'd 2-D Hilbert position (requires [[register]] first). */
  def hilbert2d(x: Column, y: Column, bits: Int): Column =
    call_function(Hilbert2DName, x, y,
      org.apache.spark.sql.functions.lit(bits))

  /** Codegen'd n-D Hilbert position (requires [[register]] first). */
  def hilbertNd(coords: Seq[Column], bits: Int): Column =
    call_function(HilbertNDName,
      (coords :+ org.apache.spark.sql.functions.lit(bits)): _*)
}
