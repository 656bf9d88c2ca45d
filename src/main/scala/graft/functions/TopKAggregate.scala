package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a real aggregate function.
  *
  * `graft_topk(struct(score, tiebreak...), k)` keeps the k best rows by
  * (score DESC, tiebreak ASC...) in a sorted buffer of ≤ k entries and
  * returns them as `array<struct>` (best first).
  *
  * Why an aggregate and not a rank window: `row_number() OVER (PARTITION BY
  * key ORDER BY score DESC) <= k` shuffles EVERY scored row and funnels each
  * key's entire score stream through one reducer — at corpus scale that one
  * task reads the whole corpus per query. An aggregate runs under
  * ObjectHashAggregate in Partial mode on the map side, so each map
  * partition forwards at most k buffered entries per key across the
  * exchange: the shuffle carries O(partitions × keys × k) rows instead of
  * O(corpus). This is the "partial top-k below the exchange" shape that the
  * ANN operators (graft.operators.Similarity) need to survive 100 TB.
  *
  * Buffer entries are UnsafeRow copies of the input struct; serialization
  * between partial and final is length-prefixed row bytes. Updates cost
  * O(log k) compares (binary-search insert into the bounded buffer).
  *
  * Contract: field 0 of the struct must be a non-null DOUBLE score; the
  * remaining fields order ascending as tie-breaks (null tie-break fields
  * sort last). k must be a foldable positive integer.
  */
case class BoundedTopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.ArrayList[UnsafeRow]] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val numFields = structType.length
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.isEmpty =>
      TypeCheckResult.TypeCheckFailure("graft_topk needs a non-empty struct")
    case st: StructType if st.head.dataType != DoubleType =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk struct field 0 must be DOUBLE (the score), got ${st.head.dataType}")
    case _: StructType =>
      if (!kExpr.foldable)
        TypeCheckResult.TypeCheckFailure("graft_topk k must be foldable")
      else kExpr.eval() match {
        case n: Number if n.intValue >= 1 => TypeCheckResult.TypeCheckSuccess
        case other =>
          TypeCheckResult.TypeCheckFailure(s"graft_topk k must be >= 1, got $other")
      }
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects struct(score, tiebreak...), got $other")
  }

  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)
  @transient private lazy val tieOrderings =
    structType.fields.drop(1).map(f => TypeUtils.getInterpretedOrdering(f.dataType))
  @transient private lazy val tieTypes = structType.fields.drop(1).map(_.dataType)

  /** score DESC, then remaining fields ASC (nulls last); "less" = better. */
  @transient private lazy val ord: Ordering[InternalRow] =
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val c0 = java.lang.Double.compare(b.getDouble(0), a.getDouble(0))
        if (c0 != 0) return c0
        var i = 0
        while (i < tieOrderings.length) {
          val av = if (a.isNullAt(i + 1)) null else a.get(i + 1, tieTypes(i))
          val bv = if (b.isNullAt(i + 1)) null else b.get(i + 1, tieTypes(i))
          val c =
            if (av == null && bv == null) 0
            else if (av == null) 1
            else if (bv == null) -1
            else tieOrderings(i).compare(av, bv)
          if (c != 0) return c
          i += 1
        }
        0
      }
    }

  override def createAggregationBuffer(): java.util.ArrayList[UnsafeRow] =
    new java.util.ArrayList[UnsafeRow](k + 1)

  private def insert(buf: java.util.ArrayList[UnsafeRow], row: UnsafeRow): Unit = {
    if (buf.size() < k || ord.compare(row, buf.get(buf.size() - 1)) < 0) {
      var lo = 0; var hi = buf.size()
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(row, buf.get(mid)) < 0) hi = mid else lo = mid + 1
      }
      buf.add(lo, row)
      if (buf.size() > k) buf.remove(k)
    }
  }

  override def update(buf: java.util.ArrayList[UnsafeRow],
                      input: InternalRow): java.util.ArrayList[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (!r.isNullAt(0)) insert(buf, toUnsafe(r).copy())
    }
    buf
  }

  override def merge(buf: java.util.ArrayList[UnsafeRow],
                     other: java.util.ArrayList[UnsafeRow])
      : java.util.ArrayList[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.ArrayList[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray(Array.empty[AnyRef]))

  override def serialize(buf: java.util.ArrayList[UnsafeRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.ArrayList[UnsafeRow](math.max(n, k) + 1)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(numFields)
      row.pointTo(arr, len)
      buf.add(row)
      i += 1
    }
    buf
  }
}

/** Registration + Column-level access for the bounded top-k aggregate. */
object TopKAggregate {
  val Name = "graft_topk"

  /** Idempotently register `graft_topk` in this session's registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, s"$Name expects (struct, k)")
        BoundedTopK(exprs.head, exprs(1))
      },
      "built-in")

  /** `array<struct>` of the k best items by (field0 DESC, rest ASC). */
  def topK(item: Column, k: Column): Column = call_function(Name, item, k)
}
