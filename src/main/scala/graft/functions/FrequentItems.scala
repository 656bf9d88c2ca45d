package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Mergeable Misra–Gries frequent-items sketch as a real aggregate function.
  *
  * `graft_mg(item, k)` summarizes an item stream in at most `k` counters and
  * returns `array<struct<item, est bigint>>` (largest estimate first). The
  * summary satisfies the classic Misra–Gries guarantee, preserved under
  * arbitrary partial/merge trees (Agarwal et al., "Mergeable Summaries",
  * PODS 2012): for every item x with true frequency f(x) over n total items,
  *
  *     f(x) − n/(k+1)  ≤  est(x)  ≤  f(x)
  *
  * so every item with f(x) > n/(k+1) is guaranteed present. Which LIGHT
  * items also appear is partition-order dependent — callers that need a
  * deterministic answer re-count the candidates exactly (a second scan
  * filtered to ≤ k items; see [[graft.operators.HeavyHitters]]).
  *
  * Why an aggregate and not `groupBy(item).count`: a full word count
  * shuffles one row per DISTINCT item — at corpus scale that is billions of
  * keys through the exchange just to read off the few hundred frequent ones.
  * This runs under ObjectHashAggregate in Partial mode on the map side, so
  * each partition forwards at most k (item, count) pairs: the shuffle
  * carries O(partitions × k) rows no matter the vocabulary.
  *
  * Mechanics: counters live in a hash map keyed by the item's single-field
  * UnsafeRow (byte-equality — works for any input type). The map is allowed
  * to grow to 2k before compressing (amortized O(1) per update): compress
  * finds the (k+1)-th largest count v, subtracts v from every counter and
  * drops the non-positive ones — exactly the PODS'12 merge-reduction, and
  * each such step removes ≥ (k+1)·v total mass, which is what bounds the
  * summed decrements by n/(k+1). Merge adds the other map's counters then
  * compresses the same way.
  */
case class MisraGries(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UnsafeRow, Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_mg"
  override def nullable: Boolean = false

  private lazy val itemType = child.dataType
  private lazy val keySchema = StructType(Seq(StructField("item", itemType)))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", itemType),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_mg k must be foldable")
    else kExpr.eval() match {
      case n: Number if n.intValue >= 1 => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_mg k must be >= 1, got $other")
    }

  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue
  @transient private lazy val toUnsafe = UnsafeProjection.create(keySchema)
  @transient private lazy val keyRow = new GenericInternalRow(1)

  override def createAggregationBuffer(): java.util.HashMap[UnsafeRow, Long] =
    new java.util.HashMap[UnsafeRow, Long](2 * k)

  /** Subtract the (k+1)-th largest count from every counter, drop ≤ 0.
    * No-op while ≤ k counters exist. Leaves ≤ k survivors (only counts
    * STRICTLY above the pivot survive, and at most k exceed the (k+1)-th
    * largest). */
  private def compress(buf: java.util.HashMap[UnsafeRow, Long]): Unit = {
    if (buf.size() <= k) return
    val counts = new Array[Long](buf.size())
    var i = 0
    val vit = buf.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val pivot = counts(counts.length - (k + 1)) // (k+1)-th largest
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - pivot
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[UnsafeRow, Long],
                      input: InternalRow): java.util.HashMap[UnsafeRow, Long] = {
    val v = child.eval(input)
    if (v != null) {
      keyRow.update(0, v)
      // probe with the projection's REUSED buffer row (UnsafeRow equality
      // and hashCode are byte-based, so the transient view is a valid
      // lookup key, and HashMap.put on an existing key keeps the stored
      // key object); copy the bytes only on FIRST insertion — on a
      // skewed stream most updates hit existing counters, and this is
      // the once-per-token hot path
      val probe = toUnsafe(keyRow)
      val cur = buf.get(probe)
      if (cur != 0L || buf.containsKey(probe)) buf.put(probe, cur + 1L)
      else {
        buf.put(probe.copy(), 1L)
        if (buf.size() > 2 * k) compress(buf)
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[UnsafeRow, Long],
                     other: java.util.HashMap[UnsafeRow, Long])
      : java.util.HashMap[UnsafeRow, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != 0L || buf.containsKey(e.getKey))
        buf.put(e.getKey, cur + e.getValue)
      else buf.put(e.getKey, e.getValue)
    }
    compress(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[UnsafeRow, Long]): Any = {
    compress(buf) // the contract is ≤ k entries out
    val entries = new java.util.ArrayList[(UnsafeRow, Long)](buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries.add((e.getKey, e.getValue)) }
    // est DESC, then key bytes — deterministic for a given map content
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c
      else java.util.Arrays.compare(a._1.getBytes, b._1.getBytes)
    }
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val (key, est) = entries.get(i)
      rows(i) = new GenericInternalRow(Array[Any](key.get(0, itemType), est))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.HashMap[UnsafeRow, Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
      dos.writeLong(e.getValue)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UnsafeRow, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UnsafeRow, Long](math.max(2 * k, n))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      buf.put(row, in.readLong())
      i += 1
    }
    buf
  }
}

/** Registration + Column-level access for the Misra–Gries sketch. */
object FrequentItems {
  val Name = "graft_mg"

  /** Idempotently register `graft_mg` in this session's registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, s"$Name expects (item, k)")
        MisraGries(exprs.head, exprs(1))
      },
      "built-in")

  /** `array<struct<item, est>>` — ≤ k candidates, every item with true
    * frequency > n/(k+1) guaranteed among them. */
  def sketch(item: Column, k: Column): Column = call_function(Name, item, k)
}
