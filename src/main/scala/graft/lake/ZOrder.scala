package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustering value for multi-column file layout.
  *
  * Each column is linearly bucketed into 2^bits ranks between its batch
  * min/max (one cheap agg on the driver — no global sort, unlike
  * percent_rank-based z-ordering, so the computation scales to arbitrary
  * insert sizes); the per-column ranks are bit-interleaved into one long.
  * Range-partitioning + sorting by that value gives every listed column
  * locality within each file, which is exactly what per-file min/max
  * pruning needs: a predicate on ANY z-ordered column skips most files,
  * where single-key clustering only helps its one key.
  *
  * Strings are bucketed by the first 8 bytes' unsigned order (prefix
  * locality); other non-numeric types fall back to hash bucketing (equal
  * values still co-locate, range locality is given up).
  */
object ZOrder {

  /** Bits per dimension, bounded so the interleaved value fits in a long. */
  private def bitsFor(n: Int): Int = math.min(16, 62 / math.max(1, n))

  /** Curve dispatch: `morton` (bit interleave) or `hilbert` (no diagonal
    * jumps — tighter per-file boxes; see
    * [[graft.functions.HilbertIndex2D]] / [[graft.functions.HilbertIndexN]]).
    * Both take any arity: a single column degenerates to its rank order
    * under either curve. */
  def curveValue(spark: SparkSession, df: DataFrame, cols: Seq[String],
                 curve: String): Column = curve match {
    case "morton" => zValue(spark, df, cols)
    case "hilbert" => hilbertValue(spark, df, cols)
    case other =>
      throw new IllegalArgumentException(
        s"unknown clustering curve '$other' (morton | hilbert)")
  }

  /** Hilbert-curve clustering value: the same rank bucketing as
    * [[zValue]], fed through the native codegen'd curve transform instead
    * of bit interleave — the specialized 2-D expression for pairs,
    * Skilling's n-D transform above that, plain rank order for one
    * column (both curves degenerate to it). */
  def hilbertValue(spark: SparkSession, df: DataFrame,
                   cols: Seq[String]): Column = {
    require(cols.nonEmpty, "hilbert clustering needs at least one column")
    graft.functions.HilbertExpressions.register(spark)
    val bits = bitsFor(cols.length)
    val ranks = rankColumns(df, cols, bits)
    cols.length match {
      case 1 => ranks.head.cast("long")
      case 2 => graft.functions.HilbertExpressions
        .hilbert2d(ranks.head, ranks(1), bits)
      case _ => graft.functions.HilbertExpressions.hilbertNd(ranks, bits)
    }
  }

  def zValue(spark: SparkSession, df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zOrderBy needs at least one column")
    val n = cols.length
    val bits = bitsFor(n)

    // interleave: bit j of column i lands at position j*n + i
    val ranks = rankColumns(df, cols, bits)
    val terms = for {
      j <- 0 until bits
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(
      shiftright(r.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Per-column bucketed ranks in [0, 2^bits): numeric/date columns by
    * linear min/max bucketing (one driver agg), strings by byte-prefix
    * order, anything else by hash. */
  private def rankColumns(df: DataFrame, cols: Seq[String],
                          bits: Int): Seq[Column] = {
    val maxRank = (1 << bits) - 1

    // one pass: min/max per z-column (numeric-ish only)
    val numericCols = cols.filter(c => df.schema(c).dataType match {
      case _: NumericType | DateType | TimestampType => true
      case _ => false
    })
    val bounds: Map[String, (Double, Double)] =
      if (numericCols.isEmpty) Map.empty
      else {
        val aggs = numericCols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__lo_$c"),
          max(col(c)).cast("double").as(s"__hi_$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).collect().head
        numericCols.map(c => c -> ((row.getAs[Double](s"__lo_$c"),
          row.getAs[Double](s"__hi_$c")))).toMap
      }

    def rank(c: String): Column = df.schema(c).dataType match {
      case _: NumericType | DateType | TimestampType =>
        val (lo, hi) = bounds(c)
        if (hi <= lo) lit(0)
        else least(lit(maxRank), greatest(lit(0),
          floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * maxRank)
            .cast("int")))
      case StringType =>
        // unsigned order of the first bytes → the true top `bits` bits of
        // the 56-bit (7-byte) prefix, so rank order is monotonic in byte
        // order (shifting by less would drop the high bits and alias
        // 0x01/0x41/0x81/0xC1-prefixed strings together)
        val prefix = conv(substring(
          concat(hex(substr(col(c), lit(1), lit(7))), lit("00000000000000")),
          1, 14), 16, 10).cast("long")
        shiftright(prefix, 56 - bits).cast("int")
          .bitwiseAND(lit(maxRank))
      case _ =>
        pmod(xxhash64(col(c)), lit(maxRank + 1)).cast("int")
    }

    cols.map(rank)
  }
}
