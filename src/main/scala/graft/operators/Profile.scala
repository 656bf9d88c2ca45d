package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level data profiling — the dataset-curation companion to the
  * quality/dedup operators: one pass over the table produces per-column
  * counts, null counts, min/max, moments and quantiles. Everything is a
  * single `agg(...)` so it runs as one partial+final HashAggregate — the
  * whole profile of a 100 TB table is one scan and a one-row shuffle per
  * partition.
  *
  * Exact `percentile` is used for oracle-comparable output; at extreme
  * cardinalities swap `percentile` → `percentile_approx` (t-digest sketch,
  * same call shape) — the parameter exists for exactly that.
  */
object Profile {

  final case class NumericProfile(column: String, nRows: Long, nNulls: Long,
                                  min: Double, max: Double, mean: Double,
                                  stddev: Double, p25: Double, p50: Double,
                                  p75: Double)

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Approximate distinct count per column (HyperLogLog++ sketch) — the
    * cardinality profile of a 100 TB table in one pass and O(columns ×
    * sketch) memory; mergeable across partitions like any partial agg.
    */
  def approxDistinct(df: DataFrame, rsd: Double = 0.05): Map[String, Long] = {
    val cols = df.columns.toSeq
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.map(c => c -> row.getAs[Long](c)).toMap
  }

  private val Quartiles = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")

  /** One row per numeric column: count/nulls/min/max/mean/stddev/quartiles.
    *
    * Moments run as ONE codegen'd partial+final aggregation pass. Exact
    * quartiles do NOT use the `percentile` aggregate — its partial state is
    * a value→count map per partition that one final reducer must merge, an
    * OOM magnet at high cardinality. Instead: unpivot → `groupBy(column,
    * value)` histogram (map-side combine shrinks the shuffle to distinct
    * values) → per-column cumulative-count window → each quartile is the
    * interpolation `v_lo + frac · (v_hi − v_lo)` of the two values whose
    * cumulative ranges cover positions `⌊q(n−1)⌋`/`⌈q(n−1)⌉` — the same
    * definition as SQL `percentile_cont`, bit-identical results, but memory
    * bounded by one value's row, never a value map. `approx = true` swaps in
    * `percentile_approx` (t-digest) inside the moments pass for extreme
    * cardinalities.
    */
  def numericProfile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields.filter(f => isNumeric(f.dataType)).map(_.name)
    require(cols.nonEmpty, "no numeric columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        avg(col(c)).as(s"__mean_$c"),
        stddev_samp(col(c)).as(s"__std_$c")) ++
        (if (approx)
          Seq(percentile_approx(col(c).cast("double"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as(s"__q_$c"))
        else Nil)
    }
    // the moments aggregate and the quartile histogram are independent
    // jobs over the same scan — submit the moments from a second thread so
    // the two pipelines overlap instead of serializing (Spark schedules
    // concurrent actions from one session safely); exactQuartiles' own
    // actions run on this thread meanwhile
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val momentsF = Future { df.agg(aggs.head, aggs.tail: _*).collect().head }

    val quart: Map[String, Seq[Double]] =
      if (approx) Map.empty
      else exactQuartiles(df, cols.toSeq)
    val row = Await.result(momentsF, Duration.Inf)
    val quartResolved: Map[String, Seq[Double]] =
      if (approx) cols.map { c =>
        c -> Option(row.getAs[scala.collection.Seq[Double]](s"__q_$c"))
          .map(_.toSeq).getOrElse(Seq(Double.NaN, Double.NaN, Double.NaN))
      }.toMap
      else quart

    cols.map { c =>
      val qs = quartResolved(c)
      NumericProfile(c,
        row.getAs[Long](s"__n_$c"), row.getAs[Long](s"__nulls_$c"),
        row.getAs[Double](s"__min_$c"), row.getAs[Double](s"__max_$c"),
        row.getAs[Double](s"__mean_$c"), row.getAs[Double](s"__std_$c"),
        qs(0), qs(1), qs(2))
    }.toSeq.toDF()
  }

  /** Distributed exact `percentile_cont` quartiles for every column in one
    * plan: histogram → two-level cumulative counts → covering-value
    * interpolation. Columns with no non-null values get NaN quartiles.
    *
    * The cumulative count deliberately does NOT use a per-column window:
    * `Window.partitionBy(column)` has one partition per COLUMN, so each
    * column's entire distinct-value stream would sort and scan inside a
    * single task — 1e9 distinct doubles at warehouse scale through one
    * reducer. Instead the classic distributed prefix sum: range-partition
    * the histogram by (column, value) so every task owns a contiguous
    * value slice, cumulate locally per slice in parallel, then add each
    * slice's starting offset computed from the per-slice totals — a
    * (columns × partitions)-row collect, metadata-priced — joined back
    * broadcast. Identical results, no single-task funnel.
    */
  private def exactQuartiles(df: DataFrame, cols: Seq[String])
      : Map[String, Seq[Double]] = {
    import org.apache.spark.sql.expressions.Window
    val stacked = df.select(expr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ") +
        ") as (`__column`, `__v`)"))
      .filter(col("__v").isNotNull)
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    // (column, value) rows are distinct after the histogram groupBy, so the
    // local window (one per range-slice × column) never sees frame ties
    val local = stacked.groupBy("__column", "__v")
      .agg(count(lit(1)).as("__cnt"))
      .repartitionByRange(parts, col("__column"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum("__cnt").over(
        Window.partitionBy("__pid", "__column").orderBy("__v")))
      .persist()
    // per-slice totals: columns × partitions rows — driver-side prefix sums
    val sliceTotals = local.groupBy("__column", "__pid")
      .agg(sum("__cnt").as("__pt")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val offsetRows = sliceTotals.keys.toSeq.map { case (c, pid) =>
      val off = sliceTotals.collect {
        case ((`c`, p), n) if p < pid => n }.sum
      val nv = sliceTotals.collect { case ((`c`, _), n) => n }.sum
      (c, pid, off, nv)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(
      offsetRows.toDF("__column", "__pid", "__off", "__nv"))
    val hist = local.join(offsets, Seq("__column", "__pid"))
      .withColumn("__cum", col("__lcum") + col("__off"))
    val quartAggs = Quartiles.flatMap { case (q, name) =>
      val k = lit(q) * (col("__nv") - 1)
      val coversLo = col("__cum") - col("__cnt") <= floor(k) &&
        floor(k) < col("__cum")
      val coversHi = col("__cum") - col("__cnt") <= ceil(k) &&
        ceil(k) < col("__cum")
      Seq(max(when(coversLo, col("__v"))).as(s"__lo_$name"),
        max(when(coversHi, col("__v"))).as(s"__hi_$name"),
        max(k - floor(k)).as(s"__frac_$name"))
    }
    val rows = hist.groupBy("__column")
      .agg(quartAggs.head, quartAggs.tail: _*)
      .collect()
    local.unpersist()
    val byCol = rows.map { r =>
      r.getAs[String]("__column") -> Quartiles.map { case (_, name) =>
        val lo = r.getAs[Double](s"__lo_$name")
        val hi = r.getAs[Double](s"__hi_$name")
        lo + r.getAs[Double](s"__frac_$name") * (hi - lo)
      }
    }.toMap
    cols.map(c => c -> byCol.getOrElse(c,
      Seq(Double.NaN, Double.NaN, Double.NaN))).toMap
  }
}
