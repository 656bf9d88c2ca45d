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

  /** One row per numeric column: count/nulls/min/max/mean/stddev/quartiles.
    * All columns' aggregates are computed in ONE aggregation pass.
    */
  def numericProfile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields.filter(f => isNumeric(f.dataType)).map(_.name)
    require(cols.nonEmpty, "no numeric columns to profile")
    val aggs = cols.flatMap { c =>
      // percentile/percentile_approx return the INPUT type — cast so the
      // quantiles of integral columns come back as doubles
      val q =
        if (approx)
          percentile_approx(col(c).cast("double"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
        else percentile(col(c).cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75)))
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        avg(col(c)).as(s"__mean_$c"),
        stddev_samp(col(c)).as(s"__std_$c"),
        q.as(s"__q_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.map { c =>
      // scala 2.13: Row arrays come back as mutable.ArraySeq, which is not
      // an immutable scala.Seq — use the collection.Seq supertype
      val qs = row.getAs[scala.collection.Seq[Double]](s"__q_$c")
      NumericProfile(c,
        row.getAs[Long](s"__n_$c"), row.getAs[Long](s"__nulls_$c"),
        row.getAs[Double](s"__min_$c"), row.getAs[Double](s"__max_$c"),
        row.getAs[Double](s"__mean_$c"), row.getAs[Double](s"__std_$c"),
        qs(0), qs(1), qs(2))
    }.toSeq.toDF()
  }
}
