package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.11 — the reference has no user-defined
  * aggregates at all; this demonstrates the full Spark ladder alongside the
  * native codegen kernels in [[VectorExpressions]]).
  *
  * An `Aggregator[IN, BUF, OUT]` participates in partial aggregation like
  * any built-in: the buffer is merged map-side before the shuffle, so a
  * weighted mean over 100 TB shuffles two doubles per group per partition —
  * the same wire cost as `avg`. Registered for SQL via
  * `spark.udf.register("graft_weighted_mean", udaf(WeightedMean))`.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  // IN = (value, weight); BUF = (weighted sum, weight sum)
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Aggregators {
  /** Register all typed aggregators on the session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("graft_weighted_mean",
      org.apache.spark.sql.functions.udaf(WeightedMean))
}
