package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Mirrors the reference's snapshot-driven file listing entry point
  * (`pkg/coordinator/query_planner.go:215-256`) for the simple case where the
  * "snapshot" is a single parquet file per table. The versioned, log-controlled
  * path lives in [[graft.lake.LakeLog]].
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory.
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark has no native type
    * for — read it as a long (legacy conf) and convert to microsecond
    * TimestampType with integer division (a double division would lose
    * precision: 2024-epoch nanos ≈ 1.7e18 > 2^53).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works over the dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
