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
    * `events.ts` is TIMESTAMP(NANOS) parquet. Depending on the Spark
    * build, that surfaces either as a raw nanosecond long (the legacy
    * `nanosAsLong` conf, honored through 4.1.0) or as TIMESTAMP_NTZ
    * (4.1.2+ reads nanos natively, truncated to micros). Normalize BOTH
    * to session-zone TimestampType so every downstream query sees one
    * type: long → integer-division to micros (a double division would
    * lose precision: 2024-epoch nanos ≈ 1.7e18 > 2^53); NTZ → cast,
    * which under the UTC session timezone all entry points pin is the
    * same instant. The conf is still set first so older readers take
    * the long path deterministically.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }

  /** Register every table as a temp view so `spark.sql` works over the dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
