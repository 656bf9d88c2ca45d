package graft.lake

import java.util.Base64

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter data skipping — the equality-predicate complement
  * to min/max stats (the same design as Delta's bloom filter indexes, built
  * from the public `org.apache.spark.util.sketch` that also backs Spark's
  * own `DataFrameStatFunctions.bloomFilter`). Min/max ranges prune range
  * predicates but are useless for point lookups on UNSORTED high-cardinality
  * columns (ids, fingerprints, URLs): every file's range covers the probe.
  * A per-file Bloom answers "is this value definitely absent?" in O(1) from
  * the LOG — at 100 TB a point lookup opens the handful of files whose
  * bloom fires instead of every file the range check can't exclude.
  *
  * Values are hashed by their Spark `CAST(col AS STRING)` rendering, so the
  * planner can re-render a Catalyst literal identically at probe time;
  * blooms are built for string/integral columns only (their renderings are
  * canonical — floats and timestamps have engine-variant spellings).
  * Probing is soundness-trivial: `mightContain == false` proves absence,
  * so a false positive costs a scan, never a wrong answer.
  */
object BloomSkip {

  /** Column types whose string rendering is canonical on both the build
    * (executor cast) and probe (driver literal) side. */
  private[lake] val SupportedTypes =
    Set("string", "int64", "int32")

  final case class Config(expectedItems: Long = 100000, fpp: Double = 0.03)

  /** One merge-friendly sketch per (file, column) in a single Spark job:
    * group the staged rows by `input_file_name` and fold each column's
    * string-rendered values into a [[BloomFilter]]. Returns
    * staged-file-path → column → base64 sketch. */
  def build(spark: SparkSession, stagedDf: DataFrame, bloomCols: Seq[String],
            cfg: Config = Config()): Map[String, Map[String, String]] = {
    if (bloomCols.isEmpty) return Map.empty
    val agg = new BloomAgg(cfg.expectedItems, cfg.fpp)
    val aggCol = udaf(agg)
    val rows = stagedDf
      .select(input_file_name().as("__file") +:
        bloomCols.map(c => col(c).cast("string").as(c)): _*)
      .groupBy("__file")
      .agg(aggCol(col(bloomCols.head)).as(bloomCols.head),
        bloomCols.tail.map(c => aggCol(col(c)).as(c)): _*)
      .collect()
    rows.map { r =>
      val file = r.getString(0)
      file -> bloomCols.zipWithIndex.flatMap { case (c, i) =>
        Option(r.getAs[Array[Byte]](i + 1))
          .map(b => c -> Base64.getEncoder.encodeToString(b))
      }.toMap
    }.toMap
  }

  /** Probe a file's bloom for a string-rendered literal. `None` = no bloom
    * for that column (keep the file); `Some(false)` = PROVEN absent. */
  def mightContain(f: FileAdd, column: String, rendered: String)
      : Option[Boolean] =
    for {
      st <- f.stats
      bs <- st.blooms
      b64 <- bs.get(column)
    } yield decode(b64).mightContainString(rendered)

  private[lake] def decode(b64: String): BloomFilter =
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(Base64.getDecoder.decode(b64)))

  /** Fold string values into a sketch; nulls don't enter the bloom (a
    * bloom can't prove null-presence — IsNull predicates keep the file). */
  private final class BloomAgg(expected: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expected, fpp)
    override def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v)
      b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b)
      a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization(classOf[BloomFilter])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
