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
  * A per-file Bloom answers "is this value definitely absent?" without
  * opening the data file — at 100 TB a point lookup opens the handful of
  * files whose bloom fires instead of every file the range check can't
  * exclude.
  *
  * Sketches live in SIDECAR files (`<dataFile>.bloom`), not in the log —
  * a production sketch is ~1 MB per million items per column, and inlining
  * that into every FileAdd would grow a 10k-file table's log by gigabytes
  * (Delta makes the same call: index files ride next to the data). The log
  * carries only the column list; sidecars share the data file's lifecycle
  * (written at promotion, removed by discard/vacuum with the data file)
  * and are immutable once promoted, so probe-side decoding caches forever.
  *
  * Values are hashed by their Spark `CAST(col AS STRING)` rendering, so the
  * planner can re-render a Catalyst literal identically at probe time;
  * blooms are built for string/integral columns only (their renderings are
  * canonical — floats and timestamps have engine-variant spellings).
  * Probing is soundness-trivial: `mightContain == false` proves absence,
  * so a false positive costs a scan, never a wrong answer — and a missing
  * or unreadable sidecar keeps the file.
  */
object BloomSkip {

  /** Column types whose string rendering is canonical on both the build
    * (executor cast) and probe (driver literal) side. */
  private[lake] val SupportedTypes =
    Set("string", "int64", "int32")

  final case class Config(expectedItems: Long = 100000, fpp: Double = 0.03)

  /** `<dataFile>.bloom` — the sidecar owning every bloom of one data file. */
  def sidecarPath(dataFile: String): String = dataFile + ".bloom"

  /** One merge-friendly sketch per (file, column) in a single Spark job:
    * group the staged rows by `input_file_name` and fold each column's
    * string-rendered values into a [[BloomFilter]]. Returns
    * staged-file-path → column → sketch bytes. */
  def build(spark: SparkSession, stagedDf: DataFrame, bloomCols: Seq[String],
            cfg: Config = Config()): Map[String, Map[String, Array[Byte]]] = {
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
        Option(r.getAs[Array[Byte]](i + 1)).map(b => c -> b)
      }.toMap
    }.toMap
  }

  /** Write one data file's sketches as its sidecar: `nCols` then per
    * column (UTF name, length, bytes). */
  def writeSidecar(dataFile: java.nio.file.Path,
                   sketches: Map[String, Array[Byte]]): Unit = {
    val out = new java.io.DataOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(sidecarPath(dataFile.toString))))
    try {
      out.writeInt(sketches.size)
      sketches.toSeq.sortBy(_._1).foreach { case (c, b) =>
        out.writeUTF(c); out.writeInt(b.length); out.write(b)
      }
    } finally out.close()
  }

  /** Probe a file's bloom for a string-rendered literal. `None` = no bloom
    * for that column or unreadable sidecar (keep the file); `Some(false)`
    * = PROVEN absent. */
  def mightContain(f: FileAdd, column: String, rendered: String)
      : Option[Boolean] =
    for {
      st <- f.stats
      cols <- st.blooms
      if cols.contains(column)
      sketches <- cached(sidecarPath(f.path))
      b <- sketches.get(column)
    } yield b.mightContainString(rendered)

  // sidecars are immutable once promoted (rewrites mint fresh paths), so
  // decoded sketches cache by path; bounded by wholesale clear — probes
  // are driver-side and re-decoding is milliseconds
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      Option[Map[String, BloomFilter]]]()

  private def cached(path: String): Option[Map[String, BloomFilter]] = {
    if (cache.size > 4096) cache.clear()
    cache.computeIfAbsent(path, p => readSidecar(p))
  }

  private def readSidecar(path: String): Option[Map[String, BloomFilter]] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) None
      else {
        val in = new java.io.DataInputStream(
          java.nio.file.Files.newInputStream(p))
        try {
          val n = in.readInt()
          Some((0 until n).map { _ =>
            val c = in.readUTF()
            val len = in.readInt()
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            c -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          }.toMap)
        } finally in.close()
      }
    } catch { case _: java.io.IOException => None }

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
