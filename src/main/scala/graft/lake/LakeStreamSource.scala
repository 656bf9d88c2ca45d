package graft.lake

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Structured Streaming CDC source over a lake table — `readStream` tails
  * the transaction log the way Delta's streaming source does:
  *
  *   - an offset IS a log version; a micro-batch is the half-open version
  *     range `(start, end]`;
  *   - a batch's rows are the files LOGICALLY added in that range —
  *     `rewrite = true` adds (compaction, delete/upsert survivor rewrites,
  *     restores) are layout changes and are never replayed, so a compaction
  *     storm over a 100 TB table streams zero rows;
  *   - one input partition per added file: a version that added 1000 files
  *     fans out across the cluster, and partition-column values come from
  *     the log (the data files are flat) with zero per-row decode cost.
  *
  * Exactly-once composition: offsets are checkpointed by the engine, and
  * the lake sink ([[graft.streaming.Streams.sinkToLake]]) dedups replayed
  * batches via txn ids — so lake → stream → lake pipelines are end-to-end
  * exactly-once.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-lake")
  *     .option("root", log.root.toString).option("table", "events")
  *     .option("startingVersion", "0")    // default: 0 = from creation
  *     .load()
  * }}}
  */
final class LakeTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def logFor(options: CaseInsensitiveStringMap): (LakeLog, String) = {
    val root = Option(options.get("root")).getOrElse(
      throw new LakeValidationException("graft-lake requires option 'root'"))
    val table = Option(options.get("table")).getOrElse(
      throw new LakeValidationException("graft-lake requires option 'table'"))
    (new LakeLog(java.nio.file.Paths.get(root)), table)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (log, table) = logFor(options)
    LakeTable.toStructType(log.snapshot(table).schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (log, table) = logFor(opts)
    val sch = log.snapshot(table).schema.get
    new LakeStreamTable(opts.get("root"), table, schema, sch.partCols,
      Option(opts.get("startingVersion")).map(_.toLong).getOrElse(0L),
      Option(opts.get("maxVersionsPerBatch")).map(_.toLong))
  }
}

private final class LakeStreamTable(root: String, table: String,
                                    tableSchema: StructType,
                                    partCols: Seq[String],
                                    startingVersion: Long,
                                    maxVersionsPerBatch: Option[Long])
    extends Table with SupportsRead {

  override def name(): String = s"graft-lake:$table"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new LakeMicroBatchStream(root, table, tableSchema, partCols,
          startingVersion, maxVersionsPerBatch)
    }
}

/** `{"version": N}` — the committed log version this stream has consumed
  * through. */
final case class LakeOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private final class LakeMicroBatchStream(root: String, table: String,
                                         schema: StructType,
                                         partCols: Seq[String],
                                         startingVersion: Long,
                                         maxVersionsPerBatch: Option[Long])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val log = new LakeLog(java.nio.file.Paths.get(root))
  private val partSchema = StructType(partCols.map(c => schema(c)))
  private val dataSchema =
    StructType(schema.fields.filterNot(f => partCols.contains(f.name)))

  override def initialOffset(): Offset = LakeOffset(startingVersion)
  override def latestOffset(): Offset = LakeOffset(log.latestVersion(table))

  // Backfill admission control: `maxVersionsPerBatch` caps how many log
  // versions one micro-batch may consume, so a stream starting at version 0
  // of a long-lived table catches up in bounded batches (bounded task count
  // and state-update size per trigger) instead of materializing the whole
  // history in batch 1. The engine prefers this overload when the source
  // declares SupportsAdmissionControl; uncapped sources see no change.
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val lo = start.asInstanceOf[LakeOffset].version
    val latest = log.latestVersion(table)
    LakeOffset(maxVersionsPerBatch.fold(latest)(m =>
      math.min(latest, lo + math.max(1L, m))))
  }
  override def deserializeOffset(json: String): Offset =
    LakeOffset("""\d+""".r.findFirstIn(json).get.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[LakeOffset].version
    val hi = end.asInstanceOf[LakeOffset].version
    log.versions(table)
      .filter(v => v > lo && v <= hi)
      .flatMap(v => log.readEntry(table, v).adds)
      .filterNot(_.rewrite)
      .map(f => LakeInputPartition(f.path, f.size,
        partCols.map(f.partition(_)).toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // the row-based parquet reader hands back true InternalRow iterators;
    // the vectorized one returns ColumnarBatch — force row-based for the
    // duration of building the reader function (CDC batches are deltas,
    // not full-table scans)
    // serialized set/restore: two streams building readers concurrently on
    // the shared session would otherwise race the toggle and could leave
    // the vectorized reader disabled session-wide
    val readFn = LakeMicroBatchStream.vectorizedToggleLock.synchronized {
      val key = "spark.sql.parquet.enableVectorizedReader"
      val prev = spark.conf.getOption(key)
      try {
        spark.conf.set(key, "false")
        new ParquetFileFormat().buildReaderWithPartitionValues(
          sparkSession = spark,
          dataSchema = dataSchema,
          partitionSchema = partSchema,
          requiredSchema = dataSchema,
          filters = Nil,
          options = Map.empty,
          hadoopConf = spark.sessionState.newHadoopConf())
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    new LakeReaderFactory(readFn, schema, dataSchema, partSchema)
  }
}

private object LakeMicroBatchStream {
  /** Guards the session-global vectorized-reader toggle in
    * createReaderFactory. */
  val vectorizedToggleLock = new Object
}

private final case class LakeInputPartition(path: String, size: Long,
                                            partValues: Array[String])
    extends InputPartition

/** Reads one flat data file and projects `dataCols ++ partCols` back into
  * the table's declared column order. */
private final class LakeReaderFactory(
    readFn: PartitionedFile => Iterator[InternalRow],
    schema: StructType, dataSchema: StructType, partSchema: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[LakeInputPartition]
    val partRow = PartitionValues.internalRow(
      lp.partValues.toIndexedSeq, partSchema)
    val file = PartitionedFile(partRow,
      SparkPath.fromPathString("file://" + lp.path), 0, lp.size)
    val produced = dataSchema.fields ++ partSchema.fields
    val projection = UnsafeProjection.create(schema.fields.toSeq.map { f =>
      val i = produced.indexWhere(_.name == f.name)
      BoundReference(i, produced(i).dataType, nullable = true)
    })
    val it = readFn(file)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = projection(it.next()); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
