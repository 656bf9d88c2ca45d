package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.QueryEngine

/** Spark-side table operations over a [[LakeLog]]: schema codec, insert with
  * real per-file statistics, snapshot/time-travel reads, stat-based file
  * pruning, and REAL compaction (the reference simulates its rewrite —
  * `pkg/coordinator/compaction_service.go:385-433` sleeps and fabricates
  * metrics; ours reads and rewrites the bytes).
  */
object LakeTable {

  /** Declared-type codec: the reference's 8 types
    * (`table_service.go:546-558`) ↔ Spark Catalyst types. */
  def toSparkType(t: String): DataType = t match {
    case "int32" => IntegerType
    case "int64" => LongType
    case "float32" => FloatType
    case "float64" => DoubleType
    case "string" => StringType
    case "boolean" => BooleanType
    case "date" => DateType
    case "timestamp" => TimestampType
    case "float32_array" => ArrayType(FloatType)
    case "float64_array" => ArrayType(DoubleType)
    case other => throw new LakeValidationException(s"unsupported type $other")
  }

  def fromSparkType(dt: DataType): String = dt match {
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case StringType => "string"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamp"
    case ArrayType(FloatType, _) => "float32_array"
    case ArrayType(DoubleType, _) => "float64_array"
    case other => throw new LakeValidationException(
      s"no declared type for Spark type $other")
  }

  def toStructType(s: TableSchema): StructType =
    StructType(s.fields.map(f => StructField(f.name, toSparkType(f.`type`),
      f.nullable)))

  def fromStructType(st: StructType): TableSchema =
    TableSchema(st.fields.toSeq.map(f =>
      Field(f.name, fromSparkType(f.dataType), f.nullable)))

  /** `partitionBy`: hive-style partition columns (see [[TableSchema]]) —
    * declared once here, enforced on every write. */
  def createTable(log: LakeLog, table: String, schema: StructType,
                  partitionBy: Seq[String] = Nil,
                  constraints: Map[String, String] = Map.empty,
                  bloomFilterCols: Seq[String] = Nil): Unit = {
    val sch = fromStructType(schema).copy(
      partition_columns = if (partitionBy.isEmpty) None else Some(partitionBy),
      check_constraints = if (constraints.isEmpty) None else Some(constraints),
      bloom_columns =
        if (bloomFilterCols.isEmpty) None else Some(bloomFilterCols))
    validateBloomCols(sch, sch.bloomCols)
    log.createTable(table, sch)
  }

  /** Enforce the table's CHECK constraints on a batch of NEW rows: one
    * aggregate pass counting per-constraint violations (row violates only
    * when the predicate is FALSE — NULL passes, per SQL CHECK). Throws
    * with every failing constraint and its row count; called before any
    * file is staged, so a rejected batch leaves no trace in log or data.
    */
  private def enforceChecks(table: String, sch: TableSchema,
                            batch: DataFrame): Unit = {
    val checks = sch.checks
    if (checks.isEmpty) return
    val aggs = checks.toSeq.map { case (name, pred) =>
      sum(when(!coalesce(expr(pred), lit(true)), 1L).otherwise(0L)).as(name)
    }
    val row = batch.agg(aggs.head, aggs.tail: _*).head()
    val bad = checks.keys.toSeq.sorted.flatMap { n =>
      val c = row.getAs[Long](n)
      if (c > 0) Some(s"$n (${checks(n)}): $c rows") else None
    }
    if (bad.nonEmpty) throw new LakeValidationException(
      s"CHECK constraint violation on $table — ${bad.mkString("; ")}")
  }

  /** The schema physically stored in data files: declared schema minus
    * partition columns (those live only in the log's partition map). */
  private def dataStruct(st: StructType, partCols: Seq[String]): StructType =
    StructType(st.fields.filterNot(f => partCols.contains(f.name)))

  /** Parse a partition-directory value string back to the column's external
    * Spark value (for reconstructing partition columns on read). */
  private def partLit(value: String, dt: DataType): Column =
    lit(value).cast(dt)

  /** Reconstruct full-schema rows from flat data files + their log-carried
    * partition values: one scan per distinct partition value, partition
    * columns re-attached as literals (constant-folded — zero per-row cost),
    * then unioned. Fine for maintenance paths; high-partition-count
    * interactive reads should use [[readIndexed]], which exposes the
    * partition columns through the `FileIndex` instead of a union.
    */
  private def readWithPartitions(spark: SparkSession, st: StructType,
                                 partCols: Seq[String],
                                 files: Seq[FileAdd]): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], st)
    val dataSt = dataStruct(st, partCols)
    files.groupBy(f => partCols.map(f.partition(_))).map { case (vals, group) =>
      val base = spark.read.schema(dataSt).parquet(group.map(_.path): _*)
      val withParts = partCols.zip(vals).foldLeft(base) { case (df, (c, v)) =>
        df.withColumn(c, partLit(v, st(c).dataType)) }
      withParts.select(st.fieldNames.toSeq.map(col): _*)
    }.reduce(_ unionAll _)
  }

  /** Snapshot → DataFrame. Empty tables yield an empty, correctly-typed
    * DataFrame. Reads pass the declared schema so file-level surprises fail
    * loudly instead of schema-merging.
    */
  def read(spark: SparkSession, log: LakeLog, table: String,
           version: Long = 0L): DataFrame = {
    val snap = log.snapshot(table, version)
    val sch = snap.schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema"))
    val st = toStructType(sch)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], st)
    else if (sch.partCols.nonEmpty)
      readWithPartitions(spark, st, sch.partCols, snap.files)
    else spark.read.schema(st).parquet(snap.files.map(_.path): _*)
  }

  /** Catalyst-integrated read: the returned DataFrame prunes files by log
    * stats for WHATEVER filters later land on it — `.filter(...)`, SQL
    * WHERE, join pushdowns — because a [[LakeFileIndex]] receives the
    * resolved predicates at planning time. This is the read path to prefer;
    * [[readFiltered]] remains for the reference's explicit 3-token API.
    */
  def readIndexed(spark: SparkSession, log: LakeLog, table: String,
                  version: Long = 0L): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val snap = log.snapshot(table, version)
    val sch = snap.schema.getOrElse(
      throw new LakeValidationException(s"table $table has no schema"))
    val st = toStructType(sch)
    if (snap.files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], st)
    val partCols = sch.partCols
    val partSt = StructType(partCols.map(c => st(c)))
    val relation = HadoopFsRelation(
      location = new LakeFileIndex(spark, snap, st, partSt),
      partitionSchema = partSt,
      dataSchema = dataStruct(st, partCols),
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    // Spark appends partition columns after data columns — restore the
    // declared order
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .baseRelationToDataFrame(relation)
      .select(st.fieldNames.toSeq.map(col): _*)
  }

  /** Stat-pruned read: drop files whose [min,max] range for the predicate
    * column excludes the literal — the file-skipping optimization the
    * reference scaffolds (stats in `proto/metadata.proto:102-105`) but never
    * implements (`query_planner.go:238-256` takes the full list). Falls back
    * to the full file list for predicates the 3-token grammar can't prove.
    * The residual filter is always applied — pruning is an I/O optimization,
    * never a semantics change.
    */
  def readFiltered(spark: SparkSession, log: LakeLog, table: String,
                   predicate: String, version: Long = 0L): DataFrame = {
    val snap = log.snapshot(table, version)
    val sch = snap.schema.get
    val st = toStructType(sch)
    // partition columns carry synthesized min=max stats, so partition
    // predicates prune here exactly like data predicates
    val kept = FilePruning.prune(snap.files, predicate, st)
    readWithPartitions(spark, st, sch.partCols, kept)
      .filter(QueryEngine.parsePredicate(predicate))
  }

  /** Columns eligible for min/max stats (atomic comparable types). */
  private def statCols(st: StructType): Seq[StructField] =
    st.fields.toSeq.filter(f => f.dataType match {
      case IntegerType | LongType | FloatType | DoubleType | StringType |
           DateType | TimestampType | BooleanType => true
      case _ => false
    })

  /** Write `df` into the table: stage parquet under `_tmp/<txn>/`, compute
    * REAL per-file rows/size/min-max in one Spark pass (fixing the
    * reference's placeholder stats, `table_service.go:416-425`), promote to
    * `data/part-NNNNN-<uuid>.parquet`, and OCC-commit the adds with retry —
    * the `POST /tables/{t}/data` path (`table_service.go:121-244`).
    *
    * `numFiles > 1` pre-partitions the write so a large insert parallelizes;
    * promotion is rename-only (same filesystem), so the data is written once.
    */
  def insert(spark: SparkSession, log: LakeLog, table: String, df: DataFrame,
             txnId: String = UUID.randomUUID().toString,
             numFiles: Int = 1,
             clusterBy: Seq[String] = Nil,
             zOrderBy: Seq[String] = Nil,
             maxAttempts: Int = 3,
             bloomCols: Seq[String] = Nil): CommitResult = {
    // early idempotency check: a redelivered transaction (streaming batch
    // replay, client retry) must not re-stage data files
    log.committedVersion(table, txnId).foreach(v =>
      return CommitResult(v, duplicate = true))
    val sch = log.snapshot(table).schema.get
    val st = toStructType(sch)
    val partCols = sch.partCols
    val tmp = log.tmpDir(table, txnId)
    val shaped = df.select(st.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType)): _*)
    // constrained tables: persist so the violation-count aggregate and the
    // staged write execute the caller's (possibly expensive) upstream
    // query once, not twice
    val checksOn = sch.checks.nonEmpty
    if (checksOn) shaped.persist()
    try enforceChecks(table, sch, shaped)
    catch { case e: Throwable => if (checksOn) shaped.unpersist(); throw e }
    // clusterBy = the reference's hash-partitioned sink
    // (`worker/src/parquet_writer.rs:182-234`): rows hash-routed by key into
    // numFiles files, so equal keys co-locate — narrows each file's min/max
    // stats and makes point-predicate file pruning effective.
    // zOrderBy = multi-dimensional clustering: range-partition + sort by an
    // interleaved-bit curve value, so EVERY listed column gets tight
    // per-file min/max ranges and [[LakeFileIndex]] prunes on any of them.
    val arranged =
      if (zOrderBy.nonEmpty) {
        val z = ZOrder.zValue(spark, shaped, zOrderBy)
        shaped.withColumn("__z", z)
          .repartitionByRange(math.max(1, numFiles), col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      }
      else if (clusterBy.nonEmpty) shaped.repartition(numFiles, clusterBy.map(col): _*)
      else if (numFiles > 1) shaped.repartition(numFiles)
      else shaped.coalesce(1)
    try {
      withStatFriendlyWrites(spark) {
        // partitioned tables: hive-style staged layout (col=value/ dirs,
        // data files stripped of partition columns); values are parsed back
        // into the log's partition map at promotion
        arranged
          .write.mode("overwrite").option("compression", "snappy")
          .partitionBy(partCols: _*)
          .parquet(tmp.toString)
      }
    } finally if (checksOn) shaped.unpersist()

    try {
      val adds = statAndPromote(spark, log, table, tmp, st,
        partCols = partCols, bloomCols =
          validateBloomCols(sch, (sch.bloomCols ++ bloomCols).distinct))
      val res =
        try log.commitWithRetry(table, txnId, maxAttempts)(
          _ => Some((adds, Nil))).get
        catch { case e: Throwable => discardAdds(adds); throw e }
      // a concurrent writer won this txnId: its files are the committed
      // ones, ours are orphans
      if (res.duplicate) discardAdds(adds)
      res
    } finally deleteRecursively(tmp)
  }

  /** Atomically REPLACE the table's contents with `df`: stage the new
    * files, then ONE commit removes every currently-live file and adds the
    * staged ones. Readers see either the old state or the new state, never
    * an empty intermediate — which is why full materialized-view refreshes
    * go through this instead of composing deleteWhere + insert (two
    * commits: a crash or a racing writer between them could leave the
    * table empty with the work's txn already spent). Duplicate txn ids
    * replay as no-ops like every other write.
    */
  def overwrite(spark: SparkSession, log: LakeLog, table: String,
                df: DataFrame,
                txnId: String = UUID.randomUUID().toString,
                numFiles: Int = 1,
                maxAttempts: Int = 3): CommitResult = {
    log.committedVersion(table, txnId).foreach(v =>
      return CommitResult(v, duplicate = true))
    val sch = log.snapshot(table).schema.get
    val st = toStructType(sch)
    val partCols = sch.partCols
    val tmp = log.tmpDir(table, txnId)
    val shaped = df.select(st.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType)): _*)
    val checksOn = sch.checks.nonEmpty
    if (checksOn) shaped.persist()
    try enforceChecks(table, sch, shaped)
    catch { case e: Throwable => if (checksOn) shaped.unpersist(); throw e }
    try {
      withStatFriendlyWrites(spark) {
        (if (numFiles > 1) shaped.repartition(numFiles)
         else shaped.coalesce(1))
          .write.mode("overwrite").option("compression", "snappy")
          .partitionBy(partCols: _*)
          .parquet(tmp.toString)
      }
    } finally if (checksOn) shaped.unpersist()
    try {
      val adds = statAndPromote(spark, log, table, tmp, st,
        partCols = partCols, bloomCols = sch.bloomCols)
      val res =
        try log.commitWithRetry(table, txnId, maxAttempts)(fresh =>
          Some((adds, fresh.files.map(_.path)))).get
        catch { case e: Throwable => discardAdds(adds); throw e }
      if (res.duplicate) discardAdds(adds)
      res
    } finally deleteRecursively(tmp)
  }

  /** Promote staged parquet into `data/`, computing per-file row count +
    * min/max stats from the parquet FOOTERS ([[FooterStats]]) — O(#files)
    * metadata reads, no re-scan of the data that was just written. Zero-row
    * part files (Spark writes them on over-partitioned small data) are
    * dropped, never committed.
    *
    * Partitioned tables: the staged dir carries hive-style `col=value/`
    * subdirs (from `.partitionBy` writes); values are parsed into the
    * [[FileAdd]] partition map and the promoted file is FLAT — partition
    * placement lives only in the log. `partition` pre-sets the map when the
    * staged write was not `.partitionBy` (compaction merges one partition's
    * files and already knows their shared values). Every partition column
    * also gets synthesized `min = max = value` stats, so the stat-based
    * pruners skip partitions with no extra machinery.
    */
  /** Bloom columns must be real data columns with a canonical string
    * rendering — never partition columns (their values prune via the
    * partition map already). */
  private def validateBloomCols(sch: TableSchema, bloomCols: Seq[String])
      : Seq[String] = {
    bloomCols.foreach { c =>
      val f = sch.fields.find(_.name == c).getOrElse(
        throw new LakeValidationException(s"bloom column $c is not a schema field"))
      if (sch.partCols.contains(c))
        throw new LakeValidationException(
          s"bloom column $c is a partition column (already pruned exactly)")
      if (!BloomSkip.SupportedTypes.contains(f.`type`))
        throw new LakeValidationException(
          s"bloom column $c has type '${f.`type`}' without a canonical " +
            "string rendering (supported: string, int32, int64)")
    }
    bloomCols
  }

  private def statAndPromote(spark: SparkSession, log: LakeLog, table: String,
                             staged: Path, st: StructType,
                             rewrite: Boolean = false,
                             partCols: Seq[String] = Nil,
                             partition: Map[String, String] = Map.empty,
                             bloomCols: Seq[String] = Nil)
      : Seq[FileAdd] = {
    val cols = statCols(dataStruct(st, partCols))
    val hadoopConf = spark.sessionState.newHadoopConf()
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val walk = Files.walk(staged)
    val walked = try walk.iterator().asScala.toList finally walk.close()
    val parts = walked
      .filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith(".") && !n.startsWith("_")
      }
      .sortBy(_.toString)

    // one Spark job builds every (file, column) bloom over the staged dir;
    // keyed by decoded local path so the per-file move below can look up
    val blooms: Map[String, Map[String, Array[Byte]]] =
      if (bloomCols.isEmpty || parts.isEmpty) Map.empty
      else BloomSkip.build(spark,
        spark.read.parquet(staged.toString), bloomCols)
        .map { case (uri, m) => new java.net.URI(uri).getPath -> m }

    val dataDir = log.dataDir(table)
    Files.createDirectories(dataDir)
    parts.zipWithIndex.flatMap { case (src, i) =>
      val (rows, minVals, maxVals, nullCounts) =
        FooterStats.read(hadoopConf, src, cols, tz)
      if (rows == 0L) None
      else {
        val partMap = partition ++ parsePartitionDirs(staged, src)
        partCols.foreach(c => if (!partMap.contains(c))
          throw new LakeValidationException(
            s"staged file $src carries no value for partition column $c " +
              "(null partition values are not supported)"))
        val synth = partCols.map(c => c -> partMap(c))
        // partition values are non-null by construction
        val synthNulls = partCols.map(c => c -> 0L)
        val fileBlooms = blooms.get(src.toAbsolutePath.toString)
          .filter(_.nonEmpty)
        val dest = dataDir.resolve(
          f"part-$i%05d-${UUID.randomUUID().toString}.parquet")
        Files.move(src, dest, StandardCopyOption.ATOMIC_MOVE)
        // sketches ride as a sidecar sharing the data file's lifecycle —
        // the log records only WHICH columns have one (see BloomSkip)
        fileBlooms.foreach(bs => BloomSkip.writeSidecar(dest, bs))
        Some(FileAdd(dest.toString, rows = rows, size = Files.size(dest),
          partition = partMap,
          stats = Some(FileStats(minVals ++ synth, maxVals ++ synth,
            blooms = fileBlooms.map(_.keys.toSeq.sorted),
            null_counts = Some(nullCounts ++ synthNulls))),
          rewrite = rewrite))
      }
    }
  }

  /** `col=value` components of `file`'s path below `staged`, hive-unescaped.
    * Rejects the null-partition sentinel: partition values must be non-null
    * (their directory encoding is otherwise ambiguous). */
  private def parsePartitionDirs(staged: Path, file: Path)
      : Map[String, String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val rel = staged.relativize(file)
    (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
      .filter(_.contains("=")).map { seg =>
        val Array(k, v) = seg.split("=", 2)
        val value = ExternalCatalogUtils.unescapePathName(v)
        if (value == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
          throw new LakeValidationException(
            s"partition column $k has a null value — not supported")
        k -> value
      }.toMap
  }

  /** Parquet footers only carry timestamp statistics for INT64 physical
    * encodings — pin the writer away from stat-less INT96 for the duration
    * of a staged write so [[FooterStats]] sees them, then restore the
    * session's setting (leaking it would silently change how OTHER parquet
    * writes on the session encode timestamps). */
  // reference-counted so CONCURRENT writers on the shared session compose:
  // a naive set/restore pair races (T1 restores while T2 still writes, or
  // T2 "restores" T1's temporary value and leaks MICROS session-wide).
  // Assumes one driver-side session, which is this control plane's model.
  private val statConfLock = new Object
  private var statConfDepth = 0
  private var statConfPrev: Option[String] = None
  private def withStatFriendlyWrites[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    statConfLock.synchronized {
      if (statConfDepth == 0) {
        statConfPrev = spark.conf.getOption(key)
        spark.conf.set(key, "TIMESTAMP_MICROS")
      }
      statConfDepth += 1
    }
    try body
    finally statConfLock.synchronized {
      statConfDepth -= 1
      if (statConfDepth == 0) statConfPrev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Delete promoted-but-never-committed data files (commit threw, aborted,
    * or lost an idempotency race): without this they are referenced by no
    * log entry, invisible to vacuum, and leak forever. */
  private def discardAdds(adds: Seq[FileAdd]): Unit =
    adds.foreach { a =>
      try {
        Files.deleteIfExists(java.nio.file.Paths.get(a.path))
        Files.deleteIfExists(
          java.nio.file.Paths.get(BloomSkip.sidecarPath(a.path)))
      } catch { case _: java.io.IOException => () }
    }

  /** Load an external file into the table — the reference's insert/load
    * source (`pkg/coordinator/table_service.go:121-244`: external file →
    * `_tmp/<txn>/` parquet → commit). Formats: parquet, csv (with header),
    * json — each read with the table's declared schema so malformed input
    * fails at load, not at query time.
    */
  def load(spark: SparkSession, log: LakeLog, table: String, path: String,
           format: String = "parquet",
           txnId: String = UUID.randomUUID().toString): CommitResult = {
    val st = toStructType(log.snapshot(table).schema.get)
    val reader = spark.read.schema(st)
    val df = format match {
      case "parquet" => reader.parquet(path)
      case "csv" => reader.option("header", "true").csv(path)
      case "json" => reader.json(path)
      case other => throw new LakeValidationException(
        s"unsupported load format: $other")
    }
    insert(spark, log, table, df, txnId)
  }

  /** Inline JSON-rows insert — the reference's `POST /tables/{t}/insert`
    * accepts inline records but is a STUB that returns success WITHOUT
    * writing anything (`rest_api.go:689-707`); the golden test inserts its 9
    * rows through it. This is the real implementation: rows parsed with the
    * table's declared schema (malformed JSON fails the txn, not the query),
    * then the standard staged-commit insert path.
    */
  def insertJson(spark: SparkSession, log: LakeLog, table: String,
                 jsonRows: Seq[String],
                 txnId: String = UUID.randomUUID().toString): CommitResult = {
    import spark.implicits._
    val st = toStructType(log.snapshot(table).schema.get)
    val df = spark.read.schema(st)
      .option("mode", "FAILFAST")
      .json(spark.createDataset(jsonRows))
    insert(spark, log, table, df, txnId)
  }

  /** Compaction thresholds from `pkg/coordinator/compaction_service.go:59-74`
    * and trigger rule from `:314-332`. */
  /** `zOrderBy`: re-sort each compacted group by the Morton curve so
    * clustering (and with it multi-column file pruning) survives
    * compaction — merging z-ordered small files unsorted would widen every
    * file's min/max back toward the full range. */
  final case class CompactionConfig(minFileSize: Long = 10L * 1024 * 1024,
                                    maxFileSize: Long = 128L * 1024 * 1024,
                                    minFilesCount: Int = 3,
                                    smallBytesTriggerRatio: Double = 0.10,
                                    zOrderBy: Seq[String] = Nil)

  final case class CompactionReport(groupsPlanned: Int, groupsCommitted: Int,
                                    filesRemoved: Int, filesAdded: Int,
                                    finalVersion: Long)

  /** Plan: candidates = files < minFileSize, sorted by size ascending; greedy
    * bin-packing into groups whose total stays ≤ maxFileSize; only groups of
    * ≥ minFilesCount files qualify (`compaction_service.go:160-200`).
    */
  def planCompaction(snap: Snapshot, cfg: CompactionConfig): Seq[Seq[FileAdd]] = {
    val candidates = snap.files.filter(_.size < cfg.minFileSize)
      .sortBy(f => (f.size, f.path))
    val groups = scala.collection.mutable.ArrayBuffer[Seq[FileAdd]]()
    var current = scala.collection.mutable.ArrayBuffer[FileAdd]()
    var currentSize = 0L
    candidates.foreach { c =>
      if (currentSize + c.size > cfg.maxFileSize && current.nonEmpty) {
        if (current.size >= cfg.minFilesCount) groups += current.toSeq
        current = scala.collection.mutable.ArrayBuffer(c)
        currentSize = c.size
      } else { current += c; currentSize += c.size }
    }
    if (current.size >= cfg.minFilesCount) groups += current.toSeq
    groups.toSeq
  }

  /** Should compaction run at all? Small-file bytes above the trigger ratio
    * of total table bytes (`compaction_service.go:314-332`). */
  def compactionNeeded(snap: Snapshot, cfg: CompactionConfig): Boolean = {
    val total = snap.files.map(_.size).sum
    val small = snap.files.filter(_.size < cfg.minFileSize).map(_.size).sum
    total > 0 && small.toDouble / total > cfg.smallBytesTriggerRatio
  }

  /** Real compaction: per group, rewrite the parquet bytes into one file and
    * atomically commit (removes = inputs, adds = output) with OCC retry ×3.
    * On conflict the group is re-validated against the fresh snapshot and
    * skipped if any input vanished (`compaction_service.go:745-820`
    * semantics). Queries pinned to older versions keep seeing the removed
    * files — snapshot isolation (Property 30) — because data files are never
    * deleted here (a separate VACUUM would do that after a retention window).
    */
  def compact(spark: SparkSession, log: LakeLog, table: String,
              cfg: CompactionConfig = CompactionConfig(),
              force: Boolean = false): CompactionReport = {
    val snap = log.snapshot(table)
    if (!force && !compactionNeeded(snap, cfg))
      return CompactionReport(0, 0, 0, 0, snap.version)
    val sch = snap.schema.get
    val st = toStructType(sch)
    val partCols = sch.partCols
    val dataSt = dataStruct(st, partCols)
    // a compaction group never crosses partition boundaries — merging files
    // of different partition values would break partition placement
    val groups = snap.files.groupBy(f => partCols.map(f.partition(_)))
      .values.toSeq.sortBy(_.head.path)
      .flatMap(fs => planCompaction(snap.copy(files = fs), cfg))
    var committed = 0; var removed = 0; var added = 0
    groups.zipWithIndex.foreach { case (group, gi) =>
      val txnId = s"compact-${UUID.randomUUID().toString}"
      val staged = log.tmpDir(table, txnId)
      // the group shares one partition value vector: merge the flat data
      // files as-is and carry the partition map through to the new FileAdd
      val merged = spark.read.schema(dataSt).parquet(group.map(_.path): _*)
      // partition columns are constant within a group — drop them from the
      // z-order key (they're not in the data files either)
      val zCols = cfg.zOrderBy.filterNot(partCols.contains)
      val rewritten =
        if (zCols.nonEmpty)
          merged.withColumn("__z", ZOrder.zValue(spark, merged, zCols))
            .coalesce(1).sortWithinPartitions("__z").drop("__z")
        else merged.coalesce(1)
      withStatFriendlyWrites(spark) {
        rewritten
          .write.mode("overwrite").option("compression", "snappy")
          .parquet(staged.toString)
      }
      try {
        val adds = statAndPromote(spark, log, table, staged, st, rewrite = true,
          partCols = partCols, partition = group.head.partition,
          bloomCols = sch.bloomCols)
        val inputPaths = group.map(_.path)
        val result = log.commitWithRetry(table, txnId) { fresh =>
          val live = fresh.files.map(_.path).toSet
          if (inputPaths.forall(live.contains)) Some((adds, inputPaths))
          else None // inputs compacted/removed concurrently — drop this group
        }
        if (result.isDefined) {
          committed += 1; removed += group.size; added += adds.size
        } else adds.foreach(a => Files.deleteIfExists(
          java.nio.file.Paths.get(a.path))) // orphaned rewrite, not visible
      } finally deleteRecursively(staged)
    }
    CompactionReport(groups.size, committed, removed, added,
      log.latestVersion(table))
  }

  final case class DeleteReport(filesRewritten: Int, filesUntouched: Int,
                                rowsDeleted: Long, version: Long)

  /** DELETE WHERE — beyond the reference (which has no row deletion):
    * copy-on-write at file granularity. Only files whose min/max stats admit
    * matching rows are rewritten (the others are untouched log entries —
    * zero I/O); each rewritten file is replaced by its retained rows in one
    * OCC commit, so readers see the delete atomically and old versions time
    * travel to the pre-delete data. Predicate is the 3-token grammar or any
    * Spark SQL expression (unparseable → all files rewritten, still
    * correct).
    */
  def deleteWhere(spark: SparkSession, log: LakeLog, table: String,
                  predicate: String,
                  txnId: String = UUID.randomUUID().toString): DeleteReport = {
    log.committedVersion(table, txnId).foreach(v =>
      return DeleteReport(0, 0, 0, v))
    val snap = log.snapshot(table)
    val sch = snap.schema.get
    val st = toStructType(sch)
    val partCols = sch.partCols
    val candidates = FilePruning.prune(snap.files, predicate, st)
    if (candidates.isEmpty)
      return DeleteReport(0, snap.files.size, 0, snap.version)
    val pred = QueryEngine.parsePredicate(predicate)
    val staged = log.tmpDir(table, txnId)
    // rewrite candidates: retained rows only; a file whose rows all match
    // is dropped entirely (no empty-file adds — parquet writes skip them).
    // SQL DELETE removes only rows where the condition is TRUE — a NULL
    // predicate keeps the row, so retain !coalesce(pred, false), not !pred.
    // Partitioned tables reconstruct partition columns before evaluating
    // (the predicate may reference them) and re-split on write.
    val retained = readWithPartitions(spark, st, partCols, candidates)
      .filter(!coalesce(pred, lit(false)))
    withStatFriendlyWrites(spark) {
      retained.coalesce(math.max(1, candidates.size))
        .write.mode("overwrite").option("compression", "snappy")
        .partitionBy(partCols: _*)
        .parquet(staged.toString)
    }
    try {
      val adds = statAndPromote(spark, log, table, staged, st, rewrite = true,
          partCols = partCols, bloomCols = sch.bloomCols)
        .filter(_.rows > 0)
      val inputPaths = candidates.map(_.path)
      val resultOpt =
        try log.commitWithRetry(table, txnId) { fresh =>
          val live = fresh.files.map(_.path).toSet
          if (inputPaths.forall(live.contains)) Some((adds, inputPaths))
          else None // concurrent rewrite of our inputs — abort
        } catch { case e: Throwable => discardAdds(adds); throw e }
      val result = resultOpt.getOrElse {
        discardAdds(adds)
        throw new CommitConflictException(
          s"delete lost its input files to a concurrent commit")
      }
      if (result.duplicate) discardAdds(adds)
      val deleted = candidates.map(_.rows).sum - adds.map(_.rows).sum
      DeleteReport(candidates.size, snap.files.size - candidates.size,
        deleted, result.version)
    } finally deleteRecursively(staged)
  }

  /** Upsert by key — MERGE INTO semantics for the common whole-row case:
    * delete current rows whose key appears in `updates`, then insert
    * `updates`, both inside one commit (remove rewritten files + add
    * rewrite and new-data files atomically).
    */
  def upsert(spark: SparkSession, log: LakeLog, table: String,
             updates: DataFrame, keyCol: String,
             txnId: String = UUID.randomUUID().toString): CommitResult = {
    log.committedVersion(table, txnId).foreach(v =>
      return CommitResult(v, duplicate = true))
    val snap = log.snapshot(table)
    val sch = snap.schema.get
    val st = toStructType(sch)
    val partCols = sch.partCols
    val shaped0 = updates.select(st.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType)): _*)
    // the update set is read by the checks aggregate, the key projection,
    // the key-range aggregate AND the staged write — materialize once
    val shaped = shaped0.persist()
    try {
    enforceChecks(table, sch, shaped)
    val keys = shaped.select(keyCol)
    val staged = log.tmpDir(table, txnId)
    // files that might contain an updated key (stats-pruned via the key
    // range of the update set — single min/max conjunct)
    val Seq(loK, hiK) = keys.agg(min(keyCol).cast("string"),
      max(keyCol).cast("string")).collect().head.toSeq.map(String.valueOf)
    // the prune predicate round-trips through the whitespace-tokenizing
    // 3-token grammar: a string key containing whitespace/quotes (or an
    // all-null key set) would be mangled and could prune a file that holds
    // the OLD row — a silent duplicate key. Skip pruning for unsafe values;
    // correctness first, the scan is the fallback.
    val rangeSafe = Seq(loK, hiK).forall(s =>
      s != "null" && s.nonEmpty &&
        !s.exists(c => c.isWhitespace || c == '\'' || c == '"'))
    val candidates =
      if (!rangeSafe) snap.files
      else FilePruning.prune(
        FilePruning.prune(snap.files, s"$keyCol >= $loK", st),
        s"$keyCol <= $hiK", st)
    // stage survivors (layout rewrite of untouched rows) and the update set
    // (logical adds) as SEPARATE file groups, so the CDC feed can replay
    // upserted rows without replaying the rewritten survivors
    withStatFriendlyWrites(spark) {
      if (candidates.nonEmpty)
        readWithPartitions(spark, st, partCols, candidates)
          .join(keys, Seq(keyCol), "left_anti")
          .coalesce(candidates.size)
          .write.mode("overwrite").option("compression", "snappy")
          .partitionBy(partCols: _*)
          .parquet(staged.resolve("rw").toString)
      shaped.coalesce(1)
        .write.mode("overwrite").option("compression", "snappy")
        .partitionBy(partCols: _*)
        .parquet(staged.resolve("new").toString)
    }
    try {
      val rwAdds =
        if (candidates.isEmpty) Nil
        else statAndPromote(spark, log, table, staged.resolve("rw"), st,
          rewrite = true, partCols = partCols, bloomCols = sch.bloomCols)
      val adds = (rwAdds ++
        statAndPromote(spark, log, table, staged.resolve("new"), st,
          partCols = partCols, bloomCols = sch.bloomCols))
        .filter(_.rows > 0)
      val inputPaths = candidates.map(_.path)
      val resultOpt =
        try log.commitWithRetry(table, txnId) { fresh =>
          val live = fresh.files.map(_.path).toSet
          if (inputPaths.forall(live.contains)) Some((adds, inputPaths))
          else None
        } catch { case e: Throwable => discardAdds(adds); throw e }
      val result = resultOpt.getOrElse {
        discardAdds(adds)
        throw new CommitConflictException(
          s"upsert lost its input files to a concurrent commit")
      }
      if (result.duplicate) discardAdds(adds)
      result
    } finally deleteRecursively(staged)
    } finally shaped.unpersist()
  }

  /** Incremental change feed: all rows LOGICALLY added in versions
    * `(fromVersion, toVersion]` (CDC-style consumption — the batch analog
    * of a streaming source over the table; 0/negative `toVersion` = latest).
    * Reads only the delta's files, never the full table, so downstream
    * incremental pipelines pay for what changed. Files re-added by layout
    * operations (compaction, delete/upsert survivor rewrites) carry
    * `rewrite = true` in the log and are excluded — so upsert's new rows DO
    * appear while its rewritten survivors don't. Consumers wanting delete
    * events diff snapshots instead.
    */
  def changesSince(spark: SparkSession, log: LakeLog, table: String,
                   fromVersion: Long, toVersion: Long = 0L): DataFrame = {
    val latest = log.latestVersion(table)
    val to = if (toVersion <= 0) latest else toVersion
    require(fromVersion <= to, s"fromVersion $fromVersion > toVersion $to")
    val sch = log.snapshot(table, to).schema.get
    val st = toStructType(sch)
    val addedFiles = log.versions(table)
      .filter(v => v > fromVersion && v <= to)
      .map(v => log.readEntry(table, v))
      .flatMap(_.adds.filterNot(_.rewrite))
    readWithPartitions(spark, st, sch.partCols, addedFiles)
  }

  /** Row-level DIFF between two versions (Delta `table_changes` analog,
    * keyed): classify every logical row change from `fromVersion` to
    * `toVersion` as insert / delete / update. `keyCols` must uniquely
    * identify a row within each snapshot (the usual CDC primary key).
    *
    * The metadata trick that makes this 100 TB-shaped: files present in
    * BOTH snapshots contribute identical rows by definition (data files
    * are immutable), so only the symmetric difference of the two file
    * lists is read — a table where a DELETE rewrote 3 of 10,000 files
    * diffs by reading 3 + 3 files, not 2 × 10,000. Rows rewritten
    * unchanged (compaction, delete survivors) cancel in the keyed
    * full-outer join and are filtered as no-ops.
    *
    * Output: keyCols, `change_type` ('insert' | 'delete' | 'update'),
    * then `old_<c>` / `new_<c>` for every non-key column (null on the
    * absent side).
    */
  def diff(spark: SparkSession, log: LakeLog, table: String,
           fromVersion: Long, toVersion: Long = 0L,
           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs key columns")
    val latest = log.latestVersion(table)
    val to = if (toVersion <= 0) latest else toVersion
    require(fromVersion <= to, s"fromVersion $fromVersion > toVersion $to")
    val snapA = log.snapshot(table, fromVersion)
    val snapB = log.snapshot(table, to)
    val sch = snapB.schema.get
    val st = toStructType(sch)
    keyCols.foreach(c => require(st.fieldNames.contains(c), s"no column $c"))
    val valCols = st.fieldNames.toSeq.filterNot(keyCols.contains)
    val pathsA = snapA.files.map(_.path).toSet
    val pathsB = snapB.files.map(_.path).toSet
    val onlyA = snapA.files.filterNot(f => pathsB.contains(f.path))
    val onlyB = snapB.files.filterNot(f => pathsA.contains(f.path))
    def side(files: Seq[FileAdd], tag: String): DataFrame = {
      val base =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], st)
        else readWithPartitions(spark, st, sch.partCols, files)
      base.select(keyCols.map(col) ++
        valCols.map(c => col(c).as(s"${tag}_$c")): _*)
    }
    val joined = side(onlyA, "old").withColumn("__in_old", lit(true))
      .join(side(onlyB, "new").withColumn("__in_new", lit(true)),
        keyCols, "full_outer")
    val isUpdate = valCols.map(c =>
        !(col(s"old_$c") <=> col(s"new_$c")))
      .foldLeft(lit(false))(_ || _)
    joined.withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(isUpdate, "update"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type") :++
        valCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Table history — one row per committed version (DESCRIBE HISTORY
    * shape): version, commit time, txn id, schema-change flag, files
    * added/removed and row/byte deltas.
    */
  def history(spark: SparkSession, log: LakeLog, table: String): DataFrame = {
    import spark.implicits._
    log.versions(table).map { v =>
      val e = log.readEntry(table, v)
      (e.version, new java.sql.Timestamp(e.timestamp_ms), e.txn_id,
        e.schema.isDefined, e.adds.size.toLong, e.removes.size.toLong,
        e.adds.map(_.rows).sum, e.adds.map(_.size).sum)
    }.toDF("version", "committed_at", "txn_id", "schema_change",
      "n_added", "n_removed", "rows_added", "bytes_added")
  }

  /** Current-table summary: version, file/row/byte totals, schema,
    * partitioning and CHECK constraints. */
  final case class TableInfo(table: String, version: Long, nFiles: Int,
                             rows: Long, bytes: Long, fields: Seq[String],
                             partitionColumns: Seq[String] = Nil,
                             constraints: Map[String, String] = Map.empty)
  def describe(log: LakeLog, table: String): TableInfo = {
    val snap = log.snapshot(table)
    TableInfo(table, snap.version, snap.files.size,
      snap.files.map(_.rows).sum, snap.files.map(_.size).sum,
      snap.schema.map(_.fields.map(f => s"${f.name}:${f.`type`}"))
        .getOrElse(Nil),
      snap.schema.map(_.partCols).getOrElse(Nil),
      snap.schema.map(_.checks).getOrElse(Map.empty))
  }

  /** RESTORE TABLE ... TO VERSION: make the table's live file set equal the
    * target version's — one metadata-only commit (adds = files visible then
    * but not now, removes = files visible now but not then). No data is
    * copied or rewritten, so restoring a 100 TB table costs one log entry;
    * the restore itself is a new version, so it is undoable and the history
    * remains append-only. Fails if a needed file was VACUUMed away.
    * Restored adds are marked `rewrite` — a restore changes table state,
    * not logical row identity, so the CDC feed does not replay them.
    */
  def restore(log: LakeLog, table: String, toVersion: Long,
              txnId: String = UUID.randomUUID().toString): CommitResult = {
    val target = log.snapshot(table, toVersion)
    target.files.foreach(f =>
      if (!Files.exists(java.nio.file.Paths.get(f.path)))
        throw new LakeValidationException(
          s"cannot restore $table to version $toVersion: ${f.path} " +
            "no longer exists (vacuumed)"))
    log.commitWithRetry(table, txnId) { fresh =>
      val now = fresh.files.map(_.path).toSet
      val then_ = target.files.map(_.path).toSet
      val adds = target.files.filterNot(f => now.contains(f.path))
        .map(_.copy(rewrite = true))
      val removes = fresh.files.map(_.path).filterNot(then_.contains)
      Some((adds, removes))
    }.get
  }

  /** SHALLOW CLONE: a zero-copy snapshot of `src` at `version` (0 = latest)
    * as a new independent table — Delta-style. The clone's version-1 entry
    * re-ADDS the source snapshot's files BY PATH (stats, partitions and
    * bloom-sidecar references ride along); no data bytes move, so cloning a
    * 100 TB table is an O(#files) metadata commit. From then on the tables
    * evolve independently: inserts land in the clone's own data dir, and any
    * copy-on-write rewrite (DELETE/UPSERT/compaction) un-shares exactly the
    * files it touches. Caveat shared with Delta shallow clones: `vacuum` on
    * the SOURCE can delete still-shared files out from under the clone —
    * clone lifetimes must sit inside the source's retention window, or the
    * clone must be compacted (un-shared) first.
    */
  def cloneTable(log: LakeLog, src: String, dst: String, version: Long = 0L,
                 txnId: String = UUID.randomUUID().toString): CommitResult = {
    val snap = log.snapshot(src, version)
    val sch = snap.schema.getOrElse(
      throw new LakeValidationException(s"table $src has no schema"))
    log.createTable(dst, sch)
    log.commit(dst, baseVersion = 0L, txnId, adds = snap.files)
  }

  final case class VacuumReport(examined: Int, deleted: Int, keptLive: Int)

  /** Garbage-collect data files no longer reachable from any RETAINED
    * snapshot: versions > latest - retainVersions stay time-travelable;
    * older versions' removed files are deleted from storage. The log entries
    * themselves are kept (audit trail). Mirrors Delta-style VACUUM with a
    * version-count (rather than wall-clock) retention window — deterministic
    * for tests and single-writer batch pipelines.
    */
  def vacuum(log: LakeLog, table: String, retainVersions: Int = 1,
             tmpRetainMs: Long = 24L * 3600 * 1000): VacuumReport = {
    val latest = log.latestVersion(table)
    val floor = math.max(0L, latest - math.max(0, retainVersions - 1))
    // union of files visible in any retained snapshot
    val live = (floor to latest)
      .flatMap(v => log.snapshot(table, v).files.map(_.path)).toSet
    // every file ever added
    val all = log.versions(table)
      .flatMap(v => log.readEntry(table, v).adds.map(_.path)).distinct
    // ownership guard (Delta-parity): only reclaim files under THIS table's
    // data dir. A shallow clone's log references the source's files by
    // path; once the clone rewrites them away they leave its snapshots, but
    // they are the SOURCE's storage to reclaim, not the clone's.
    val own = log.dataDir(table).toAbsolutePath.toString + java.io.File.separator
    var deleted = 0
    all.foreach { p =>
      if (!live.contains(p) && p.startsWith(own)) {
        if (Files.deleteIfExists(java.nio.file.Paths.get(p))) deleted += 1
        // the bloom sidecar shares its data file's lifecycle
        Files.deleteIfExists(
          java.nio.file.Paths.get(BloomSkip.sidecarPath(p)))
      }
    }
    // sweep staging dirs orphaned by crashed write attempts (normal
    // completion removes them in the writers' finally). Age-gated on the
    // NEWEST mtime across the attempt's whole tree: POSIX doesn't bump a
    // directory's mtime when files land in nested partition subdirs, so
    // the top-level mtime of a long-running partitioned write can be
    // arbitrarily stale while the write is still in flight.
    val cutoff = System.currentTimeMillis() - math.max(0L, tmpRetainMs)
    def newestMtime(p: Path): Long = {
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .map(f => Files.getLastModifiedTime(f).toMillis).max
      finally walk.close()
    }
    val tmpRoot = log.tableDir(table).resolve("_tmp")
    if (Files.exists(tmpRoot)) {
      val children = {
        val s = Files.list(tmpRoot)
        try s.iterator().asScala.toList finally s.close()
      }
      children.foreach { c =>
        if (newestMtime(c) < cutoff) deleteRecursively(c)
      }
    }
    // sweep data files PROMOTED by an attempt that then crashed before its
    // log commit landed: they appear in no log entry (invisible to every
    // reader) and no retry will adopt them (promotion destinations are
    // fresh UUIDs), so they are pure leaked storage. Same age gate — a
    // concurrent writer sitting between promote and commit is younger than
    // the cutoff and untouched.
    val dataDir = log.dataDir(table)
    if (Files.exists(dataDir)) {
      val everAdded = all.toSet
      val kids = {
        val s = Files.list(dataDir)
        try s.iterator().asScala.toList finally s.close()
      }
      kids.foreach { f =>
        val name = f.toString
        if (name.endsWith(".bloom")) {
          // a sidecar is live exactly when its data file is: sweep it when
          // the data file is not in any retained snapshot (same age gate —
          // a promote-then-commit window in flight is younger than cutoff)
          val data = name.stripSuffix(".bloom")
          if (!live.contains(data) &&
              Files.getLastModifiedTime(f).toMillis < cutoff)
            Files.deleteIfExists(f)
        } else if (Files.isRegularFile(f) && !everAdded.contains(name) &&
            Files.getLastModifiedTime(f).toMillis < cutoff &&
            Files.deleteIfExists(f)) deleted += 1
      }
    }
    VacuumReport(all.size, deleted, live.size)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      val all = try walk.iterator().asScala.toList finally walk.close()
      all.reverse.foreach(Files.delete)
    }
}
