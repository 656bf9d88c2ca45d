package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{LakeLog, LakeTable}

/** Persisted MinHash-LSH index — the continuous-crawl shape of near-dup
  * detection. One-shot pair mining ([[Dedup.minhashLshPairsFixed]])
  * re-shingles the WHOLE corpus every run; at 100 TB the history must be
  * indexed once and only the new batch pay compute:
  *
  *  - the index is a lake table of `(doc_id, band, bucket, sig)` band
  *    rows, hash-CLUSTERED by bucket with a per-file BLOOM on the bucket
  *    column — so probes open only the files whose sketch can contain a
  *    colliding key;
  *  - a new batch computes its own signatures (O(batch)), probes the
  *    index with a bucket equi-join — when the batch's distinct keys fit
  *    a driver list, they become an `isin` filter that reaches the scan
  *    and prunes via bloom + min/max stats, so probe I/O is
  *    O(collisions), not O(history);
  *  - accepted (non-duplicate) docs APPEND their band rows — incremental
  *    growth, no rebuild; the lake's compaction keeps the file count
  *    bounded and rebuilds the blooms as it goes.
  *
  * Signatures are the portable md5+affine family, so the whole pipeline
  * (index build → probe → est-Jaccard) replays exactly cross-engine —
  * the q_dedup_minhash_index oracle face. The reference has no dedup
  * surface at all; the published recipe is Broder's minhash + LSH
  * banding as used by CCNet/RefinedWeb-style dedup at crawl scale.
  */
object DedupIndex {

  import org.apache.spark.sql.types._

  /** Band rows of a document set in index shape: `(doc_id, band, bucket,
    * sig)` — sig rendered as the comma-joined signature (exact longs; the
    * lake's scalar types don't include long arrays, and string equality
    * of the renderings IS long equality). */
  def bandRows(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 2,
               idCol: String = "doc_id", textCol: String = "text",
               shingleSize: Int = 3): DataFrame = {
    val sigs = Dedup.portableSigs(docs, bands * rowsPerBand, idCol, textCol,
      shingleSize)
    Dedup.portableBandRows(sigs, bands, rowsPerBand)
      .select(col("id").as("doc_id"), col("band").cast("int").as("band"),
        col("bucket"),
        concat_ws(",", transform(col("sig"), _.cast("string"))).as("sig"))
  }

  private val indexSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", StringType, nullable = false),
    StructField("sig", StringType, nullable = false)))

  /** Create the index lake table and load `docs` into it. Bucket-clustered
    * files + a bucket bloom make later probes file-pruned. */
  def buildIndex(spark: SparkSession, log: LakeLog, table: String,
                 docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 2,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleSize: Int = 3, numFiles: Int = 8): Unit = {
    LakeTable.createTable(log, table, indexSchema,
      bloomFilterCols = Seq("bucket"))
    appendToIndex(spark, log, table, docs, bands, rowsPerBand, idCol,
      textCol, shingleSize, numFiles)
  }

  /** Append a batch's band rows (call with the docs ACCEPTED after a
    * probe — survivors join the history without any rebuild). */
  def appendToIndex(spark: SparkSession, log: LakeLog, table: String,
                    docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 2,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleSize: Int = 3, numFiles: Int = 8): Unit = {
    LakeTable.insert(spark, log, table,
      bandRows(docs, bands, rowsPerBand, idCol, textCol, shingleSize),
      numFiles = numFiles, clusterBy = Seq("bucket"))
    ()
  }

  /** Probe the index with a new batch: `(new_id, hist_id, est_jaccard)`
    * for every history doc sharing ≥1 band bucket with a batch doc and
    * estimated Jaccard ≥ threshold. History text is never touched — only
    * its band rows, and only the files the batch's keys can't rule out.
    *
    * Key-list scan pruning is COST-GATED on the history's file count
    * (a one-row metadata read from the log): collecting the batch's
    * distinct bucket keys costs a full extra pass over the batch's band
    * rows, which only repays itself when the isin filter can drop many
    * history files via their bucket blooms/stats. Below `minPruneFiles`
    * the probe is a single pass — batch signatures flow straight into
    * the equi-join, no persist, no key collect. At crawl scale the
    * history holds thousands of files and the prune path engages;
    * `maxProbeKeys` bounds the driver-side key list (batch_docs × bands
    * keys) and a bigger batch degrades gracefully to the full
    * index-scan equi-join — correct either way. */
  def probeIndex(spark: SparkSession, log: LakeLog, table: String,
                 newDocs: DataFrame, threshold: Double = 0.5,
                 bands: Int = 8, rowsPerBand: Int = 2,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleSize: Int = 3,
                 maxProbeKeys: Int = 10000,
                 minPruneFiles: Int = 32): DataFrame = {
    val k = bands * rowsPerBand
    val batch0 = bandRows(newDocs, bands, rowsPerBand, idCol, textCol,
      shingleSize)
      .select(col("doc_id").as("new_id"), col("band"), col("bucket"),
        col("sig").as("new_sig"))
    val index0 = LakeTable.readIndexed(spark, log, table)
    val (batch, index) =
      if (log.snapshot(table).files.size < minPruneFiles) (batch0, index0)
      else {
        // both the key-collect and the join consume the batch rows —
        // localCheckpoint (not persist) so the materialized blocks
        // outlive this call and the caller's execution never recomputes
        // the signature pass
        val b = batch0.localCheckpoint()
        val keys = b.select("bucket").distinct().limit(maxProbeKeys + 1)
          .collect().map(_.getString(0))
        // within budget: the isin filter reaches the LakeFileIndex and
        // the bucket blooms/stats drop every file with no colliding key
        (b, if (keys.length <= maxProbeKeys)
          index0.filter(col("bucket").isin(keys.toSeq: _*)) else index0)
      }
    val hist = index.select(col("doc_id").as("hist_id"), col("band"),
      col("bucket"), col("sig").as("hist_sig"))
    batch.join(hist, Seq("band", "bucket"))
      .filter(col("new_id") =!= col("hist_id"))
      .select(col("new_id"), col("hist_id"),
        (size(filter(zip_with(
          split(col("new_sig"), ","), split(col("hist_sig"), ","),
          (x, y) => x === y), m => m)).cast("double") / k)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("new_id", "hist_id")
      .agg(max("est_jaccard").as("est_jaccard"))
  }

  /** One incremental-dedup step: probe, keep batch docs with NO history
    * near-dup, append the survivors' band rows. Returns the survivors. */
  def dedupBatchAgainstIndex(spark: SparkSession, log: LakeLog,
                             table: String, newDocs: DataFrame,
                             threshold: Double = 0.5, bands: Int = 8,
                             rowsPerBand: Int = 2, idCol: String = "doc_id",
                             textCol: String = "text",
                             shingleSize: Int = 3): DataFrame = {
    val dups = probeIndex(spark, log, table, newDocs, threshold, bands,
      rowsPerBand, idCol, textCol, shingleSize)
      .select(col("new_id").as(idCol)).distinct()
    val survivors = newDocs.join(dups, Seq(idCol), "left_anti")
    appendToIndex(spark, log, table, survivors, bands, rowsPerBand, idCol,
      textCol, shingleSize)
    survivors
  }
}
