package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Token-budget sequence packing: assign each document to a fixed-size
  * training chunk (the shard/sequence-assembly step between curation and
  * tokenization in an LLM data pipeline). A document lands in the chunk
  * where its token stream STARTS: `chunk_id = floor(start_offset /
  * budget)` with `start_offset` = running token count of the preceding
  * documents in its stream.
  *
  * Distributed relaxation (the 100 TB design point): exact global packing
  * is a sequential scan, so the corpus is split into `nShards` independent
  * streams per `partCol` value (shard = doc_id mod nShards) and packed
  * within each (partCol, shard) stream. Chunk quality is unchanged — every
  * chunk still holds ~`budget` tokens — only chunk *membership* differs
  * from the sequential answer, which no trainer cares about. Pick nShards
  * so one stream's (id, n_tok) scalars fit a task comfortably; the window
  * never sees the text column, only the narrow scalar projection, so a
  * stream of 100M docs is ~1.6 GB of longs — and nShards scales it down
  * linearly from there.
  */
object Packing {

  /** Length-bucketed batch assembly — the padding-efficiency step of
    * batched inference / sequence-parallel training: a batch is padded
    * to its LONGEST member, so batching a 10-token doc with a
    * 1000-token doc wastes 990 slots. Documents land in buckets of
    * similar length (`bucket = (len − 1) div bucketWidth`), each bucket
    * is cut into fixed-size batches in a declared deterministic order
    * (length desc, id asc — longest first, so a batch's pad target is
    * its FIRST member), and per-batch padding waste comes out as
    * integer evidence: `padding = n·max_len − Σlen`.
    *
    * Scale shape: the window partitions by BUCKET — parallelism =
    * #buckets, each task ranking only its bucket's (id, len) scalars;
    * text never enters the shuffle ([[packByTokenBudget]]'s discipline).
    * Returns one row per batch: (bucket, batch_id, n_docs, max_len,
    * sum_len, padding) — all integers, bit-replayable.
    */
  def lengthBucketedBatches(docs: DataFrame, bucketWidth: Int,
                            batchSize: Int, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0)
    val base = Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("len"))
      .filter(col("len") > 0)
      .withColumn("bucket", expr(s"(len - 1) div $bucketWidth"))
    base
      .withColumn("batch_id",
        expr(s"(row_number() OVER (PARTITION BY bucket ORDER BY " +
          s"len DESC, $idCol ASC) - 1) div $batchSize").cast("long"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"), max("len").as("max_len"),
        sum("len").as("sum_len"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("sum_len"))
  }

  def packByTokenBudget(docs: DataFrame, budget: Long, nShards: Int = 8,
                        idCol: String = "doc_id", textCol: String = "text",
                        partCol: String = "source"): DataFrame = {
    require(budget > 0 && nShards > 0)
    // token counts first, in one spread projection — the window below
    // shuffles ONLY (id, part, shard, n_tok), never the text
    val base = Dedup.spread(
        docs.select(col(idCol), col(partCol), col(textCol)))
      .select(col(idCol), col(partCol),
        pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        size(tokens(col(textCol))).cast("long").as("n_tok"))
    val w = Window.partitionBy(partCol, "shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("chunk_id",
        floor(coalesce(sum("n_tok").over(w), lit(0L)) / budget))
      .select(col(idCol), col(partCol), col("shard"), col("n_tok"),
        col("chunk_id"))
  }
}
