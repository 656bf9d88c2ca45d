package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-pair construction for embedding models
  * (InfoNCE / in-batch negatives, the Inverse Cloze Task flavor —
  * Lee ACL'19; DPR EMNLP'20 trains retrievers exactly this way): each
  * document ≥ `minToks` tokens splits into (anchor = first half,
  * positive = second half), pairs land in one of `batches` training
  * batches by a portable hash of the id, and every other pair in the
  * batch serves as that pair's negatives — so `n_negatives` =
  * batch size − 1 is part of the emitted contract (loss math needs it).
  *
  * Deterministic end-to-end: the split point is `⌊n/2⌋`, the batch is
  * the 60-bit md5 of the id mod `batches` (reruns, retries, and the
  * SQL oracle all land identical batches), and the halves are exact
  * token-slice joins.
  *
  * Scale shape: the split is a zero-shuffle projection (text crosses
  * the wire once, already in its final pair form); batch sizes are a
  * `batches`-row aggregate attached back by broadcast. The anchor/
  * positive halves deliberately come from ONE document — the
  * construction that needs no labeled pairs at 100 TB; the hard
  * negatives that sharpen it further are the existing
  * [[Similarity.hardNegatives]] face.
  */
object Contrastive {

  def spanPairs(docs: DataFrame, minToks: Int = 8, batches: Int = 16,
                idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(minToks >= 2 && batches >= 2)
    val sp = docs
      .select(col(idCol).as("doc_id"),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("ws"))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= minToks)
      .withColumn("half", expr("n div 2"))
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("b:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % batches).as("batch_id"),
        array_join(slice(col("ws"), lit(1), col("half").cast("int")), " ")
          .as("anchor"),
        array_join(slice(col("ws"), col("half").cast("int") + 1,
          (col("n") - col("half")).cast("int")), " ").as("positive"))
    val sizes = sp.groupBy("batch_id").agg(count(lit(1)).as("__c"))
    sp.join(broadcast(sizes), "batch_id")
      .select(col("doc_id"), col("batch_id"), col("anchor"),
        col("positive"), (col("__c") - 1).as("n_negatives"))
  }
}
