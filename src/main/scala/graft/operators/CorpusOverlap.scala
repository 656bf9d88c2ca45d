package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level overlap estimation — "how much does this crawl snapshot /
  * source overlap with that one?", answered from minhash signatures
  * without ever joining the corpora. The per-group signature is the
  * element-wise min of the same portable md5+affine hash family the
  * document-level dedup uses ([[Dedup.portableSigs]] — grouping by
  * source instead of doc id), so the whole machinery sits under the
  * exact cross-engine oracle.
  *
  * Scale shape: the only data-sized work is the shingle hash scan; the
  * per-group min collapses MAP-SIDE, so the exchange carries ≤ groups×k
  * rows regardless of corpus size, and the pairwise comparison is a
  * broadcast self-join over #groups rows — corpora are never joined,
  * text never moves. Signatures are min-mergeable across shards/days
  * (element-wise min), the same operational property as the HLL
  * registers ([[Hll]]).
  *
  * Estimator: E[matches/k] = J(A, B) over the groups' shingle sets
  * (classic MinHash). Outputs are INTEGERS (match counts, floor
  * percentages) — nothing float-sensitive crosses the engine boundary.
  */
object CorpusOverlap {

  /** Pairwise overlap matrix over `groupCol`: one row per unordered group
    * pair with `matches` (signature positions that agree, 0..k) and
    * `jaccard_pct` = ⌊100·matches/k⌋. */
  def signatureOverlap(docs: DataFrame, groupCol: String = "source",
                       k: Int = 16, textCol: String = "text",
                       shingleSize: Int = 3): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of range")
    val sigs = Dedup.portableSigs(docs, k, idCol = groupCol,
      textCol = textCol, shingleSize = shingleSize)
    val a = sigs.select(col("id").as("src_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("id").as("src_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), _ + _).as("matches"))
      .withColumn("jaccard_pct", expr(s"matches * 100L div ${k}L"))
  }
}
