package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Unigram-LM subword tokenization (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model): segmentation = the piece sequence
  * maximizing the sum of piece log-probabilities, completing the
  * tokenization family's third real face next to [[Bpe]] (learned
  * merges, bottom-up) and [[WordPiece]] (greedy longest-match) — unigram
  * picks the GLOBALLY best segmentation, not the locally longest piece.
  *
  * Log-probabilities are frozen INTEGER "staircase log₂" scores so the
  * argmax is exact and cross-engine (libm log is the 1-ulp hazard the
  * oracle discipline bans): for count c with blen = ⌊log₂ c⌋,
  * `staircase(c) = 8·blen + ⌊8c/2^blen⌋ − 8` — a monotone piecewise
  * approximation of 8·log₂(c) both engines compute with bin()/shifts.
  * A piece's score is `staircase(count) − staircase(total)` (≈ 8·log₂ p,
  * always negative, so fewer pieces win naturally); ties break by fewer
  * pieces, then lexicographically smaller piece path — total order, no
  * engine-dependent argmax.
  *
  * Scale split, identical to [[Bpe]]/[[WordPiece]]: one distributed
  * candidate-count pass builds the inventory (bounded fan-out per word),
  * the collected model is inventory-sized, and ENCODING runs once per
  * DISTINCT word — the segmentation search is per-word work off every
  * shuffle path. Words here are short (whitespace tokens), so the
  * search enumerates all segmentations exactly (≤ 2^(len−1) paths, ≤
  * 128 at len 8) — bit-identical to Viterbi DP under the same tie-break
  * and simpler to replay; the production swap for long-tail words is
  * the O(len·maxPieceLen) DP with the identical order.
  */
object Unigram {

  final case class UgModel(scores: Map[String, Long], maxPieceLen: Int)

  /** Integer staircase ≈ 8·log₂(c): exact, monotone, portable. */
  def staircase(c: Long): Long = {
    require(c > 0, "staircase needs a positive count")
    val blen = 63 - java.lang.Long.numberOfLeadingZeros(c)
    blen.toLong * 8 + ((c * 8) >> blen) - 8
  }

  /** One distributed substring-count pass → inventory with frozen
    * integer scores. Every substring up to `maxPieceLen` chars clearing
    * `minCount` enters; single chars always enter (the coverage rule
    * that guarantees every corpus word segments). */
  def train(docs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 20L,
            textCol: String = "text"): UgModel = {
    val words = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val inv = words.select(col("c"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), p ->
           transform(sequence(1, least($maxPieceLen, length(w) - p + 1)),
             l -> substring(w, p, l))))""")).as("piece"))
      .groupBy("piece").agg(sum("c").as("n"))
      .filter(col("n") >= minCount || length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = inv.map(_._2).sum
    val lpTotal = staircase(total)
    UgModel(inv.map { case (p, n) => p -> (staircase(n) - lpTotal) }.toMap,
      maxPieceLen)
  }

  /** Exact argmax segmentation under (score DESC, #pieces ASC, piece
    * path ASC) — enumerated, which at these word lengths IS Viterbi. */
  def encode(model: UgModel)(word: String): Seq[String] = {
    var best: (Long, Int, String, List[String]) = null
    def search(pos: Int, score: Long, k: Int, acc: List[String]): Unit =
      if (pos == word.length) {
        val path = acc.reverse
        val key = (score, k, path.mkString("|"), path)
        if (best == null || key._1 > best._1 ||
            (key._1 == best._1 && (key._2 < best._2 ||
              (key._2 == best._2 && key._3 < best._3))))
          best = key
      } else {
        var len = math.min(model.maxPieceLen, word.length - pos)
        while (len >= 1) {
          val piece = word.substring(pos, pos + len)
          model.scores.get(piece).foreach(s =>
            search(pos + len, score + s, k + 1, piece :: acc))
          len -= 1
        }
      }
    search(0, 0L, 0, Nil)
    if (best == null) Seq("[UNK]") else best._4
  }

  /** Corpus piece frequencies: segment each DISTINCT word once, weight
    * by its corpus count — the [[WordPiece.pieceCounts]] shape. */
  def pieceCounts(docs: DataFrame, model: UgModel,
                  textCol: String = "text"): DataFrame = {
    val enc = udf((w: String) => encode(model)(w))
    docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(explode(enc(col("w"))).as("piece"), col("c"))
      .groupBy("piece").agg(sum("c").as("n"))
  }
}
