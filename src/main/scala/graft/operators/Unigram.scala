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

  /** Words at or under this length take the enumerated search (≤ 2^11
    * paths); longer words — a URL, a base64 blob, one unbroken CJK run —
    * take the O(len·maxPieceLen) Viterbi DP below. Without the cutoff a
    * single 200-char whitespace token costs ~1.93^200 enumerated paths:
    * an effective hang on real crawl data. */
  private val EnumMaxLen = 12

  /** Exact argmax segmentation under (score DESC, #pieces ASC, piece
    * path ASC): enumerated for short words, Viterbi DP for long ones —
    * bit-identical results (the order is prefix-monotone: score and
    * piece count are additive, and of two distinct same-text prefixes
    * neither is a string prefix of the other, so the comparison is
    * stable under appending a common suffix — the single best prefix
    * per position is safe to keep). */
  def encode(model: UgModel)(word: String): Seq[String] =
    if (word.length <= EnumMaxLen) encodeEnum(model)(word)
    else encodeViterbi(model)(word)

  private def encodeEnum(model: UgModel)(word: String): Seq[String] = {
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

  /** The long-word path: classic Viterbi over prefix lengths, carrying
    * (score, #pieces, joined path, reversed pieces) per position and the
    * SAME total order as the enumeration. O(len · maxPieceLen) states ×
    * transitions — a 10k-char blob encodes in ~40k hash probes. */
  private def encodeViterbi(model: UgModel)(word: String): Seq[String] = {
    val n = word.length
    val best = new Array[(Long, Int, String, List[String])](n + 1)
    best(0) = (0L, 0, "", Nil)
    var pos = 0
    while (pos < n) {
      val cur = best(pos)
      if (cur != null) {
        val maxL = math.min(model.maxPieceLen, n - pos)
        var len = 1
        while (len <= maxL) {
          val piece = word.substring(pos, pos + len)
          model.scores.get(piece).foreach { s =>
            val cand = (cur._1 + s, cur._2 + 1,
              if (cur._3.isEmpty) piece else cur._3 + "|" + piece,
              piece :: cur._4)
            val old = best(pos + len)
            if (old == null || cand._1 > old._1 ||
                (cand._1 == old._1 && (cand._2 < old._2 ||
                  (cand._2 == old._2 && cand._3 < old._3))))
              best(pos + len) = cand
          }
          len += 1
        }
      }
      pos += 1
    }
    if (best(n) == null) Seq("[UNK]") else best(n)._4.reverse
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
