package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** WordPiece subword tokenization (Wu et al. 2016, arXiv:1609.08144) —
  * the greedy longest-match-first inference rule over a corpus-derived
  * piece inventory, completing the tokenization family next to [[Bpe]]
  * (learned merges) and the regex estimate: continuation pieces carry
  * the `##` prefix, and every position takes the LONGEST vocabulary
  * piece that matches ("maximal munch").
  *
  * The model here is the deterministic-inventory variant: every word
  * substring up to `maxPieceLen` chars whose corpus occurrence count
  * clears `minCount` becomes a piece (position 0 raw, later positions
  * `##`-prefixed), and single characters always enter — the coverage
  * guarantee that makes `[UNK]` impossible on the training corpus
  * (real WordPiece keeps the same guarantee via its base alphabet).
  *
  * Scale split, identical to [[Bpe]]'s: the corpus pass is distributed
  * (explode → piece-candidate fan-out bounded by maxPieceLen × word
  * length → one map-side-combinable count), the collected vocabulary is
  * inventory-sized, and ENCODING runs per DISTINCT word — the greedy
  * loop is a UDF by necessity (data-dependent jumps), but it executes
  * vocabulary-many times, never corpus-many, and off every shuffle
  * path.
  */
object WordPiece {

  final case class WpModel(pieces: Set[String], maxPieceLen: Int)

  val Unk = "[UNK]"

  /** One distributed candidate-count pass → bounded piece inventory. */
  def train(docs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 20L,
            textCol: String = "text"): WpModel = {
    val words = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val cands = words.select(col("c"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), p ->
           transform(sequence(1, least($maxPieceLen, length(w) - p + 1)),
             l -> CASE WHEN p = 1 THEN substring(w, p, l)
                       ELSE concat('##', substring(w, p, l)) END)))"""))
        .as("piece"))
      .groupBy("piece").agg(sum("c").as("n"))
    val pieces = cands.filter(expr(
        s"""n >= $minCount OR length(piece) = 1 OR
           (length(piece) = 3 AND substring(piece, 1, 2) = '##')"""))
      .select("piece").collect().map(_.getString(0)).toSet
    WpModel(pieces, maxPieceLen)
  }

  /** Greedy longest-match-first. A position with no matching piece
    * collapses the whole word to [[Unk]] (unreachable for corpus words
    * under the single-char coverage rule). */
  def encode(model: WpModel)(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val prefix = if (pos == 0) "" else "##"
      var len = math.min(model.maxPieceLen, word.length - pos)
      var found = 0
      while (len >= 1 && found == 0) {
        if (model.pieces.contains(prefix + word.substring(pos, pos + len)))
          found = len
        len -= 1
      }
      if (found == 0) return Seq(Unk)
      out += prefix + word.substring(pos, pos + found)
      pos += found
    }
    out.result()
  }

  /** Corpus piece frequencies: tokenize each DISTINCT word once, weight
    * by its corpus count. */
  def pieceCounts(docs: DataFrame, model: WpModel,
                  textCol: String = "text"): DataFrame = {
    val enc = udf((w: String) => encode(model)(w))
    docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(explode(enc(col("w"))).as("piece"), col("c"))
      .groupBy("piece").agg(sum("c").as("n"))
  }
}
