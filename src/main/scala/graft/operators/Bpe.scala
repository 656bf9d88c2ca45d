package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding subword tokenization, learned from the corpus — the
  * real algorithm (Sennrich et al. 2016, arXiv:1508.07909), not the
  * regex approximation in [[graft.functions.TextFunctions.bpeTokenCount]].
  *
  * Scale split, the same one every production trainer makes: the CORPUS
  * pass is distributed — one `explode → groupBy(word)` shuffling compact
  * (word, count) pairs with map-side combine — and the MERGE LOOP runs on
  * the resulting word-frequency table, which is vocabulary-sized, not
  * corpus-sized (capped at `maxWords` by a distributed top-k, so the
  * driver holds a bounded dict no matter how large the corpus; dropped
  * tail words only cost merge-statistics fidelity, exactly like every
  * frequency-cutoff BPE trainer). Encoding is a per-row bounded loop over
  * broadcast merge ranks — a UDF by necessity (iterative data-dependent
  * control flow per word), off every shuffle path, the same standing the
  * Bloom-probe UDF has.
  */
object Bpe {

  /** Learned model: merge pairs in rank order. `</w>` marks word end, the
    * classic formulation — so "est</w>" (suffix) and "est" (infix) learn
    * independently.
    */
  final case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private val EndOfWord = "</w>"

  /** Base alphabet = Unicode CODE POINTS, not UTF-16 code units: splitting
    * with `w.map(_.toString)` would shear astral-plane characters (emoji,
    * rare CJK) into unpaired surrogate halves — merges would then be
    * learned over malformed half-characters and encode() could emit
    * invalid strings.
    */
  private def symbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** One distributed corpus pass → bounded word-frequency dict → driver
    * merge loop. Deterministic: ties in pair frequency break
    * lexicographically; the word cap breaks ties by (count desc, word).
    */
  def train(docs: DataFrame, nMerges: Int, maxWords: Int = 50000,
            textCol: String = "text"): BpeModel = {
    val wordFreq = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trainFromFreqs(wordFreq.toSeq, nMerges)
  }

  /** The in-memory Sennrich loop over a (word, freq) table. */
  private[operators] def trainFromFreqs(wordFreq: Seq[(String, Long)],
                                        nMerges: Int): BpeModel = {
    // each word as its current symbol sequence (chars + </w>)
    var words: Seq[(Array[String], Long)] = wordFreq.map { case (w, f) =>
      (symbols(w) :+ EndOfWord, f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        i += 1
      }
    }
    BpeModel(merges.result())
  }

  private def mergeOnce(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word with the model: repeatedly apply the LOWEST-rank
    * applicable merge (the standard greedy-by-rank encoder, matching how
    * the merges were learned).
    */
  private[operators] def encodeWord(word: String,
                                    ranks: Map[(String, String), Int])
      : Seq[String] = {
    var syms: Array[String] = symbols(word) :+ EndOfWord
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else {
        syms = mergeOnce(syms, bestPair)
        if (syms.length == 1) continue = false
      }
    }
    syms.toSeq
  }

  /** A merge table trained ONCE (by [[train]], nMerges=64, on the sf0.001
    * fixture corpus) and frozen as literals — the production tokenizer
    * shape: train offline, ship the merge file, encode everywhere. Frozen
    * so the ENCODER is checkable under an exact external oracle.
    *
    * Key property (holds for every genuinely learned table, asserted by
    * BpeSpec): any pair containing a merge's RESULT symbol has a strictly
    * higher rank than that merge — during training the result symbol only
    * exists after its merge applied. Under it, greedy lowest-rank-first
    * encoding ([[encodeWord]]) equals applying the merges once each in
    * rank order, left-to-right non-overlapping ([[replayEncode]]) — which
    * is a fixed chain of string replaces an external SQL engine can run.
    */
  val frozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("d", "er</w>"), ("or", "der</w>"), ("or", "t</w>"),
    ("s", "ort</w>"), ("p", "</w>"), ("par", "t</w>"), ("u", "p</w>"),
    ("a", "g"), ("ag", "g</w>"), ("a", "lu"), ("alu", "e</w>"),
    ("v", "alue</w>"), ("in", "e</w>"), ("l", "ine</w>"), ("e", "y</w>"),
    ("k", "ey</w>"), ("i", "n</w>"), ("j", "o"), ("jo", "in</w>"),
    ("er", "g"), ("erg", "e</w>"), ("m", "erge</w>"), ("er", "y</w>"),
    ("g", "r"), ("gr", "o"), ("gro", "up</w>"), ("q", "u"),
    ("qu", "ery</w>"), ("c", "t"), ("ct", "or"), ("ctor", "</w>"),
    ("e", "ctor</w>"), ("v", "ector</w>"), ("as", "h</w>"),
    ("h", "ash</w>"))

  val frozenModel: BpeModel = BpeModel(frozenMerges)

  /** In-rank-order replay encoding: apply each merge once, left-to-right
    * non-overlapping. Equals [[encodeWord]] under the learned-table rank
    * property above; exists so the spec can PIN that equivalence (it is
    * what the external oracle replays as a replace() chain).
    */
  private[operators] def replayEncode(word: String,
                                      merges: Seq[(String, String)])
      : Seq[String] =
    merges.foldLeft(symbols(word) :+ EndOfWord)(mergeOnce).toSeq

  /** Subword tokens of a text column under `model` (array<string>). The
    * merge-rank map broadcasts once per plan; per-row work is bounded by
    * word length × merges applied.
    */
  def encode(docs: DataFrame, model: BpeModel, textCol: String = "text",
             outCol: String = "bpe_tokens"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model.ranks)
    val enc = udf((ws: Seq[String]) =>
      if (ws == null) null
      else ws.flatMap(w => encodeWord(w, bc.value)))
    docs.withColumn(outCol, enc(tokens(col(textCol))))
  }
}
