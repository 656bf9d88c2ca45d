package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All functions are composed from `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage-compatible) — no Scala UDFs in the hot path, so a
  * 100 TB scan of a `text` column stays inside WholeStageCodegen and the
  * parquet reader only materializes the referenced columns.
  */
object TextFunctions {

  /** Normalize text: lowercase, trim, collapse internal whitespace runs. */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Unicode NFC normalization (UAX #15): canonical-composes combining
    * sequences so visually-identical strings hash/dedup identically —
    * standard first step of every text-curation pipeline. Spark has no
    * built-in normalizer, so this is a UDF over `java.text.Normalizer`
    * (bounded per-row work, off every shuffle path — the same standing as
    * the Bloom-probe and BPE-encode UDFs); DuckDB's `nfc_normalize`
    * implements the same algorithm, which is what makes the oracle exact.
    */
  def nfc(c: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    f(c)
  }

  /** Full cleaning pass: NFC-compose, strip C0 control characters (except
    * tab/newline/CR, which the whitespace collapse handles) and DEL, then
    * collapse whitespace runs and trim — mirrored exactly by the DuckDB
    * oracle's nfc_normalize + regexp chain.
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(c),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Token count without materializing the token array twice. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-token estimate: split on whitespace AND on
    * letter/digit/punctuation boundaries — the usual cheap proxy for an LLM
    * tokenizer's token count when the real vocab isn't available.
    */
  def bpeTokenCount(c: Column): Column =
    // letter runs | digit runs | single other-symbols; RE2-compatible (no
    // lookarounds) so the DuckDB oracle can evaluate the identical pattern.
    size(regexp_extract_all(c,
      lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Character n-gram shingles of the normalized text (for MinHash / Jaccard
    * on languages without word boundaries). Split to single characters once,
    * then the same zip_with fold as [[shinglesFromTokens]] — referencing the
    * normalized string O(n) times instead of once per character position
    * (higher-order lambdas re-evaluate referenced subtrees per element).
    */
  def charShingles(c: Column, n: Int): Column = {
    val norm = normalizeText(c)
    val chars = split(norm, "")
    val m = greatest(size(chars) - (n - 1), lit(0))
    val sh = (1 until n).foldLeft(slice(chars, lit(1), m))((acc, j) =>
      zip_with(acc, slice(chars, lit(j + 1), m), (x, y) => concat(x, y)))
    when(length(norm) < n, array(norm)).otherwise(sh)
  }

  /** Word n-gram shingles from a PRE-BOUND token-array column.
    *
    * Formulated as a zip_with fold over n shifted slices — n references to
    * `toks` total — instead of `transform(indices, i => slice(toks, i+1, n))`
    * whose lambda re-evaluates the `toks` subtree per element (higher-order
    * lambdas are interpreted with no CSE, so with an inline tokenizer that
    * means O(#tokens) regex evaluations per row). Bind the tokenizer with
    * `.select(tokens(...).as("toks"))` first when calling in a hot path.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      val m = greatest(size(toks) - (n - 1), lit(0))
      val sh = (1 until n).foldLeft(slice(toks, lit(1), m))((acc, j) =>
        zip_with(acc, slice(toks, lit(j + 1), m),
          (x, y) => concat(x, lit(" "), y)))
      when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(sh)
    }

  /** Word n-gram shingles joined with a separator (convenience form; hot
    * paths should bind the token array and use [[shinglesFromTokens]]). */
  def wordShingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokens(normalizeText(c)), n)

  /** Deterministic 128-bit document fingerprint of the normalized text.
    * md5 keeps it engine-portable (the DuckDB oracle computes the same value);
    * use [[simhash64]] when a similarity-preserving fingerprint is needed.
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Rolling polynomial hash over tokens (Rabin-Karp style), all in modular
    * int64 arithmetic so it's stable across engines and partitionings.
    */
  def rollingHash(c: Column): Column =
    aggregate(tokens(normalizeText(c)), lit(0L),
      (acc, tok) => pmod(acc * lit(1000003L) + pmod(xxhash64(tok), lit(1000000007L)),
        lit(1000000007L)))

  // SimHash lives in graft.operators.Dedup.simhashFingerprints: as a single
  // Column expression the 64 per-bit sums would re-evaluate the shingle
  // tokenization once per bit (higher-order lambdas are interpreted and not
  // CSE'd) — the DataFrame-shaped explode+groupBy formulation is ~100× faster
  // and shuffles one row per document.

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // --- Language identification (n-gram / stopword heuristic) -------------

  /** Tiny per-language stopword lists; public knowledge (most frequent
    * function words). Kept deliberately small: the scoring is the point, the
    * lists are swappable.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("de", "la", "que", "el", "en", "los", "del", "las", "por", "un"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "que", "une", "pour", "qui"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"),
    "pt" -> Seq("de", "que", "em", "para", "com", "uma", "os", "não", "mais", "das"),
    "it" -> Seq("di", "che", "il", "la", "per", "del", "con", "una", "sono", "della"))

  /** Score of `text` against one language = fraction of tokens that are that
    * language's stopwords.
    */
  def langScore(c: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    val toks = tokens(normalizeText(c))
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Fraction of CJK (Han/Hiragana/Katakana/Hangul) characters — scripts
    * with no whitespace word boundaries, where stopword scoring can't work.
    */
  def cjkRatio(c: Column): Column = {
    val norm = regexp_replace(c, "\\s", "")
    when(length(norm) === 0, 0.0).otherwise(
      length(regexp_replace(norm,
        "[^\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]", ""))
        .cast("double") / length(norm))
  }

  /** Best-scoring language, "und" (undetermined) when nothing matches.
    * Script check first: a CJK-dominant text is classified by script
    * ("zh" for Han — a full build would split ja/ko by kana/hangul the same
    * way); otherwise stopword scoring with a deterministic tie-break
    * (lexicographically smallest code wins among equals).
    *
    * Shaped as `greatest(scores)` + one linear CASE chain — a
    * running-max fold (`when(s > best, s).otherwise(best)`) would embed
    * the accumulator subtree twice per step, doubling the expression per
    * language (2^6 copies of the first tokenization); with higher-order
    * token functions evaluated interpreted, that fold is ~10× slower.
    */
  def langId(c: Column): Column = {
    val ordered = stopwords.keys.toSeq.sorted
    val scores = ordered.map(l => langScore(c, l))
    val best = greatest(scores: _*)
    val pick = ordered.zip(scores).foldRight(lit("und")) {
      case ((lang, s), els) => when(s === best && s > 0.0, lit(lang))
        .otherwise(els)
    }
    when(cjkRatio(c) > 0.3, lit("zh")).otherwise(pick)
  }

  // --- Quality scoring ----------------------------------------------------

  /** Heuristic document-quality features (C4/Gopher-style cheap filters):
    * length, mean word length, symbol ratio, stopword ratio, digit ratio.
    * Returns a struct so one pass computes everything.
    */
  def qualityFeatures(c: Column): Column = {
    val norm = normalizeText(c)
    val toks = tokens(norm)
    val nChars = length(norm).cast("double")
    val nTok = size(toks).cast("double")
    struct(
      nChars.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      when(nTok > 0, (nChars - (nTok - 1)) / nTok).otherwise(0.0)
        .as("mean_token_len"),
      when(nChars > 0,
        length(regexp_replace(norm, "[\\p{L}\\p{N}\\s]", "")) / nChars)
        .otherwise(0.0).as("symbol_ratio"),
      when(nChars > 0, length(regexp_replace(norm, "[^0-9]", "")) / nChars)
        .otherwise(0.0).as("digit_ratio"),
      langScore(c, "en").as("en_stopword_ratio"))
  }

  /** Scalar quality score in [0,1] from the features: rewards sane lengths,
    * penalizes symbol/digit soup.
    */
  def qualityScore(c: Column): Column = {
    val f = qualityFeatures(c)
    val lenOk = when(f("n_tokens") >= 5 && f("n_tokens") <= 100000, 1.0)
      .otherwise(0.3)
    val wordOk = when(f("mean_token_len") >= 2 && f("mean_token_len") <= 12, 1.0)
      .otherwise(0.5)
    val symOk = greatest(lit(0.0), lit(1.0) - f("symbol_ratio") * 4)
    val digOk = greatest(lit(0.0), lit(1.0) - f("digit_ratio") * 2)
    round(lenOk * wordOk * symOk * digOk, 6)
  }
}
