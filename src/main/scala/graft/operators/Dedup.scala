package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.functions.VectorExpressions

/** Deduplication operators for training-data pipelines, each designed to
  * scale: work is expressed as groupBy / equi-join on a compact key so Spark
  * shuffles only (id, key) pairs — never full documents — and AQE can handle
  * the inevitable hot buckets.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-text hash.
    *
    * Scale notes: shuffles (fingerprint, id) only; `min(id) per group` is a
    * partial-aggregate (map-side combine), so the shuffle volume is
    * ~#distinct keys, not #rows. The final self-join to recover full rows is
    * an equi-join on the table's key — at 100 TB, prefer this over
    * `Window.partitionBy(fingerprint)` which would shuffle whole rows.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val keep = docs
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min(idCol).as(idCol))
      .select(idCol)
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Spread a small-file corpus across the cluster before expensive per-row
    * compute: a few-MB parquet of documents arrives as ONE scan partition
    * (single row group), serializing regex tokenization onto one core. The
    * shuffle moves only the narrow (id, text) projection. No-op when the
    * source is already well-partitioned (more partitions than parallelism).
    */
  private[operators] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** (id, h) rows: one xxhash64 per distinct word shingle per document.
    * This is THE scalability pivot for both MinHash and SimHash: the regex
    * tokenization + hashing runs exactly once per shingle, and everything
    * downstream is a codegen'd `groupBy(id)` whose map-side partial
    * aggregation compacts each partition to one row per document before any
    * shuffle — shuffle volume ~ #docs × k longs, never #shingles.
    * (Empty text still yields one shingle — the empty string — so no ids drop.)
    */
  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
                            shingleSize: Int,
                            charShingleSize: Int = 0): DataFrame = {
    val shingled =
      if (charShingleSize > 0)
        // character shingles: for languages without whitespace word
        // boundaries (CJK, Thai) where word tokens don't exist
        spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
          .select(col("id"),
            charShingles(col("__text"), charShingleSize).as("__sh"))
      else
        spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
          .select(col("id"), tokens(normalizeText(col("__text"))).as("__toks"))
          .select(col("id"),
            shinglesFromTokens(col("__toks"), shingleSize).as("__sh"))
    shingled
      .select(col("id"), explode(array_distinct(col("__sh"))).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
  }

  /** MinHash signatures as (id, sig: array<long>[k]): k independent min-hash
    * aggregates over the shingle hashes, all inside one vectorized
    * HashAggregate. Per-seed mixing is `xxhash64(h, i)` — a real hash mix
    * with no long-overflow (ANSI mode rejects wrap-around multiply-add).
    */
  def minhashSignatures(docs: DataFrame, k: Int, shingleSize: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text",
                        charShingleSize: Int = 0)
      : DataFrame = {
    val aggs = (0 until k).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    shingleHashes(docs, idCol, textCol, shingleSize, charShingleSize)
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * Classic banding: signature of `bands*rowsPerBand` minhashes, hash each
    * band to a bucket, self-join on (band, bucket). Only (id, band, bucket)
    * rows are shuffled — the join key is 16 bytes/row regardless of document
    * size, which is what makes this viable at 100 TB. Pairs are then scored
    * with the exact signature-estimated Jaccard.
    *
    * Returns (a_id, b_id, est_jaccard) with a_id < b_id, deduped across bands.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      bands: Int = 16, rowsPerBand: Int = 4,
                      idCol: String = "doc_id", textCol: String = "text",
                      shingleSize: Int = 3,
                      charShingleSize: Int = 0): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(docs, k, shingleSize, idCol, textCol,
      charShingleSize)

    // (id, band, bucket): bucket = hash of the band's slice of the signature
    val buckets = sigs.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(concat_ws(",",
              transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
                _.cast("string")))).as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
      // persisted: both candidate-join sides consume this — without the
      // cache the whole shingle→signature aggregation runs twice
      .persist()

    val a = buckets.select(col("band"), col("bucket"),
      col("id").as("a_id"), col("sig").as("a_sig"))
    val b = buckets.select(col("band"), col("bucket"),
      col("id").as("b_id"), col("sig").as("b_sig"))

    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(filter(zip_with(col("a_sig"), col("b_sig"),
          (x, y) => x === y), m => m)).cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("a_id", "b_id").agg(max("est_jaccard").as("est_jaccard"))
    pairs
  }

  /** Portable-hash MinHash+LSH — the exact-oracle face of
    * [[minhashLshPairs]] (same recipe that promoted semantic dedup:
    * freeze the randomness into something both engines compute). ONE
    * md5-derived 28-bit base hash per shingle (`conv(substr(md5(shingle),
    * 1, 7), 16, 10)` — DuckDB's hex-string cast reproduces it
    * bit-for-bit), then the classic universal-hash family
    * `hᵢ = (aᵢ·h + bᵢ) mod (2³¹−1)` supplies the k per-seed functions —
    * aᵢ/bᵢ are exact integer formulas of i, and every product stays under
    * 2⁵⁹ so the arithmetic is overflow-free (ANSI-safe) in both engines.
    * One digest + k 3-op affines per shingle, versus k digests in the
    * naive seeded form — the hash work drops by the signature length.
    * Band keys are the raw signature slices (exactness over key
    * compactness), so banding, candidate generation and the
    * signature-estimated Jaccard all sit under the exact cross-engine
    * oracle. The xxhash64 path stays the production default; the LSH
    * machinery downstream of the hash is THE SAME shape: (id, band, key)
    * shuffles, signature join, est-Jaccard filter.
    */
  /** Portable (md5 + universal-hash affine) minhash signatures — the
    * machinery of [[minhashLshPairsFixed]], shared with the persisted
    * LSH index ([[DedupIndex]]) and the scale smoke's candidate-stage
    * shuffle-byte evidence: `(id, sig: Array[Long])` of length `k`. */
  def portableSigs(docs: DataFrame, k: Int,
                   idCol: String = "doc_id", textCol: String = "text",
                   shingleSize: Int = 3): DataFrame = {
    val P = 2147483647L // 2^31 - 1 (prime): (2^31)·(2^28) < 2^59 — no overflow
    val shingled =
      spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
        .select(col("id"), tokens(normalizeText(col("__text"))).as("__toks"))
        .select(col("id"), explode(array_distinct(
          shinglesFromTokens(col("__toks"), shingleSize))).as("sh"))
        // bind the digest as a column: ONE md5 per shingle, k affines over it
        .select(col("id"),
          conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long").as("h"))
    val aggs = (0 until k).map { i =>
      val a = (1103515245L * (2L * i + 1)) % P
      val b = (12345L + 1013904223L * i) % P
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$i")
    }
    shingled.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Band keys over portable signatures: `(id, sig, band, bucket)` —
    * bucket = the band's raw signature slice comma-joined (exactness over
    * key compactness). */
  private[operators] def portableBandRows(sigs: DataFrame, bands: Int,
                                          rowsPerBand: Int): DataFrame =
    sigs.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            concat_ws(",",
              transform(slice(col("sig"), b * rowsPerBand + 1,
                lit(rowsPerBand)), _.cast("string"))).as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))

  /** Narrow-band LSH candidate mining over precomputed portable
    * signatures: the distinct `(a_id, b_id)` pairs colliding on ≥ 1 band.
    * Its shuffles carry `(id, band, bucket)` rows and the deduped id
    * pairs ONLY — never the k-long signatures (the previous wide shape
    * replicated the signature onto every band row, multiplying the
    * candidate join's volume by bands × sig width: ~16 × 0.5 KB per
    * document at k=64). Exposed standalone so the scale smoke can price
    * exactly this stage's shuffle bytes. */
  def minhashLshCandidates(sigs: DataFrame, bands: Int,
                           rowsPerBand: Int): DataFrame = {
    val buckets = portableBandRows(sigs, bands, rowsPerBand)
      .select(col("id"), col("band"), col("bucket"))
    buckets.select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("band"), col("bucket"),
        col("id").as("b_id")), Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** NOTE (caching contract): the signature table is persisted and stays
    * cached after the returned DataFrame materializes — the band rows and
    * the per-candidate scoring join both consume it, and there is no
    * post-materialization hook to release it from here. Callers composing
    * many invocations in one session should `spark.catalog.clearCache()`
    * between them (Verify and Bench do, per query). */
  def minhashLshPairsFixed(docs: DataFrame, threshold: Double = 0.5,
                           bands: Int = 8, rowsPerBand: Int = 2,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           shingleSize: Int = 3): DataFrame = {
    val k = bands * rowsPerBand
    // persisted: the band rows AND the per-candidate scoring join both
    // consume this — the md5+affine signature pass runs once
    val sigs = portableSigs(docs, k, idCol, textCol, shingleSize).persist()
    // candidates FIRST, over NARROW band rows; the signature-estimated
    // Jaccard is identical whichever band collided, so scoring joins the
    // (distinct) candidate pairs back to ONE signature row per side.
    minhashLshCandidates(sigs, bands, rowsPerBand)
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")),
        Seq("a_id"))
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(filter(zip_with(col("a_sig"), col("b_sig"),
          (x, y) => x === y), m => m)).cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprints as (id, fp): per bit b, sum of ±1 over the
    * shingle hashes' bit b, sign → output bit. 64 sum-aggregates in a single
    * codegen'd HashAggregate over the exploded shingle hashes (same
    * one-row-per-doc-per-partition shuffle shape as [[minhashSignatures]]).
    */
  def simhashFingerprints(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", shingleSize: Int = 2,
                          charShingleSize: Int = 0)
      : DataFrame = {
    val bitAggs = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$b"))
    shingleHashes(docs, idCol, textCol, shingleSize, charShingleSize)
      .groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("fp"))
  }

  /** SimHash near-dup pairs: 64-bit similarity-preserving fingerprint,
    * candidates = pairs agreeing on a combination of fingerprint blocks,
    * verified by exact Hamming distance (Manku et al., WWW 2007 — the
    * Google web-dedup construction). The fingerprint is split into
    * `k = maxHamming + c` blocks: `maxHamming` bit flips touch at most
    * `maxHamming` blocks, so at least `c` blocks survive intact, and by
    * pigeonhole every pair within the radius agrees EXACTLY on at least
    * one of the C(k, c) c-block combinations — joining on each
    * combination's concatenated value guarantees full recall while the
    * join key stays ~c·64/k bits wide. A single-block key (c = 1) at
    * maxHamming = 8 would be ~7 bits — 128 buckets, candidates growing
    * as n²/128 — exactly the quadratic escape this construction closes;
    * c = 3, k = 11 keeps keys ≥ 17 bits at that radius. Shuffle key is
    * (combination id, masked fingerprint) — tiny.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    simhashPairsOfFingerprints(simhashFingerprints(docs, idCol, textCol),
      maxHamming)

  /** Pick the Manku c (intact-block count per join key) by MINIMIZING the
    * estimated total work, not by hitting a fixed key width: with k =
    * maxHamming + c blocks the key is ~c·64/k bits wide, each document is
    * replicated C(k, c) times, and expected candidate pairs per combo are
    * n²/2^width — so cost(c) ≈ C(k,c) · (n + n²/2^width). Replication and
    * selectivity trade off THROUGH the corpus size: at n = 5·10³ docs the
    * quadratic term is negligible and c = 2 (45× replication, ~13-bit
    * keys) beats c = 3 (165×, ~17 bits) threefold; at n = 10⁹ the n²
    * term dominates and the model pushes to the widest key the ≤512×
    * replication cap allows. Callers that know n pass it; without it the
    * conservative fixed-width heuristic (~16-bit keys) applies.
    */
  private[operators] def simhashComboWidth(maxHamming: Int,
                                           nDocs: Long = 0L): Int = {
    def choose(n: Int, r: Int): Long =
      (1 to r).foldLeft(1L)((acc, i) => acc * (n - r + i) / i)
    // blocks must be non-empty: k <= 64
    val maxC = math.max(1, math.min(6, 64 - maxHamming))
    if (nDocs > 0L) {
      val n = nDocs.toDouble
      (1 to maxC).minBy { c =>
        val k = maxHamming + c
        val repl = choose(k, c).toDouble
        if (c > 1 && repl > 512) Double.MaxValue
        else repl * (n + n * n / math.pow(2.0, math.min(62.0, c * 64.0 / k)))
      }
    } else {
      val byWidth = (1 to 4)
        .find(c => c * 64.0 / (maxHamming + c) >= 16.0).getOrElse(4)
      val c = Iterator.iterate(byWidth)(_ - 1)
        .find(c => c == 1 || choose(maxHamming + c, c) <= 512).get
      math.max(1, math.min(c, maxC))
    }
  }

  /** Candidate generation + verification over precomputed (id, fp) rows —
    * split out so the pigeonhole guarantee is testable on constructed
    * fingerprints. Blocks partition the 64 bits as evenly as possible;
    * each join key is the fingerprint masked to one c-block combination
    * (agreeing on the masked value == agreeing on all c blocks).
    */
  private[operators] def simhashPairsOfFingerprints(
      fp0: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    // persist + count: fingerprints feed both join sides AND the corpus
    // size drives the replication/selectivity trade-off above. The cache
    // is (id, fp) — 16 bytes a row — and saves recomputing the shingle
    // aggregation per side.
    val fp = fp0.persist()
    val c = simhashComboWidth(maxHamming, fp.count())
    val nBlocks = maxHamming + c
    val blockMasks = (0 until nBlocks).map { bI =>
      val start = bI * 64 / nBlocks
      val width = (bI + 1) * 64 / nBlocks - start
      (if (width == 64) -1L else (1L << width) - 1L) << start
    }
    val blockCols = (0 until nBlocks).combinations(c).zipWithIndex.map {
      case (combo, comboId) =>
        val mask = combo.map(blockMasks).reduce(_ | _)
        struct(lit(comboId).as("block"),
          col("fp").bitwiseAND(lit(mask)).as("bval"))
    }.toSeq
    val blocks = fp.select(col("id"), col("fp"),
        explode(array(blockCols: _*)).as("bb"))
      .select(col("id"), col("fp"), col("bb.block"), col("bb.bval"))
    val a = blocks.select(col("block"), col("bval"),
      col("id").as("a_id"), col("fp").as("a_fp"))
    val b = blocks.select(col("block"), col("bval"),
      col("id").as("b_id"), col("fp").as("b_fp"))
    a.join(b, Seq("block", "bval"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        hamming64(col("a_fp"), col("b_fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("a_id", "b_id").agg(min("hamming").as("hamming"))
  }

  /** Brute-force all-pairs Hamming over the PRODUCTION (xxhash64)
    * fingerprints — the recall-truth face of [[simhashPairs]]: the Manku
    * banding's pigeonhole guarantee says its candidate set contains every
    * pair within the radius, and this computes that pair set directly so
    * the guarantee is checkable on real data at gate scale (the gate-SF
    * analog of the DuckDB brute-force that checks the PORTABLE face).
    * Broadcast nested-loop + codegen'd popcount, same shape as the
    * mask-Jaccard exact face above — reserved for recall gates, never
    * the production path.
    */
  def simhashPairsBrute(docs: DataFrame, maxHamming: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val fp = simhashFingerprints(docs, idCol, textCol)
    val a = fp.select(col("id").as("a_id"), col("fp").as("a_fp"))
    val b = fp.select(col("id").as("b_id"), col("fp").as("b_fp"))
    a.join(broadcast(b), col("a_id") < col("b_id"), "inner")
      .select(col("a_id"), col("b_id"),
        hamming64(col("a_fp"), col("b_fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Portable-hash SimHash pairs — the exact-oracle face of
    * [[simhashPairs]]: shingle hashes are 60-bit md5-derived values both
    * engines compute identically (fingerprint bits 60-63 are then
    * constant-zero on both sides — 60 effective bits, recall math
    * unchanged). Spark runs the REAL Manku multi-block candidate join;
    * DuckDB verifies it against brute-force all-pairs Hamming — the
    * pigeonhole full-recall guarantee is exactly what makes those two
    * computations equal, so the oracle checks the guarantee itself, not
    * just the arithmetic.
    */
  def simhashPairsFixed(docs: DataFrame, maxHamming: Int = 8,
                        idCol: String = "doc_id", textCol: String = "text",
                        shingleSize: Int = 2): DataFrame = {
    val sh = spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(normalizeText(col("__text"))).as("__toks"))
      .select(col("id"), explode(array_distinct(
        shinglesFromTokens(col("__toks"), shingleSize))).as("sh"))
      .select(col("id"), conv(substring(md5(col("sh")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val bitAggs = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$b"))
    val fp = sh.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("fp"))
    simhashPairsOfFingerprints(fp, maxHamming)
  }

  /** Exact n-gram (word-token) Jaccard similarity pairs above a threshold,
    * via prefix filtering (the PPJoin family of set-similarity joins).
    *
    * A naive token self-join fans out quadratically on frequent tokens — one
    * stop-word shared by D documents alone yields D² join rows, which is what
    * kills the formulation at scale. Prefix filter: order each document's
    * tokens by ascending global frequency; two sets with Jaccard ≥ t MUST
    * share a token within each one's first `|d| − ceil(t·|d|) + 1` tokens, so
    * only those prefix tokens (the globally rarest ones) act as join keys.
    * Candidates are then verified EXACTLY with `array_intersect` over the
    * full sorted token sets — the result is identical to the naive join,
    * only the candidate generation is pruned.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 1, maxBitmaskVocab: Int = 8192,
                        maxBitmaskDocs: Long = 50000): DataFrame = {
    // shingles become xxhash64 longs IMMEDIATELY: every downstream shuffle
    // (document-frequency aggregate, prefix candidate join, verification
    // set) then moves 8-byte keys instead of ~n-word strings. The prefix
    // theorem needs only SOME consistent global token order, so ordering
    // by (df, hash) instead of (df, text) preserves full recall, and the
    // verification sets were already these same hashes.
    val toks = spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(normalizeText(col("__text"))).as("__toks"))
      .select(col("id"), explode(array_distinct(
        shinglesFromTokens(col("__toks"), n))).as("__sh"))
      .select(col("id"), xxhash64(col("__sh")).as("tok"))

    // Strategy choice: prefix filtering prunes candidates only when rare
    // tokens exist. A tiny shared vocabulary (every token a stop word) makes
    // ~every pair a true candidate — there the right representation is a
    // dictionary-encoded BITMASK per document and a codegen'd popcount
    // kernel per pair, not token joins. The bitmask path is all-pairs,
    // though, so it's gated on BOTH dimensions: vocab bounds the mask width
    // but says nothing about corpus size — a huge corpus over a small shared
    // vocabulary must still take the one-shuffle prefix path. `toks` is
    // persisted because every strategy walks it several times (size probe,
    // dict, masks/prefixes) — without it the regex tokenization re-runs per
    // pass AND per join side.
    val toksC = toks.persist()
    val sizes = toksC.agg(countDistinct(col("tok")).as("vocab"),
      countDistinct(col("id")).as("docs")).first()
    val vocab = sizes.getLong(0)
    val nDocs = sizes.getLong(1)
    if (vocab <= maxBitmaskVocab && nDocs <= maxBitmaskDocs)
      bitmaskJaccardPairs(toksC, threshold, vocab.toInt)
    else prefixJaccardPairs(toksC, threshold)
  }

  /** Prefix-filtered set-similarity join (PPJoin-style) for large vocabs.
    *
    * One shuffle of the token table: after the document-frequency join,
    * everything per-document — the (df, tok)-sorted prefix AND the full
    * hash set for verification — comes out of a single `groupBy(id)`
    * (array-sorted in place of two window passes plus a second
    * aggregation, which would shuffle the full token set three times).
    */
  private def prefixJaccardPairs(toks: DataFrame, threshold: Double)
      : DataFrame = {
    // global token frequency → per-doc token order (rarest first); ties
    // broken by token hash so the order is deterministic cluster-wide
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // one row per document: rarity-ordered tokens + sorted token-hash set.
    // Persisted: feeds both candidate-join sides and both verify sides.
    val docs = toks.join(freq, Seq("tok"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
             .as("ordered"),
           sort_array(collect_set(col("tok"))).as("set"))
      .withColumn("sz", size(col("set")))
      // prefix length: sz - ceil(t*sz) + 1 rarest tokens act as join keys
      .withColumn("prefix", transform(
        slice(col("ordered"), lit(1),
          greatest(lit(1), (col("sz") - ceil(lit(threshold) * col("sz")) + 1)
            .cast("int"))),
        s => s.getField("tok")))
      .drop("ordered")
      .persist()

    val candidates = docs
      .select(col("id").as("a_id"), explode(col("prefix")).as("tok"))
      .join(docs.select(col("id").as("b_id"), explode(col("prefix")).as("tok")),
        Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    // exact verification over full sorted token-HASH sets: array_intersect
    // on fixed-width longs instead of strings (exact modulo 64-bit hash
    // collisions, ~n²/2⁶⁴ — negligible)
    candidates
      .join(docs.select(col("id").as("a_id"), col("set").as("a_set")), Seq("a_id"))
      .join(docs.select(col("id").as("b_id"), col("set").as("b_set")), Seq("b_id"))
      .withColumn("c", size(array_intersect(col("a_set"), col("b_set"))))
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") /
          (size(col("a_set")) + size(col("b_set")) - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** All-pairs Jaccard over dictionary-encoded bitmasks — exact, and the
    * per-pair cost is `vocab/64` popcounts inside whole-stage codegen
    * ([[graft.functions.MaskJaccard]]). The block-nested-loop join never
    * shuffles documents, only (id, mask) rows of ~vocab/8 bytes.
    */
  private def bitmaskJaccardPairs(toks: DataFrame, threshold: Double,
                                  vocab: Int): DataFrame = {
    VectorExpressions.register(toks.sparkSession)
    val sp = toks.sparkSession
    import sp.implicits._
    val nWords = (vocab + 63) / 64
    // deterministic dictionary: token hash → dense id in numeric order,
    // via range-sorted zipWithIndex — NOT a global row_number window, which
    // would funnel the whole vocabulary through one reducer the moment the
    // gate above changes
    val dict = toks.select("tok").distinct().orderBy("tok")
      .as[Long].rdd.zipWithIndex()
      .toDF("tok", "tok_idx")
      .select(col("tok"), col("tok_idx").cast("int").as("tok_id"))
    // masks are persisted + materialized: ~vocab/8 bytes per doc, consumed
    // by BOTH sides of the pair join (which would otherwise recompute the
    // whole tokenize→dict→pack pipeline twice)
    val masks = toks.join(broadcast(dict), Seq("tok"))
      .groupBy("id").agg(collect_list("tok_id").as("ids"))
      .select(col("id"), transform(sequence(lit(0), lit(nWords - 1)), w =>
        aggregate(col("ids"), lit(0L), (acc, i) =>
          when((i / 64).cast("int") === w,
            acc.bitwiseOR(call_function("shiftleft", lit(1L),
              pmod(i, lit(64)).cast("int"))))
            .otherwise(acc))).as("mask"))
      .persist()
    masks.count() // force materialization, then drop the token cache
    toks.unpersist()
    val a = masks.select(col("id").as("a_id"), col("mask").as("a_mask"))
    val b = masks.select(col("id").as("b_id"), col("mask").as("b_mask"))
    // broadcast + id-ordering inside the join condition → a single
    // BroadcastNestedLoopJoin whose inner loop is the codegen'd popcount,
    // no CartesianProduct task-pair overhead
    a.join(broadcast(b), col("a_id") < col("b_id"), "inner")
      .select(col("a_id"), col("b_id"),
        VectorExpressions.maskJaccard(col("a_mask"), col("b_mask"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, found via SRP-LSH
    * bucketing (or exact all-pairs when `exact=true`, for small corpora /
    * oracle checks). Buckets shuffle (id, bucket, vec); multi-probe = also
    * match buckets at Hamming distance 1 in bucket-bit space.
    */
  def embeddingNearDupPairs(embs: DataFrame, threshold: Double = 0.98,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            exact: Boolean = false, nBits: Int = 12): DataFrame = {
    VectorExpressions.register(embs.sparkSession)
    val normed = spread(embs.select(col(idCol).as("id"), col(vecCol).as("__v")))
      .select(col("id"), normalize(col("__v")).as("v"))
    if (exact) {
      val a = normed.select(col("id").as("a_id"), col("v").as("a_v"))
      val b = normed.select(col("id").as("b_id"), col("v").as("b_v"))
      a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), VectorExpressions.dotNative(col("a_v"), col("b_v")).as("cos"))
        .filter(col("cos") >= threshold)
    } else {
      val dim = embs.select(size(col(vecCol))).first().getInt(0)
      val planes = randomPlanes(nBits, dim)
      val bucketed = normed.withColumn("bucket", srpBucket(col("v"), planes))
      val a = bucketed.select(col("bucket"), col("id").as("a_id"),
        col("v").as("a_v"))
      val b = bucketed.select(col("bucket"), col("id").as("b_id"),
        col("v").as("b_v"))
      a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), VectorExpressions.dotNative(col("a_v"), col("b_v")).as("cos"))
        .filter(col("cos") >= threshold)
        .groupBy("a_id", "b_id").agg(max("cos").as("cos"))
    }
  }

  /** Span-level (paragraph) dedup, CCNet-style: documents are cut into
    * non-overlapping `spanTokens`-token spans and every span whose content
    * already appeared EARLIER in the corpus (ordered by (doc, position))
    * is removed — the boilerplate-removal stage that doc-level dedup
    * can't do (navigation blocks, license headers, repeated paragraphs
    * survive document-level fingerprinting because the surrounding text
    * differs).
    *
    * Scale shape: the first-occurrence computation shuffles (span-hash,
    * id, pos) — never span text — with min-per-group map-side combine;
    * the rebuild joins only the kept POSITIONS (ints) back by document id
    * and re-slices each document's own token array in place, so document
    * text crosses the wire zero times. Returns the input plus
    * `text_spandedup` and `n_spans_kept`.
    */
  def dropDuplicateSpans(docs: DataFrame, spanTokens: Int = 8,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val w = spanTokens
    // The token array is BOUND as a column before any transform() lambda
    // references it: a higher-order lambda re-evaluates every referenced
    // subtree per element, so an inline tokens(text) here would re-run the
    // split+filter once per span — O(tokens²/spanTokens) per document.
    val toks = col("__toks")
    val nSpans = ceil(size(toks).cast("double") / w).cast("int")
    val spanArr = when(nSpans > 0,
      transform(sequence(lit(0), nSpans - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
      .otherwise(array().cast("array<string>"))
    val spans = spread(docs.select(col(idCol), col(textCol)))
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), posexplode(spanArr))
      .toDF(idCol, "pos", "span")
    // global first occurrence per span content: only (hash, id, pos) moves
    val kept = spans
      .select(md5(col("span")).as("h"), col(idCol), col("pos"))
      .groupBy("h").agg(min(struct(col(idCol), col("pos"))).as("f"))
      .select(col(s"f.$idCol").as(idCol), col("f.pos").as("pos"))
      .groupBy(idCol).agg(sort_array(collect_list("pos")).as("__keep"))
    docs.join(kept, Seq(idCol), "left")
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("text_spandedup",
        array_join(transform(coalesce(col("__keep"),
            array().cast("array<int>")),
          p => array_join(slice(toks, p * w + 1, lit(w)), " ")), " "))
      .withColumn("n_spans_kept",
        coalesce(size(col("__keep")), lit(0)).cast("int"))
      .drop("__keep", "__toks")
  }

  /** Exact duplicate-SUBSTRING removal, ExactSubstr-style (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): every `shingleTokens`-token window (stride 1 — all
    * overlapping positions, unlike [[dropDuplicateSpans]]'s disjoint
    * spans) whose content appears ANYWHERE else in the corpus keeps only
    * its global first occurrence (ordered by (doc, position)); tokens
    * covered by a later occurrence are removed from the document. This is
    * the paper's remove-all-but-one semantics at token-window granularity
    * — where the suffix-array implementation finds maximal duplicated
    * byte ranges, overlapping fixed-width windows find the same runs:
    * consecutive duplicated windows merge into one removed span because
    * their covered positions union.
    *
    * Scale shape: per-content first occurrences come from a `groupBy(hash)
    * .agg(min(struct(id,pos)), count)` — fully map-side combinable, so a
    * content duplicated a million times still contributes ONE row per map
    * partition to the shuffle. Occurrences then join the firsts to find
    * "duplicated AND not the keeper" rows; deliberately a JOIN and not a
    * rank window, because AQE can skew-split a join partition holding a
    * pathologically hot content (replicating the one matching build row),
    * while a window partition must sort in a single task. Covered token
    * positions are ints aggregated per document, and the rebuild
    * re-slices each document's own token array in place (`array_except`
    * is a hash-set difference, O(tokens)) — document text never crosses
    * the wire. Stride-1 shingling emits one row per token, the same
    * O(corpus tokens) a suffix array pays, one scan.
    *
    * Returns the input plus `text_substrdedup` and `n_tokens_removed`.
    */
  def maskDuplicateSubstrings(docs: DataFrame, shingleTokens: Int = 8,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    require(shingleTokens >= 1, "shingleTokens must be >= 1")
    val k = shingleTokens
    // bind the token array as a column BEFORE any transform() lambda
    // references it (higher-order lambdas re-evaluate referenced subtrees
    // per element — the documented O(tokens²) trap)
    val toks = col("__toks")
    val windows = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          p => array_join(slice(toks, p + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    val occ = spread(docs.select(col(idCol), col(textCol)))
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), posexplode(windows))
      .toDF(idCol, "pos", "w")
      .select(md5(col("w")).as("h"), col(idCol), col("pos"))
    // "duplicated AND not the keeper": min(struct) == the (id, pos)-order
    // first occurrence (struct ordering is lexicographic by field), count
    // tells whether the content repeats at all. The aggregate is map-side
    // combined; the join (not a rank window) lets AQE skew-split hot
    // contents.
    val firsts = occ.groupBy("h").agg(
      min(struct(col(idCol), col("pos"))).as("__first"),
      count(lit(1)).as("__cnt"))
    val covered = occ.join(firsts, "h")
      .filter(col("__cnt") > 1 &&
        !(col(idCol) === col(s"__first.$idCol") &&
          col("pos") === col("__first.pos")))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .groupBy(idCol).agg(sort_array(collect_set("p")).as("__cov"))
    docs.join(covered, Seq(idCol), "left")
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__cov",
        coalesce(col("__cov"), array().cast("array<int>")))
      .withColumn("__keep", array_except(
        when(size(toks) > 0, sequence(lit(0), size(toks) - 1))
          .otherwise(array().cast("array<int>")),
        col("__cov")))
      .withColumn("text_substrdedup",
        array_join(transform(col("__keep"),
          p => element_at(toks, p + 1)), " "))
      .withColumn("n_tokens_removed", size(col("__cov")).cast("int"))
      .drop("__cov", "__keep", "__toks")
  }

  /** Semantic near-duplicate pairs, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with spherical k-means
    * ([[Similarity.kmeansCentroids]] — all-DataFrame Lloyd, deterministic
    * seeds), then compare vectors ONLY within a cluster. Where SRP-LSH
    * buckets by random hyperplanes, this buckets by the corpus's own
    * density structure — the standard recipe for semantic (meaning-level)
    * dedup of training corpora.
    *
    * Scale shape: the k-means rounds shuffle (id, vec) narrow projections;
    * the candidate join shuffles each vector once, partitioned by its
    * `centroid_id`, and compares within clusters of ~n/k vectors. Every
    * reported pair is exact-rescored (native dot product), so precision is
    * 1.0 by construction — clustering only bounds RECALL, like every
    * SemDeDup deployment. By default k is DERIVED from the corpus size
    * ([[deriveK]]: `max(16, ceil(n/4096))`) so n/k clusters fit a reducer
    * and parallelism grows with the data — the pair join partitions by
    * centroid_id, so its parallelism is exactly the number of clusters
    * (the SemDeDup paper runs tens of thousands; at 1 B docs the default
    * derives ~244k clusters). Pass k explicitly to pin it. A pathological
    * corpus that collapses into one cluster degrades to the within-cluster
    * quadratic — raise k or pre-split on a cheap key.
    *
    * `nProbe` is the recall lever for pairs that straddle a cluster
    * boundary: each vector lands in its `nProbe` nearest clusters (soft
    * assignment), so a pair is compared whenever ANY probed cluster is
    * shared. Work scales ~nProbe² per cluster; nProbe=2 recovers most
    * boundary pairs at moderate thresholds.
    */
  /** Normalize, cluster and soft-assign the corpus: (id, v, centroid_id,
    * __ccos) with one row per (vector, probed cluster), materialized so the
    * pair self-join's two sides and any scoring consumer read ONE
    * assignment pass. `__ccos` is the vector's cosine to that centroid.
    */
  /** Cluster count for the learned path when the caller doesn't pick one:
    * `max(kMin, ceil(n / targetClusterSize))`. The cluster count IS the
    * pair join's parallelism (it partitions by centroid_id) AND bounds the
    * within-cluster quadratic at ~targetClusterSize² comparisons, so a
    * default that ignores corpus size is safe only by footnote — this one
    * is safe by construction (one cheap count of an already-checkpointed
    * projection).
    */
  private[operators] def deriveK(n: Long, kMin: Int = 16,
                                 targetClusterSize: Long = 4096): Int = {
    require(kMin >= 1 && targetClusterSize >= 1)
    math.min(
      math.max(kMin.toLong, (n + targetClusterSize - 1) / targetClusterSize),
      Int.MaxValue.toLong).toInt
  }

  private def clusteredAssignments(embs: DataFrame, k: Int, kmeansIters: Int,
                                   nProbe: Int, idCol: String,
                                   vecCol: String): DataFrame = {
    VectorExpressions.register(embs.sparkSession)
    val normed = spread(embs.select(col(idCol).as("id"), col(vecCol).as("__v")))
      .select(col("id"), normalize(col("__v")).as("v"))
      .localCheckpoint() // read by every Lloyd round AND the pair join
    val kEff = if (k > 0) k else deriveK(normed.count())
    val cents = Similarity.kmeansCentroids(normed, kEff, kmeansIters, "v")
    Similarity.assignNearest(normed, cents, "v", nProbe).localCheckpoint()
  }

  private[graft] def pairsOfAssignments(assigned: DataFrame, threshold: Double,
                                        nProbe: Int): DataFrame = {
    val a = assigned.select(col("centroid_id"), col("id").as("a_id"),
      col("v").as("a_v"))
    val b = assigned.select(col("centroid_id"), col("id").as("b_id"),
      col("v").as("b_v"))
    val raw = a.join(b, Seq("centroid_id")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorExpressions.dotNative(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= threshold)
    // a pair sharing several probed clusters surfaces once per shared
    // cluster — collapse (same exact cos each time, max is a no-op dedup)
    if (nProbe == 1) raw
    else raw.groupBy("a_id", "b_id").agg(max("cos").as("cos"))
  }

  /** `k <= 0` (the default) derives the cluster count from the corpus size
    * via [[deriveK]]; pass an explicit k to pin it.
    */
  def semanticDupPairs(embs: DataFrame, threshold: Double = 0.9,
                       k: Int = 0, kmeansIters: Int = 2, nProbe: Int = 1,
                       idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame =
    pairsOfAssignments(
      clusteredAssignments(embs, k, kmeansIters, nProbe, idCol, vecCol),
      threshold, nProbe)

  /** [[semanticDupPairs]] with a DETERMINISTIC FIXED-POINT Lloyd fit:
    * vectors are quantized to integers (`floor(x·scale)` per component —
    * float→double widening and one rounded multiply, bit-identical in
    * any IEEE engine), centroids are seeded from the k smallest ids and
    * updated by exact integer floor-mean per dimension, and assignment
    * minimizes the exact integer squared L2 (ties → lower centroid id).
    * Every arithmetic step is order-independent integer math, so the
    * clustering is reproducible across partitionings, engine versions
    * AND engines — float Lloyd is none of these (a double mean's value
    * depends on the partition-merge order), which is why the learned
    * float path (q_dedup_semantic through round 10) could never sit
    * under a cross-engine oracle. Candidate pairs are still rescored
    * with the EXACT cosine over the full vectors ([[pairsOfAssignments]]
    * — precision 1.0 by construction, clustering only bounds recall),
    * so quantization touches only which pairs get compared.
    *
    * Scale shape is the frozen-codebook path's: k explicit (the pair
    * join's parallelism), assignment an n×k broadcast-join argmin, the
    * update one posexplode groupBy (n·dim rows, integer partials).
    * Overflow-safe by construction: |q| ≤ scale·maxAbs ≈ 2²¹ per
    * component, squared-distance sums ≤ dim·2⁴⁴ « 2⁶³ (ANSI-clean).
    */
  def semanticDupPairsFixedPoint(embs: DataFrame, threshold: Double,
                                 k: Int, kmeansIters: Int, nProbe: Int = 1,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding",
                                 scale: Long = 1000000L): DataFrame = {
    require(k >= 1 && kmeansIters >= 0 && nProbe >= 1)
    VectorExpressions.register(embs.sparkSession)
    val normed = spread(embs.select(col(idCol).as("id"), col(vecCol).as("__v")))
      .select(col("id"), normalize(col("__v")).as("v"),
        transform(col("__v"), x => floor(x.cast("double") * scale)).as("qv"))
      .localCheckpoint() // read by every Lloyd round AND the pair join
    // assignment: integer L2 argmin over the (tiny, explicit-k) centroid
    // set; rank ≤ probe with ties broken by centroid id
    def assign(cents: DataFrame, probe: Int): DataFrame = {
      val scored = normed.crossJoin(broadcast(cents))
        .select(col("id"), col("v"), col("qv"), col("cid"),
          aggregate(zip_with(col("qv"), col("qc"),
            (a, b) => (a - b) * (a - b)), lit(0L), _ + _).as("dist"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("dist"), col("cid"))
      scored.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= probe)
        .drop("__rk", "dist")
    }
    // init: the k smallest ids' quantized vectors, cid by id order
    val wInit = org.apache.spark.sql.expressions.Window.orderBy("id")
    var cents = normed.orderBy("id").limit(k)
      .select((row_number().over(wInit) - 1).cast("int").as("cid"),
        col("qv").as("qc"))
      .localCheckpoint()
    (0 until kmeansIters).foreach { _ =>
      // exact integer floor-mean per (centroid, dim): div of the
      // pmod-adjusted sum is floorDiv, pure integer end to end
      val upd = assign(cents, probe = 1)
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        // `div` (integral) on the pmod-adjusted sum IS floorDiv — the
        // adjusted sum divides exactly, so truncation never engages
        .selectExpr("cid", "pos", "(s - pmod(s, n)) div n AS q")
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("q")))),
          s => s.getField("q")).as("qc"))
      // an emptied cluster keeps its previous centroid (both engines)
      cents = cents.select(col("cid"), col("qc").as("__qc0"))
        .join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("qc"), col("__qc0")).as("qc"))
        .localCheckpoint()
    }
    val assigned = assign(cents, nProbe)
      .select(col("cid").as("centroid_id"), col("id"), col("v"))
      .localCheckpoint()
    pairsOfAssignments(assigned, threshold, nProbe)
  }

  /** [[semanticDupPairs]] against a FROZEN codebook instead of fitting
    * k-means: `cents` is (centroid_id, centroid[unit-norm]). The
    * operational shape for continuous ingestion — fit centroids once (or
    * reuse an IVF index's), assign every new batch against the same
    * codebook so cluster ids stay stable across batches. Also the
    * oracle-checkable face of the machinery: with given centroids the
    * whole assign → within-cluster pair → exact-rescore pipeline is
    * deterministic SQL, so the driver's DuckDB gate can hash-match it
    * (q_dedup_semantic_fixed), which the learned-centroid path can't.
    */
  def semanticDupPairsWithCentroids(embs: DataFrame, cents: DataFrame,
                                    threshold: Double, nProbe: Int = 1,
                                    idCol: String = "vec_id",
                                    vecCol: String = "embedding"): DataFrame = {
    VectorExpressions.register(embs.sparkSession)
    val normed = spread(embs.select(col(idCol).as("id"), col(vecCol).as("__v")))
      .select(col("id"), normalize(col("__v")).as("v"))
    val assigned =
      Similarity.assignNearest(normed, cents, "v", nProbe).localCheckpoint()
    pairsOfAssignments(assigned, threshold, nProbe)
  }

  /** Semantic dedup: keep one representative per connected component of the
    * [[semanticDupPairs]] graph. `docs` is the full-width corpus; only ids
    * (plus one scalar score) move through the component computation and the
    * final anti-join, so document payloads are scanned once.
    *
    * `keep` picks the representative:
    *  - `"min_id"` (default): deterministic and cheapest;
    *  - `"far_from_centroid"`: the member with the LOWEST cosine to its
    *    primary centroid — the SemDeDup paper's rule (arXiv:2303.09540 §3:
    *    keeping low-similarity-to-centroid examples preserves diversity at
    *    the cluster edge). Ties break to the lower id.
    */
  def semanticDedup(docs: DataFrame, embs: DataFrame,
                    threshold: Double = 0.9, k: Int = 0,
                    kmeansIters: Int = 2, nProbe: Int = 1,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    keep: String = "min_id"): DataFrame = {
    require(Set("min_id", "far_from_centroid").contains(keep),
      s"unknown keep strategy: $keep")
    val assigned =
      clusteredAssignments(embs, k, kmeansIters, nProbe, idCol, vecCol)
    val pairs = pairsOfAssignments(assigned, threshold, nProbe)
    if (keep == "min_id") dropDuplicatesExact(docs, pairs, idCol)
    else {
      // primary-centroid cosine per member (nProbe rows → max = nearest)
      val scores = assigned.groupBy("id").agg(max("__ccos").as("__ccos"))
      val winners = connectedComponents(pairs)
        .join(scores, Seq("id"))
        .groupBy("component")
        // lexicographic struct min = lowest centroid cosine, then lowest id
        .agg(min(struct(col("__ccos"), col("id"))).as("w"))
        .select(col("w.id").as(idCol))
      val members = pairs.select(col("a_id").as(idCol))
        .unionAll(pairs.select(col("b_id").as(idCol))).distinct()
      val losers = members.join(winners, Seq(idCol), "left_anti")
      docs.join(losers, Seq(idCol), "left_anti")
    }
  }

  /** Keep one representative per near-duplicate cluster: given candidate
    * pairs (a_id < b_id), drop every id that appears as the "b" of a pair
    * with a surviving "a" — the standard greedy union-find approximation done
    * in one shuffle (for exact clusters use [[connectedComponents]] +
    * keep-min-per-cluster).
    */
  def dropDuplicates(docs: DataFrame, pairs: DataFrame,
                     idCol: String = "doc_id"): DataFrame = {
    val toDrop = pairs.select(col("b_id").as(idCol)).distinct()
    docs.join(toDrop, Seq(idCol), "left_anti")
  }

  /** Connected components over near-duplicate pairs — (id, component) where
    * component = min id reachable from `id`. Large-star/small-star-style
    * label propagation: each round every node adopts the smallest label in
    * its neighborhood (self + neighbors), iterating to fixpoint. Rounds are
    * O(graph diameter / log) and dedup similarity graphs are shallow
    * (dup clusters are near-cliques), so 3-8 rounds settle; each round is
    * ONE groupBy over the (undirected) edge list — no driver-side graph.
    * Convergence: labels are node ids and every step (neighborhood min,
    * pointer doubling) is non-increasing per node, so the label SUM is a
    * strictly-decreasing monotone until the fixpoint — one scalar
    * aggregate per round detects convergence, no join-and-count pass
    * (decimal(38,0) so a 10⁹-node × 2⁶³-id sum cannot overflow).
    * `maxIter` bounds the worst case.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
                          driverSolveMaxEdges: Long = 1L << 20): DataFrame = {
    // undirected neighbor list as (node, neighbor), plus self-loops so
    // isolated-in-one-direction nodes keep their own label
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionAll(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .distinct()
      .persist()
    // Adaptive driver solve (same standing as the corpus-size-gated bitmask
    // Jaccard): a dedup graph that survived LSH banding is usually TINY
    // relative to the corpus — when the deduped edge list fits comfortably
    // on the driver, label propagation's 2 jobs × rounds are pure overhead
    // vs one collect + union-find. Identical output (component = min
    // reachable id) — only the venue changes; beyond the gate the
    // distributed fixpoint below is the 100 TB path. Long ids only (every
    // caller's id domain); anything else takes the general path.
    val idsAreLong = edges.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    if (idsAreLong && edges.count() <= 2 * driverSolveMaxEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      edges.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      es.foreach { case (u, v) =>
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        // union by min id: the root IS the component label
        if (ru < rv) parent(rv) = ru else if (rv < ru) parent(ru) = rv
      }
      return parent.keys.toSeq.sorted.map(id => (id, find(id)))
        .toDF("id", "component")
    }
    var labels = edges.select(col("u").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .persist()
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("component").cast("decimal(38,0)"))).head()
        .getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty graph
    }
    // a localCheckpoint'd DF is NOT freed by Dataset.unpersist (its blocks
    // bypass the cache manager) — extract the materialized RDD so each
    // round can free the previous round's blocks deterministically instead
    // of letting up to maxIter copies of the label table pile up until GC
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case _ => None
      }
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      iter += 1
      // neighborhood minimum, materialized BEFORE the pointer-doubling
      // self-join: both join sides read this subtree, and differently-
      // aliased projections defeat exchange reuse — without a persist the
      // whole edge-join + groupBy would run twice per round (the round-5
      // candidate-self-join lesson, PLANS.md). persist (not checkpoint):
      // it frees deterministically at end of round.
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "v"), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min("component").as("nbr_min"))
        .join(labels, Seq("id"))
        .select(col("id"),
          least(col("component"), col("nbr_min")).as("component"))
        .persist()
      // pointer doubling: adopt the label OF the label — turns O(diameter)
      // propagation into O(log n) rounds (labels always reference real nodes)
      // localCheckpoint (not persist): truncates the lineage, so round N's
      // plan doesn't re-analyze rounds 1..N-1 — without it, planning time
      // grows superlinearly with iterations
      val next = nbrMin.as("x")
        .join(nbrMin.select(col("id").as("lid"),
          col("component").as("lcomp")).as("y"),
          col("x.component") === col("y.lid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.lcomp"), col("x.component")).as("component"))
        .localCheckpoint() // eager — next is materialized after this line
      // monotone fixpoint test: unchanged sum ⇔ no label moved this round
      val newSum = labelSum(next)
      nbrMin.unpersist()
      checkpointRdd(labels).foreach(_.unpersist(blocking = false))
      labels.unpersist() // no-op for checkpointed rounds, frees round 0
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
    }
    edges.unpersist()
    labels
  }

  /** Exact cluster dedup: keep the minimum id of every connected component
    * (plus all never-paired docs).
    */
  def dropDuplicatesExact(docs: DataFrame, pairs: DataFrame,
                          idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental exact dedup: drop rows of `newDocs` whose normalized
    * fingerprint already exists in `corpus` (and dedup within the batch,
    * keeping lowest id). The shape for continuous ingestion — pairs with
    * [[graft.lake.LakeTable.changesSince]]: only fingerprints move through
    * the anti-join, the corpus text is never re-read beyond its fingerprint
    * column (at scale you'd persist a fingerprint index table and join
    * against that).
    */
  def incrementalExactDedup(corpus: DataFrame, newDocs: DataFrame,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val corpusFps = corpus
      .select(fingerprint(col(textCol)).as("fp")).distinct()
    exactDedup(newDocs, idCol, textCol)
      .withColumn("fp", fingerprint(col(textCol)))
      .join(corpusFps, Seq("fp"), "left_anti")
      .drop("fp")
  }

  /** Mergeable Bloom membership index over the corpus's content
    * fingerprints — the scale path for incremental dedup: built once per
    * corpus (one scan, distributed partial sketches merged like any
    * aggregate), kept driver/broadcast-side (metadata-priced: ~1.2 GB for
    * 1e9 fingerprints at 1% fpp), and extended per ingested batch with
    * `mergeInPlace` instead of ever re-scanning history.
    */
  def fingerprintBloom(corpus: DataFrame, expectedItems: Long,
                       fpp: Double = 0.01, textCol: String = "text")
      : org.apache.spark.util.sketch.BloomFilter =
    corpus.select(fingerprint(col(textCol)).as("fp"))
      .stat.bloomFilter("fp", expectedItems, fpp)

  /** Incremental exact dedup against a Bloom-indexed corpus. EXACT result
    * (identical to [[incrementalExactDedup]]): the bloom admits no false
    * negatives, so rows it rejects are definitely new and skip the join
    * entirely; only bloom-positive rows (true duplicates + the fpp share)
    * verify against the materialized corpus fingerprint table via
    * anti-join. At 100 TB this is the difference between anti-joining
    * EVERY new row against the historical fingerprint set and joining a
    * left side that is ~|dups| + fpp·|batch| — keep `corpusFps`
    * clustered/bucketed by fp so that residual join co-locates. The bloom
    * probe is a Scala UDF (no built-in expression exists); it is one
    * bounded hash probe per row against broadcast bits, off the
    * shuffle path.
    */
  def incrementalExactDedupBloom(corpusFps: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bc = newDocs.sparkSession.sparkContext.broadcast(bloom)
    // null fingerprint (null text) ⇒ probe false: a null key never matches
    // the anti-join either, so both paths agree that the row is kept
    val mightContain =
      udf((fp: String) => fp != null && bc.value.mightContain(fp))
    // persisted: the definitely-new and maybe branches both read it, and
    // without materialization the in-batch dedup (groupBy + semi-join +
    // fingerprinting) would execute twice per ingested batch
    val batch = exactDedup(newDocs, idCol, textCol)
      .withColumn("fp", fingerprint(col(textCol)))
      .persist()
    val definitelyNew = batch.filter(!mightContain(col("fp")))
    val verified = batch.filter(mightContain(col("fp")))
      .join(corpusFps.select("fp").distinct(), Seq("fp"), "left_anti")
    definitelyNew.unionByName(verified).drop("fp")
  }

  /** The standard corpus-dedup pipeline, composed from the operators above
    * the way a training-data run wires them: (1) exact dedup on normalized
    * fingerprints (cheap, removes the bulk), (2) MinHash-LSH candidate pairs
    * over the survivors, (3) connected components over the near-dup graph,
    * (4) keep one representative per cluster. Returns the cleaned corpus.
    * Every stage shuffles compact keys only; the full documents move once,
    * in the final semi-join.
    */
  def dedupPipeline(docs: DataFrame, nearDupThreshold: Double = 0.8,
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val exact = exactDedup(docs, idCol, textCol)
    val pairs = minhashLshPairs(exact, nearDupThreshold,
      idCol = idCol, textCol = textCol)
    dropDuplicatesExact(exact, pairs, idCol)
  }
}
