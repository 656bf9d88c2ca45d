package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * §3) — the MOSS plagiarism-detection core and the storage-bounded
  * sibling of full rolling-hash fingerprinting: from the sequence of
  * word k-gram hashes, each sliding window of `w` consecutive hashes
  * contributes its MINIMUM (rightmost occurrence on ties), and only the
  * selected (hash, pos) pairs are kept. The paper's two guarantees hold
  * exactly: any shared run of ≥ w+k-1 tokens produces ≥1 shared
  * fingerprint (no false negatives above the guarantee threshold), and
  * the expected density of selected positions is 2/(w+1) — the scale
  * point: a 100 TB corpus stores and shuffles ~2/(w+1) of its gram
  * hashes instead of all of them, with a user-dialable
  * guarantee-vs-storage knob, where [[Dedup.exactSubstrDedup]]'s stride-1
  * windows keep every position.
  *
  * Selection is stateless per position (plain winnowing, not the
  * paper's "robust" stateful variant) so it is engine-portable: position
  * j is selected iff SOME window covering it has j as its rightmost
  * minimum, i.e. for some split a+b = w-1 the `a` hashes immediately
  * left are all ≥ h(j) and the `b` hashes immediately right are all
  * > h(j), with the window fully inside the document. That is a fixed
  * OR over w lag/lead conjunctions — one window spec, one exchange on
  * doc id, replayed verbatim by the DuckDB oracle. Hashes are the
  * portable 60-bit md5 family shared with the LSH oracle faces.
  *
  * Scale shape: gram formation and selection ride ONE doc-keyed
  * exchange (lead-built grams, NOT a higher-order lambda); the overlap
  * join carries only selected (hash, doc) rows, its fan-out bounded by
  * the `maxDf` stop-hash gate exactly as in [[Containment]]; pair
  * counts aggregate on (a, b) longs. Docs with fewer than w grams have
  * no full window and contribute no fingerprints (documented choice;
  * shorter docs are below any useful guarantee threshold anyway).
  */
object Winnowing {

  /** Selected fingerprints: (id, pos, h) — `pos` is the token index the
    * winning k-gram starts at. `k` = words per gram, `w` = hashes per
    * window; guarantee threshold t = w + k - 1 tokens. */
  def fingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
                   idCol: String = "doc_id",
                   textCol: String = "page"): DataFrame = {
    require(k >= 2 && w >= 2, "need k >= 2, w >= 2")
    val toks = docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\\s+"))
        .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val win = Window.partitionBy("id").orderBy("pos")
    val gramCol = concat_ws(" ",
      col("tok") +: (1 until k).map(i => lead(col("tok"), i).over(win)): _*)
    val grams = toks
      .withColumn("g",
        when((1 until k).map(i => lead(col("tok"), i).over(win).isNotNull)
          .reduce(_ && _), gramCol))
      .filter(col("g").isNotNull)
      .select(col("id"), col("pos"),
        conv(substring(md5(concat(lit("wf:"), col("g"))), 1, 15), 16, 10)
          .cast("long").as("h"))
    // rightmost-min-of-some-window, as w lag/lead conjunctions over the
    // SAME ordered window (Catalyst evaluates each frame once)
    val hw = Window.partitionBy("id").orderBy("pos")
    def leftOk(a: Int): Column =
      (1 to a).map(i => lag(col("h"), i).over(hw).isNotNull &&
        lag(col("h"), i).over(hw) >= col("h"))
        .foldLeft(lit(true))(_ && _)
    def rightOk(b: Int): Column =
      (1 to b).map(i => lead(col("h"), i).over(hw).isNotNull &&
        lead(col("h"), i).over(hw) > col("h"))
        .foldLeft(lit(true))(_ && _)
    val selected = (0 until w)
      .map(a => leftOk(a) && rightOk(w - 1 - a))
      .reduce(_ || _)
    grams.withColumn("__sel", selected).filter(col("__sel"))
      .select("id", "pos", "h")
  }

  /** Ordered overlap pairs (a_id, b_id, shared, nfp, cov_ppm): documents
    * sharing ≥ `minShared` distinct fingerprint hashes, with coverage
    * of A's fingerprint set in integer ppm. Hashes present in more than
    * `maxDf` documents are excluded (stop-phrase gate = join fan-out
    * bound, as in [[Containment.containmentPairs]]). */
  def overlapPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                   maxDf: Long = 50, minShared: Long = 2,
                   idCol: String = "doc_id",
                   textCol: String = "page"): DataFrame = {
    require(maxDf >= 1 && minShared >= 1)
    val fp = fingerprints(docs, k, w, idCol, textCol)
      .select(col("id").as("a"), col("h")).distinct()
      .localCheckpoint()
    val rare = fp.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("h")
    val fg = fp.join(rare, Seq("h"), "left_semi").localCheckpoint()
    val sz = fg.groupBy("a").agg(count(lit(1)).as("nfp"))
    fg.join(fg.select(col("h"), col("a").as("b")), "h")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sz, "a")
      .withColumn("cov_ppm", expr("shared * 1000000L div nfp"))
      .select(col("a").as("a_id"), col("b").as("b_id"), col("shared"),
        col("nfp"), col("cov_ppm"))
  }
}
