package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-gram CONTAINMENT detection (Broder, SEQUENCES'97 §2) — the
  * asymmetric sibling of Jaccard near-dup: C(A,B) = |S(A)∩S(B)| / |S(A)|
  * over word n-gram sets. Jaccard misses partial inclusion by
  * construction (a tweet quoted inside a long article has tiny union
  * overlap); containment is exactly the "is A quoted/embedded inside B"
  * signal — quote detection, attribution auditing, and the
  * contained-document face of dedup (C = 1 ⇒ A's every shingle occurs
  * in B).
  *
  * Semantics are EXACT and engine-portable: distinct word n-grams per
  * document, grams with document frequency > `maxDf` excluded as
  * stop-grams (the CCNet-style informativeness gate — and the scale
  * gate: it bounds the per-gram join fan-out at maxDf², so no hub gram
  * can go quadratic), containment in integer ppm (`shared·10⁶ div |A|`).
  * The DuckDB oracle replays tokenize → grams → df gate → pair counts →
  * ppm to bit-equality.
  *
  * Scale shape: grams form via two `lead` steps over a doc-keyed window
  * (one exchange, shared with every other per-doc rewrite here — NOT a
  * higher-order lambda, which would re-evaluate the token array per
  * element); the pair join carries (gram, doc) rows whose fan-out the
  * df gate bounds; pair counts aggregate on (a, b) longs. Gram strings
  * ride the exchange (short, 3 words) — a production variant hashes
  * them 64-bit and keeps strings only for collision verify, the
  * [[Boilerplate]] two-pass device.
  */
object Containment {

  /** Deterministic quoted-corpus fixture: every 5th document appends the
    * first 20 words of document `(id+13) mod n` — a planted quote with
    * known source, reproducible in SQL. All other pages pass through. */
  def synthesizeQuoted(docs: DataFrame): DataFrame = {
    val n = docs.select(count(lit(1)).as("__n"))
    val src = docs.select(col("doc_id").as("__sid"), col("text").as("__stext"))
    docs.crossJoin(broadcast(n))
      .withColumn("__src", pmod(col("doc_id") + 13, col("__n")))
      .join(broadcast(src),
        col("__src") === col("__sid") && pmod(col("doc_id"), lit(5)) === 0,
        "left")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" "),
            array_join(slice(filter(split(col("__stext"), "\\s+"),
              t => t =!= ""), 1, 20), " ")))
          .otherwise(col("text")).as("page"))
  }

  /** All ordered pairs (a, b) with containment(a in b) ≥ `minPpm` parts
    * per million, over distinct word `n`-grams with document frequency
    * ≤ `maxDf`. Returns (a_id, b_id, shared, n_grams, c_ppm). */
  def containmentPairs(pages: DataFrame, n: Int = 3, maxDf: Long = 50,
                       minPpm: Long = 300000, idCol: String = "doc_id",
                       textCol: String = "page"): DataFrame = {
    require(n >= 2 && maxDf >= 1 && minPpm >= 1 && minPpm <= 1000000)
    val toks = pages
      .select(col(idCol).as("a"), posexplode(split(col(textCol), "\\s+"))
        .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val w = Window.partitionBy("a").orderBy("pos")
    val gramCol = concat_ws(" ",
      col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(w)): _*)
    val grams = toks
      .withColumn("g",
        when((1 until n).map(i => lead(col("tok"), i).over(w).isNotNull)
          .reduce(_ && _), gramCol))
      .filter(col("g").isNotNull)
      .select("a", "g").distinct()
      .localCheckpoint()
    val rare = grams.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("g")
    val fg = grams.join(rare, Seq("g"), "left_semi").localCheckpoint()
    val sz = fg.groupBy("a").agg(count(lit(1)).as("n_grams"))
    fg.join(fg.select(col("g"), col("a").as("b")), "g")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .join(sz, "a")
      .withColumn("c_ppm", expr("shared * 1000000L div n_grams"))
      .filter(col("c_ppm") >= minPpm)
      .select(col("a").as("a_id"), col("b").as("b_id"), col("shared"),
        col("n_grams"), col("c_ppm"))
  }
}
