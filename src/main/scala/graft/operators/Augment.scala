package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data augmentation: span corruption (the T5 denoising
  * objective, Raffel et al., JMLR'20 §3.1.4) — rewrite each document into
  * an (input, target) pair by masking token spans with sentinel tokens:
  *
  *   text:   "the quick brown fox jumps"     (brown, fox masked)
  *   input:  "the quick <extra_id_0> jumps"
  *   target: "<extra_id_0> brown fox"
  *
  * Mask decisions are NOT random-number randomness: token (doc, pos) is
  * masked iff a portable 60-bit md5 hash of `"mask:<doc>:<pos>"` is
  * ≡ 0 mod `every` — a pure function of the data, so every run, retry,
  * executor reshuffle, and incremental extension produces the SAME pairs
  * (the same determinism argument as [[Sampling]]), and an external
  * engine can re-render the hash exactly (DuckDB replays the whole
  * construction byte-for-byte in the oracle). Adjacent masked tokens
  * merge into one span: sentinel ids number maximal runs, not tokens —
  * the actual T5 semantics, and the part a naive per-token masker gets
  * wrong.
  *
  * Scale shape: tokenize + mask are pure projections; run-grouping and
  * assembly need ONE exchange keyed by doc id (the run-id window and the
  * final per-doc aggregate share the same hash partitioning, so Catalyst
  * plans a single shuffle). Window partitions carry (pos, token, flags)
  * scalars — parallelism = #docs, no global funnel, and the corpus text
  * crosses the wire exactly once, which is the floor for an operator
  * that rewrites every document.
  */
object Augment {

  /** 60-bit portable mask hash (same rendering recipe as
    * [[Sampling.portableHash01]]): an external engine recomputes it as
    * `('0x' || substring(md5('mask:' || doc || ':' || pos), 1, 15))::BIGINT`. */
  private def maskHash(doc: Column, pos: Column): Column =
    conv(substring(md5(concat(lit("mask:"), doc.cast("string"), lit(":"),
      pos.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Span-corrupt `docs` into (id, input, target, n_masked, n_spans).
    * A token is masked iff its portable hash ≡ 0 mod `every` (expected
    * mask rate 1/`every`); maximal masked runs become `<extra_id_k>`
    * sentinels, numbered per document in position order. Documents with
    * no masked token yield `target = ""` (and input = the original
    * tokenization) — they stay in the output so the pair set covers the
    * corpus exactly.
    */
  def spanCorrupt(docs: DataFrame, every: Int = 5, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(every >= 2, "every >= 2 (1 would mask the whole corpus)")
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), "\\s+"))
        .as(Seq("__i", "tok")))
      .filter(col("tok") =!= "")
      .select(col(idCol), (col("__i") + 1).as("pos"), col("tok"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val masked = toks
      .withColumn("mk", pmod(maskHash(col(idCol), col("pos")),
        lit(every.toLong)) === 0)
      .withColumn("st",
        (col("mk") &&
          !coalesce(lag(col("mk"), 1).over(w), lit(false))).cast("int"))
      .withColumn("rid", sum(col("st")).over(w))
    val sentinel =
      concat(lit("<extra_id_"), (col("rid") - 1).cast("string"), lit(">"))
    val pieces = masked
      .withColumn("__in",
        when(!col("mk"), col("tok")).when(col("st") === 1, sentinel))
      .withColumn("__tgt",
        when(col("mk"), when(col("st") === 1,
          concat(sentinel, lit(" "), col("tok"))).otherwise(col("tok"))))
    def assemble(piece: String): Column = array_join(
      transform(
        array_sort(collect_list(when(col(piece).isNotNull,
          struct(col("pos").as("o"), col(piece).as("p"))))),
        x => x.getField("p")),
      " ")
    pieces.groupBy(col(idCol))
      .agg(assemble("__in").as("input"), assemble("__tgt").as("target"),
        sum(col("mk").cast("long")).as("n_masked"),
        sum(col("st").cast("long")).as("n_spans"))
  }
}
