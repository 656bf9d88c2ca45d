package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus overlap: exact bounds on identical/disjoint corpora, estimator
  * accuracy on a known-Jaccard pair, and signature min-mergeability (the
  * property that lets per-day sketches fold into a running one).
  */
class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((src, text), i) => (i.toLong, src, text) }
      .toDF("doc_id", "source", "text")

  test("identical corpora match on every position; disjoint on none") {
    val texts = (0 until 30).map(i =>
      s"alpha bravo charlie token$i delta echo foxtrot golf$i hotel india")
    val same = docs(
      (texts.map("a" -> _) ++ texts.map("b" -> _)): _*)
    val out = CorpusOverlap.signatureOverlap(same, k = 16).head
    assert(out.getAs[Long]("matches") == 16L &&
      out.getAs[Long]("jaccard_pct") == 100L)

    val disj = docs(
      ((0 until 30).map(i => "a" -> s"xx$i yy$i zz$i ww$i vv$i uu$i tt$i") ++
        (0 until 30).map(i => "b" -> s"pp$i qq$i rr$i ss$i nn$i mm$i kk$i")): _*)
    val d = CorpusOverlap.signatureOverlap(disj, k = 16).head
    assert(d.getAs[Long]("matches") <= 2L, s"disjoint matched ${d}")
  }

  test("estimate tracks true shingle Jaccard on a constructed pair") {
    // corpus a: docs 0..59; corpus b: docs 30..89 — half the documents
    // (hence roughly half the distinct shingles) shared
    val texts = (0 until 90).map(i =>
      s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h")
    val d = docs(
      (texts.take(60).map("a" -> _) ++ texts.drop(30).map("b" -> _)): _*)
    // true J: shingle sets are per-doc disjoint by construction, 30
    // shared docs of 90 distinct => J = 30/90 = 1/3
    val out = CorpusOverlap.signatureOverlap(d, k = 64).head
    val est = out.getAs[Long]("matches") / 64.0
    assert(math.abs(est - 1.0 / 3.0) <= 0.18, s"est=$est")
  }

  test("signatures min-merge: per-shard mins fold to the global signature") {
    val texts = (0 until 40).map(i => s"m$i n$i o$i p$i q$i r$i")
    val d = docs(texts.map("a" -> _): _*)
      .withColumn("shard", col("doc_id") % 4)
    val global = Dedup.portableSigs(d, 16, "source", "text", 3)
      .head.getSeq[Long](1)
    val shardSigs = (0 until 4).map(s =>
      Dedup.portableSigs(d.filter(col("shard") === s), 16,
        "source", "text", 3).head.getSeq[Long](1))
    val merged = shardSigs.transpose.map(_.min)
    assert(merged == global)
  }
}
