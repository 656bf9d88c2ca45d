package graft.operators

import graft.SparkSpec

/** Hand-computed known answers for the bigram LM quality scorer. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus "a b a b": c12 = {(a,b)→2, (b,a)→1}, c1 = {a→2, b→1}, V = 2
  private lazy val corpus = Seq((1L, "a b a b")).toDF("doc_id", "text")
  private lazy val lm = LangModel.trainBigram(corpus, k = 1.0)

  test("training: smoothed scaled log-probs match hand math") {
    val pairs = lm.pairs.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // ln((2+1)/(2+2)) = ln 0.75; ln((1+1)/(1+2)) = ln(2/3)
    assert(pairs(("a", "b")) == math.round(math.log(0.75) * 1e6))
    assert(pairs(("b", "a")) == math.round(math.log(2.0 / 3.0) * 1e6))
    assert(lm.vocabSize == 2)
    // unseen context: ln(1/V) = ln 0.5
    assert(lm.lpUnseenContext == math.round(math.log(0.5) * 1e6))
  }

  test("scoring: seen, backoff and unseen-context bigrams") {
    val docs = Seq(
      (10L, "a b x"), // (a,b) seen; (b,x) backs off to ln(1/(1+2))
      (20L, "z z"),   // (z,z): unseen context → ln(1/V)
      (30L, "a")      // one token → no bigrams → absent
    ).toDF("doc_id", "text")
    val out = LangModel.score(docs, lm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expect10 = (math.round(math.log(0.75) * 1e6) +
      math.round(math.log(1.0 / 3.0) * 1e6)).toDouble / 1e6 / 2
    assert(out(10L)._1 == 2L && math.abs(out(10L)._2 - expect10) < 1e-9)
    val expect20 = math.round(math.log(0.5) * 1e6).toDouble / 1e6
    assert(out(20L)._1 == 1L && math.abs(out(20L)._2 - expect20) < 1e-9)
    assert(!out.contains(30L))
  }

  test("keep: two-sided gate drops gibberish and boilerplate tails") {
    val docs = Seq(
      (1L, "a b a b"),   // high prob (the training text itself)
      (2L, "z z z z"),   // gibberish under the model
      (3L, "a b")        // in-range
    ).toDF("doc_id", "text")
    val kept = LangModel.keep(docs, lm, minAvgLogp = -0.5, maxAvgLogp = 0.0)
      .select("doc_id").as[Long].collect().sorted
    // doc1 avg ≈ ln0.75·2+ln(2/3) / 3 ≈ -0.327; doc3 ≈ -0.288; doc2 ≈ -0.693
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("scores are invariant to input partitioning (integer-sum contract)") {
    val docs = (0L until 50L).map(i => (i, s"a b a c b a doc$i b a"))
      .toDF("doc_id", "text")
    val a = LangModel.score(docs, lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LangModel.score(docs.repartition(13), lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b) // bit-identical, not approximately equal
  }
}
