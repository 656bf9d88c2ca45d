package graft.operators

import graft.SparkSpec

class RagSpec extends SparkSpec {
  import spark.implicits._

  test("hand corpus: integer dots rank chunks, budget rule cuts") {
    // chunks of 4, no overlap; doc 0 → ["a a b c", "d e f g"],
    // doc 1 → ["a b b b"]
    val docs = Seq(
      (0L, "a a b c d e f g"),
      (1L, "a b b b")).toDF("doc_id", "text")
    val queries = Seq(("q1", "a b")).toDF("query_id", "qtext")
    // dots vs {a:1, b:1}: doc0/chunk0 = 2+1 = 3; doc1/chunk0 = 1+3 = 4;
    // doc0/chunk1 shares nothing → absent
    val out = Rag.assembleContext(docs, queries, chunkSize = 4,
        overlap = 0, budgetTokens = 100L)
      .orderBy("cum_before").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 0L, 4L, 0L), (0L, 0L, 3L, 4L)))
  }

  test("budget boundary: the first over-budget chunk still lands " +
       "(Selection rule), later ones do not") {
    val docs = Seq(
      (0L, "x x x x"), (1L, "x x x"), (2L, "x x")).toDF("doc_id", "text")
    val queries = Seq(("q", "x")).toDF("query_id", "qtext")
    // dot order: doc0 (4), doc1 (3), doc2 (2); cum_before 0, 4, 7.
    // budget 5: doc0 (0 < 5), doc1 (4 < 5 — crosses, still kept),
    // doc2 (7 ≥ 5 — cut)
    val kept = Rag.assembleContext(docs, queries, chunkSize = 8,
        overlap = 0, budgetTokens = 5L)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(0L, 1L))
  }

  test("queries sharing no term with the corpus yield no rows; " +
       "each query budgets independently") {
    val docs = Seq((0L, "p q r s")).toDF("doc_id", "text")
    val queries = Seq(("hit", "q"), ("miss", "zz"))
      .toDF("query_id", "qtext")
    val out = Rag.assembleContext(docs, queries, chunkSize = 4,
      overlap = 0, budgetTokens = 10L).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("hit"))
  }
}
