package graft.operators

import graft.SparkSpec

/** Known-answer tests for token-window document chunking. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g"),  // 7 tokens
    (2L, "x y"),            // shorter than one window
    (3L, "   ")             // zero tokens → no chunks
  ).toDF("doc_id", "text")

  test("windows start every stride tokens and carry position metadata") {
    val out = Chunker.chunkByTokens(docs, size = 4, overlap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1: starts 0,2,4,6 → chunks of 4,4,3,1 tokens
    assert(out((1L, 0L)) == ((0L, 4L, "a b c d")))
    assert(out((1L, 1L)) == ((2L, 4L, "c d e f")))
    assert(out((1L, 2L)) == ((4L, 3L, "e f g")))
    assert(out((1L, 3L)) == ((6L, 1L, "g")))
    assert(out((2L, 0L)) == ((0L, 2L, "x y")))
    assert(!out.keySet.exists(_._1 == 3L))
  }

  test("zero overlap partitions the token stream exactly") {
    val chunks = Chunker.chunkByTokens(docs.filter($"doc_id" === 1L),
      size = 3, overlap = 0).orderBy("chunk_idx")
      .select("chunk_text").as[String].collect()
    assert(chunks.toSeq == Seq("a b c", "d e f", "g"))
    assert(chunks.map(_.split(" ").length).sum == 7) // every token once
  }

  test("adjacent windows share exactly `overlap` tokens") {
    val rows = Chunker.chunkByTokens(docs.filter($"doc_id" === 1L),
      size = 4, overlap = 2).orderBy("chunk_idx")
      .select("chunk_text").as[String].collect().map(_.split(" ").toSeq)
      .toSeq
    rows.sliding(2).foreach { pair =>
      if (pair.length == 2) {
        val Seq(a, b) = pair
        val shared = math.min(2, b.length)
        assert(a.takeRight(shared) == b.take(shared), s"$a | $b")
      }
    }
  }
}
