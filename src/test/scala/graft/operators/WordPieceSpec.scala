package graft.operators

import graft.SparkSpec
import graft.operators.WordPiece.WpModel

class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  test("greedy longest-match-first takes the maximal munch") {
    val m = WpModel(Set("un", "##able", "##ab", "##le", "u", "##n",
      "##a", "##b", "##l", "##e"), maxPieceLen = 5)
    assert(WordPiece.encode(m)("unable") === Seq("un", "##able"))
    // drop the long continuation: falls to the next-longest at each step
    val m2 = m.copy(pieces = m.pieces - "##able")
    assert(WordPiece.encode(m2)("unable") === Seq("un", "##ab", "##le"))
  }

  test("position 0 uses raw pieces, later positions ## pieces") {
    val m = WpModel(Set("ab", "##ab", "a", "b", "##a", "##b"), 4)
    assert(WordPiece.encode(m)("abab") === Seq("ab", "##ab"))
    // "ab" raw exists but cannot match mid-word without the ## form
    val m3 = WpModel(Set("ab", "a", "b", "##a", "##b"), 4)
    assert(WordPiece.encode(m3)("abab") === Seq("ab", "##a", "##b"))
  }

  test("a position with no piece collapses the word to [UNK]") {
    val m = WpModel(Set("a"), 4)
    assert(WordPiece.encode(m)("ax") === Seq(WordPiece.Unk))
    assert(WordPiece.encode(m)("xa") === Seq(WordPiece.Unk))
  }

  test("trained inventory covers its corpus — no [UNK] ever") {
    val docs = Seq("table scan sort", "scan scan sort merge",
      "windowed table").toDF("text")
    val model = WordPiece.train(docs, maxPieceLen = 4, minCount = 2L)
    val words = docs.select(org.apache.spark.sql.functions.explode(
      graft.functions.TextFunctions.tokens(
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("text"))))).as[String]
      .collect()
    words.foreach { w =>
      val enc = WordPiece.encode(model)(w)
      assert(!enc.contains(WordPiece.Unk), w)
      // losslessness: pieces reassemble the word
      assert(enc.map(_.stripPrefix("##")).mkString === w)
    }
    // the frequent substring clears the floor and is a real piece
    assert(model.pieces.contains("scan"))
  }

  test("pieceCounts weights each distinct word by corpus frequency") {
    val docs = Seq("aa", "aa", "aa bb").toDF("text")
    val model = WpModel(Set("aa", "bb", "a", "b", "##a", "##b"), 4)
    val counts = WordPiece.pieceCounts(docs, model)
      .as[(String, Long)].collect().toMap
    assert(counts === Map("aa" -> 3L, "bb" -> 1L))
  }
}
