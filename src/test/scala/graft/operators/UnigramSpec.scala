package graft.operators

import graft.SparkSpec
import graft.operators.Unigram.UgModel

class UnigramSpec extends SparkSpec {

  import spark.implicits._

  test("staircase is exact integer ≈8·log₂, monotone, portable anchors") {
    // hand anchors: blen·8 + ⌊8c/2^blen⌋ − 8
    assert(Unigram.staircase(1L) === 0L)   // blen 0, frac 0
    assert(Unigram.staircase(2L) === 8L)   // blen 1
    assert(Unigram.staircase(3L) === 12L)  // blen 1, ⌊24/2⌋−8 = 4
    assert(Unigram.staircase(4L) === 16L)
    assert(Unigram.staircase(255L) === 63L)
    assert(Unigram.staircase(256L) === 64L)
    // monotone non-decreasing over a wide sweep
    val vals = (1L to 5000L).map(Unigram.staircase)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
  }

  test("unigram beats greedy: two frequent pieces over one rare long one") {
    // 'abcd' exists as a piece but is rare; 'ab' and 'cd' are frequent.
    // WordPiece's maximal munch would take 'abcd'; unigram's global
    // argmax prefers the higher-probability pair.
    def m(cAbcd: Long) = {
      val counts = Map("abcd" -> cAbcd, "ab" -> 4000L, "cd" -> 4000L,
        "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
      val lpT = Unigram.staircase(counts.values.sum)
      UgModel(counts.map { case (p, n) =>
        p -> (Unigram.staircase(n) - lpT) }, maxPieceLen = 4)
    }
    assert(Unigram.encode(m(cAbcd = 2L))("abcd") === Seq("ab", "cd"))
    // when the long piece is itself frequent enough, one piece wins
    // (it saves a whole −lpT penalty term)
    assert(Unigram.encode(m(cAbcd = 4000L))("abcd") === Seq("abcd"))
  }

  test("ties break by fewer pieces then lexicographic path") {
    // equal scores for all single chars and the pair: 'ab' (1 piece)
    // must beat 'a|b' (2 pieces, each carrying its own penalty)
    val lpT = Unigram.staircase(30L)
    val m = UgModel(Map("ab" -> 10L, "a" -> 10L, "b" -> 10L).map {
      case (p, n) => p -> (Unigram.staircase(n) - lpT) }, 4)
    assert(Unigram.encode(m)("ab") === Seq("ab"))
    // genuinely tied single-piece-count paths: lexicographically
    // smaller piece string wins ('ax|b' < 'a|xb' since '|' > letters)
    val m2 = UgModel(Map("ax" -> 8L, "xb" -> 8L, "a" -> 8L, "b" -> 8L,
      "x" -> 1L).map { case (p, n) =>
        p -> (Unigram.staircase(n) - Unigram.staircase(33L)) }, 4)
    assert(Unigram.encode(m2)("axb") === Seq("ax", "b"))
  }

  test("trained inventory covers its corpus and reassembles losslessly") {
    val docs = Seq("table scan sort", "scan scan sort merge",
      "windowed table").toDF("text")
    val model = Unigram.train(docs, maxPieceLen = 4, minCount = 2L)
    val words = docs.select(org.apache.spark.sql.functions.explode(
      graft.functions.TextFunctions.tokens(
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("text"))))).as[String]
      .collect()
    words.foreach { w =>
      val enc = Unigram.encode(model)(w)
      assert(!enc.contains("[UNK]"), w)
      assert(enc.mkString === w, s"$w -> $enc")
    }
  }

  test("pieceCounts weights each distinct word by corpus frequency") {
    val docs = Seq("aa", "aa", "aa bb").toDF("text")
    val lpT = Unigram.staircase(12L)
    val model = UgModel(Map("aa" -> 6L, "bb" -> 2L, "a" -> 3L, "b" -> 1L)
      .map { case (p, n) => p -> (Unigram.staircase(n) - lpT) }, 4)
    val counts = Unigram.pieceCounts(docs, model)
      .as[(String, Long)].collect().toMap
    assert(counts === Map("aa" -> 3L, "bb" -> 1L))
  }
}
