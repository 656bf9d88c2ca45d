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

  test("Viterbi path (long words) is bit-identical to enumeration") {
    // random model over a small alphabet; random words straddling the
    // cutoff — force BOTH code paths on the SAME word and compare
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    val pieces = (for {
      len <- 1 to 4
      _ <- 1 to 6
    } yield (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString)
      .distinct ++ alphabet.map(_.toString)
    val lpT = Unigram.staircase(100000L)
    val m = UgModel(pieces.map(p =>
      p -> (Unigram.staircase(1L + rnd.nextInt(5000)) - lpT)).toMap, 4)
    (1 to 200).foreach { _ =>
      val len = 6 + rnd.nextInt(10) // 6..15: spans the EnumMaxLen cutoff
      val w = (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
      assert(Unigram.encode(m)(w) === refBest(m, w), s"mismatch on '$w'")
    }
  }

  test("a long unbroken token encodes fast (no exponential enumeration)") {
    val lpT = Unigram.staircase(1000L)
    val m = UgModel(Map("ab" -> 100L, "a" -> 50L, "b" -> 50L).map {
      case (p, n) => p -> (Unigram.staircase(n) - lpT) }, 4)
    val blob = "ab" * 5000 // a 10k-char base64-ish run
    val t0 = System.nanoTime()
    val enc = Unigram.encode(m)(blob)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(enc === Seq.fill(5000)("ab"))
    assert(ms < 2000, s"long-token encode took ${ms}ms")
  }

  /** Reference: exhaustive search with the documented total order —
    * independent of Unigram's internals, used to cross-check both the
    * enumeration and Viterbi implementations. */
  private def refBest(m: UgModel, word: String): Seq[String] = {
    def all(pos: Int): Seq[List[String]] =
      if (pos == word.length) Seq(Nil)
      else (1 to math.min(m.maxPieceLen, word.length - pos)).flatMap { l =>
        val p = word.substring(pos, pos + l)
        if (m.scores.contains(p)) all(pos + l).map(p :: _) else Nil
      }
    val cands = all(0)
    if (cands.isEmpty) Seq("[UNK]")
    else cands.map { path =>
      (path.map(m.scores).sum, path.length, path.mkString("|"), path)
    }.reduceLeft { (a, b) =>
      if (b._1 > a._1 || (b._1 == a._1 && (b._2 < a._2 ||
        (b._2 == a._2 && b._3 < a._3)))) b else a
    }._4
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
