package graft.operators

import graft.SparkSpec
import java.security.MessageDigest

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Reference hash: same portable 60-bit md5 family as the operator. */
  private def refHash(gram: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(("wf:" + gram).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Brute-force plain winnowing per the paper: every full window of w
    * hashes selects its rightmost minimum; union of selections. */
  private def refWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val grams = toks.sliding(k).filter(_.length == k)
      .map(_.mkString(" ")).map(refHash).toArray
    val sel = scala.collection.mutable.Set[Int]()
    for (s <- 0 to grams.length - w) {
      val win = grams.slice(s, s + w)
      val m = win.min
      val j = s + win.lastIndexOf(m)
      sel += j
    }
    sel.map(j => (j, grams(j))).toSet
  }

  test("matches brute-force winnowing on varied docs") {
    val docs = Seq(
      (1L, (0 until 30).map(i => s"w${(i * 7) % 11}").mkString(" ")),
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "x x x x x x x x x x"),          // all-equal hashes: tie storm
      (4L, "only three words here now ok"),
      (5L, "a b c"))                         // 1 gram < w: no fingerprints
    val got = Winnowing.fingerprints(docs.toDF("doc_id", "page"), k = 3, w = 4)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    for ((id, text) <- docs) {
      // operator pos is the ORIGINAL token index == gram index here
      // (no empty tokens), so positions align with the reference
      assert(got.getOrElse(id, Set.empty) == refWinnow(text, 3, 4),
        s"doc $id")
    }
  }

  test("guarantee: shared run of >= w+k-1 tokens yields a shared fingerprint") {
    // distinct vocab per doc except a planted 8-token run (w+k-1 = 6)
    val run = "q1 q2 q3 q4 q5 q6 q7 q8"
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5 a6 a7 a8 a9"),
      (2L, s"b1 b2 b3 b4 b5 $run b6 b7 b8")).toDF("doc_id", "page")
    val pairs = Winnowing.overlapPairs(docs, k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 1L)))
  }

  test("density is near 2/(w+1) on hash-random text") {
    val text = (0 until 2000).map(i => s"t${(i * 131 + 17) % 997}")
      .mkString(" ")
    val n = Winnowing.fingerprints(Seq((1L, text)).toDF("doc_id", "page"),
      k = 3, w = 6).count()
    val grams = 1998.0
    val density = n / grams
    assert(density > 1.0 / 6 && density < 0.5, s"density $density")
  }

  test("deterministic under repartition; maxDf gates hub hashes") {
    val docs = (0L until 40L).map(i =>
      (i, (0 until 30).map(j => s"c${(i + j) % 37}").mkString(" ")))
    val df = docs.toDF("doc_id", "page")
    val a = Winnowing.overlapPairs(df, minShared = 1)
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    val b = Winnowing.overlapPairs(df.repartition(7), minShared = 1)
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    // every doc shares the same rotated vocab: df gate at 1 kills pairs
    assert(Winnowing.overlapPairs(df, maxDf = 1, minShared = 1).count() == 0)
  }
}
