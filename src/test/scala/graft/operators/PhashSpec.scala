package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhashSpec extends SparkSpec {
  import spark.implicits._

  // independent reimplementation straight from the closed-form pixel
  // formula (id + 7y + 13x + 101c mod 256) — no codec, no operator code
  private def expectedHash(id: Long, w: Int, h: Int): (Long, Long) = {
    def pv(x: Int, y: Int, c: Int): Long = (id + 7L * y + 13L * x + 101L * c) % 256L
    val cell = Array.ofDim[Long](8, 9)
    val empty = Array.ofDim[Boolean](9)
    for (cy <- 0 until 8; cx <- 0 until 9) {
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
      if (x1 == x0) empty(cx) = true
      else {
        var s = 0L
        for (y <- y0 until y1; x <- x0 until x1)
          s += 299L * pv(x, y, 0) + 587L * pv(x, y, 1) + 114L * pv(x, y, 2)
        cell(cy)(cx) = s / ((y1 - y0).toLong * (x1 - x0))
      }
    }
    var lo = 0L; var hi = 0L
    for (k <- 0 until 64) {
      val r = k / 8; val c = k % 8
      if (!empty(c) && !empty(c + 1) && cell(r)(c + 1) > cell(r)(c)) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
    }
    (lo, hi)
  }

  test("dHash through the real PNG codec matches the closed form") {
    // id 16 has w = 8: exercises the empty-column NULL-gradient path
    val ids = Seq(0L, 3L, 16L, 41L, 130L)
    val docs = ids.toDF("doc_id")
    val got = Phash.dHash(Phash.variantCorpus(docs))
      .collect().map(r => r.id -> ((r.h_lo, r.h_hi))).toMap
    ids.foreach { id =>
      val w = 8 * (1 + (id % 16)).toInt
      val h = 8 * (1 + (id % 9)).toInt
      assert(got(id) === expectedHash(id, w, h), s"base $id")
      if (id % 7 == 0)
        assert(got(id + 1000000L) === expectedHash(id + 1, w, h),
          s"variant of $id keeps dims ($w,$h) with seed ${id + 1}")
    }
  }

  test("banded near-dup pairs are exactly the brute-force hamming<=3 set") {
    val docs = spark.range(0, 160).select(col("id").as("doc_id"))
    val hashes = Phash.dHash(Phash.variantCorpus(docs)).toDF()
      .localCheckpoint()
    val got = Phash.nearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, alo, ahi) <- hs; (b, blo, bhi) <- hs if a < b
      d = java.lang.Long.bitCount(alo ^ blo) + java.lang.Long.bitCount(ahi ^ bhi)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === brute)
    // the planted brightness-shift variants dominate the recovered set
    assert(brute.count { case (a, b, _) => b == a + 1000000L } >= 10)
  }

  test("deterministic under repartition") {
    val docs = spark.range(0, 60).select(col("id").as("doc_id"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Phash.nearDupPairs(Phash.dHash(Phash.variantCorpus(df)).toDF())
        .orderBy("a_id", "b_id").collect().toSeq
    assert(run(docs) === run(docs.repartition(11)))
  }
}
