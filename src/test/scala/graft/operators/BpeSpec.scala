package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainFromFreqs learns the classic merge sequence") {
    // Sennrich-style toy vocabulary: 'es' then 'est' dominate
    val freqs = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = Bpe.trainFromFreqs(freqs, nMerges = 3)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7…
    // lexicographic tie-break → (e,s) first, then (es,t), then (est,</w>)
    assert(model.merges.take(3) ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("encodeWord applies merges greedily by rank") {
    val model = Bpe.trainFromFreqs(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 5)
    val ranks = model.ranks
    // "lowest" was never seen whole, but its learned subwords apply
    val enc = Bpe.encodeWord("lowest", ranks)
    assert(enc.last == "est</w>", enc.toString)
    assert(enc.mkString == "lowest</w>") // lossless segmentation
    // unknown characters degrade to singletons, never crash
    val odd = Bpe.encodeWord("zq", ranks)
    assert(odd.mkString == "zq</w>")
  }

  test("train + encode on a DataFrame corpus is deterministic and lossless") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest")
    ).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, nMerges = 15)
    val m2 = Bpe.train(docs, nMerges = 15)
    assert(m1.merges == m2.merges)
    val enc = Bpe.encode(docs, m1)
      .select(col("doc_id"), concat_ws("", col("bpe_tokens")).as("joined"),
        size(col("bpe_tokens")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      .sortBy(_._1)
    // losslessness: concatenated subwords == words + </w> markers
    assert(enc.head._2 == "low</w>" * 5)
    // high-frequency words compress to one token per word
    assert(enc.head._3 == 5)
  }

  test("astral-plane characters stay whole code points, never surrogates") {
    val smile = new String(Character.toChars(0x1F600)) // U+1F600, 2 chars
    val model = Bpe.trainFromFreqs(Seq((smile + smile + "a", 4L)), 2)
    // every learned symbol is a valid string: no lone surrogate halves
    model.merges.flatMap(m => Seq(m._1, m._2)).foreach { s =>
      s.toCharArray.zipWithIndex.foreach { case (c, i) =>
        if (Character.isHighSurrogate(c))
          assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
            s"lone high surrogate in symbol ${s.toList}")
      }
    }
    val enc = Bpe.encodeWord(smile + "a" + smile, model.ranks)
    assert(enc.mkString == smile + "a" + smile + "</w>")
    enc.foreach(t => assert(!t.exists(c => Character.isSurrogate(c)) ||
      t.codePoints().count() > 0))
  }

  test("train caps the dict by frequency and still encodes the tail") {
    val docs = Seq((1L, "aaa aaa aaa bbb bbb zzz")).toDF("doc_id", "text")
    val model = Bpe.train(docs, nMerges = 4, maxWords = 2) // zzz dropped
    val enc = Bpe.encode(docs, model)
      .select(explode(col("bpe_tokens")).as("t"))
      .collect().map(_.getString(0))
    assert(enc.contains("aaa</w>")) // learned whole-word merge
    assert(enc.count(_ == "z") == 2 || enc.exists(_.startsWith("z")))
  }

  test("frozenMerges IS the table train() learns on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, nMerges = 64)
    assert(model.merges == Bpe.frozenMerges,
      "frozen table drifted from a genuine training run")
  }

  test("frozen table satisfies the learned-rank property") {
    // any pair containing a merge's result symbol ranks strictly later —
    // the property that makes greedy-by-rank == in-order replay (and thus
    // makes the q_bpe oracle's replace() chain an exact encoder replay)
    val results = Bpe.frozenMerges.zipWithIndex.map {
      case ((a, b), r) => (a + b) -> r
    }.toMap
    Bpe.frozenMerges.zipWithIndex.foreach { case ((a, b), r) =>
      Seq(a, b).foreach { comp =>
        results.get(comp).foreach(rc =>
          assert(rc < r, s"pair ($a,$b)@$r uses result symbol '$comp'@$rc"))
      }
    }
  }

  test("greedy encodeWord == in-rank-order replay (oracle equivalence)") {
    val ranks = Bpe.frozenModel.ranks
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgkrstuvwxyz"
    val words = Seq("scan", "column", "windowing", "sorter", "aaa", "x") ++
      (0 until 2000).map(_ => (0 to rnd.nextInt(11)).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString)
    words.foreach { w =>
      assert(Bpe.encodeWord(w, ranks) == Bpe.replayEncode(w, Bpe.frozenMerges),
        s"greedy != replay for '$w'")
    }
  }
}
