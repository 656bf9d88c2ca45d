package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AugmentSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's mask rule, recomputed independently: 60-bit md5 hash
    * of "mask:<doc>:<pos>" ≡ 0 mod every. Masks depend only on (doc, pos),
    * never the token — which is what makes hand cases computable. */
  private def isMasked(doc: Long, pos: Int, every: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"mask:$doc:$pos".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16) % every == 0
  }

  private def corpus(n: Int, len: Int) = (0L until n.toLong).map { i =>
    (i, (0 until len).map(j => s"w${(i * 31 + j * 7) % 13}").mkString(" "))
  }.toDF("doc_id", "text")

  test("hand case: expected input/target from independently computed masks") {
    val docs = Seq((3L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val toks = "a b c d e f g h i j k l".split(" ")
    val mk = toks.indices.map(i => isMasked(3L, i + 1, 5))
    // build expected strings by the T5 rule: maximal masked runs collapse
    var run = -1
    val in = new StringBuilder; val tgt = new StringBuilder
    toks.indices.foreach { i =>
      if (!mk(i)) { if (in.nonEmpty) in ++= " "; in ++= toks(i) }
      else {
        if (i == 0 || !mk(i - 1)) {
          run += 1
          if (in.nonEmpty) in ++= " "
          in ++= s"<extra_id_$run>"
          if (tgt.nonEmpty) tgt ++= " "
          tgt ++= s"<extra_id_$run> ${toks(i)}"
        } else tgt ++= s" ${toks(i)}"
      }
    }
    val r = Augment.spanCorrupt(docs, every = 5).head()
    assert(r.getAs[String]("input") == in.toString)
    assert(r.getAs[String]("target") == tgt.toString)
    assert(r.getAs[Long]("n_masked") == mk.count(identity))
    assert(r.getAs[Long]("n_spans") == run + 1)
    assert(mk.count(identity) > 0, "fixture should actually mask something")
  }

  test("losslessness: substituting target spans back into input recovers " +
       "the original tokens, corpus-wide") {
    val docs = corpus(40, 30)
    val rows = Augment.spanCorrupt(docs, every = 4).collect()
    assert(rows.length == 40)
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val spans = r.getAs[String]("target").split("<extra_id_\\d+> ?")
        .filter(_.nonEmpty).map(_.trim)
      var k = -1
      val rebuilt = r.getAs[String]("input").split(" ").flatMap { t =>
        if (t.matches("<extra_id_\\d+>")) { k += 1; spans(k).split(" ") }
        else Array(t)
      }
      assert(rebuilt.mkString(" ") == orig(r.getLong(0)),
        s"doc ${r.getLong(0)} not lossless")
      assert(k + 1 == r.getAs[Long]("n_spans"))
    }
  }

  test("sentinels number maximal runs consecutively from zero") {
    val rows = Augment.spanCorrupt(corpus(25, 40), every = 3).collect()
    rows.foreach { r =>
      val ids = "<extra_id_(\\d+)>".r
        .findAllMatchIn(r.getAs[String]("input")).map(_.group(1).toInt).toSeq
      assert(ids == ids.indices, s"non-consecutive sentinels: $ids")
      // adjacent masked tokens merged: spans ≤ masked, and a run in the
      // target carries exactly its masked tokens
      assert(r.getAs[Long]("n_spans") <= r.getAs[Long]("n_masked"))
    }
  }

  test("deterministic under repartitioning and repeated runs") {
    val docs = corpus(30, 20)
    val a = Augment.spanCorrupt(docs, every = 5).orderBy("doc_id").collect()
    val b = Augment.spanCorrupt(docs.repartition(7), every = 5)
      .orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("unmasked document keeps full input and empty target") {
    // find a (doc_id, len) whose positions all hash to non-zero mod 5
    val found = (0L until 200L).find(d => (1 to 6).forall(p => !isMasked(d, p, 5)))
    assert(found.isDefined, "no 6-token unmasked doc id below 200")
    val d = found.get
    val docs = Seq((d, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val r = Augment.spanCorrupt(docs, every = 5).head()
    assert(r.getAs[String]("input") == "t1 t2 t3 t4 t5 t6")
    assert(r.getAs[String]("target") == "")
    assert(r.getAs[Long]("n_masked") == 0 && r.getAs[Long]("n_spans") == 0)
  }
}
