package graft.operators

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], minPpm: Long = 300000,
                    maxDf: Long = 50) =
    Containment.containmentPairs(rows.toDF("doc_id", "page"),
        n = 3, maxDf = maxDf, minPpm = minPpm)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(4))))
      .toMap

  test("hand case: full containment one way, partial the other") {
    // A's 2 distinct grams both occur in B; B has 5, so only 2/5 reverse
    val r = pairs(Seq(
      (1L, "w1 w2 w3 w4"),
      (2L, "x w1 w2 w3 w4 y z")))
    assert(r((1L, 2L)) == ((2L, 1000000L)))
    assert(r((2L, 1L)) == ((2L, 400000L)))
    assert(pairs(Seq((1L, "w1 w2 w3 w4"), (2L, "x w1 w2 w3 w4 y z")),
      minPpm = 500000).keySet == Set((1L, 2L)))
  }

  test("stop-grams above maxDf are excluded from signatures") {
    // every doc shares the gram "common a b"; with maxDf below the
    // corpus size it must not generate pairs
    val docs = (0L until 20L).map(i => (i, s"common a b unique$i tail$i"))
    assert(pairs(docs, minPpm = 100000, maxDf = 10).isEmpty)
    // raising maxDf above df lets the shared gram count again
    assert(pairs(docs, minPpm = 100000, maxDf = 50).nonEmpty)
  }

  test("planted quotes detected with known sources, nothing else") {
    // unique vocabulary per doc: only planted quotes can overlap
    val docs = (0L until 50L).map(i =>
      (i, (0 until 40).map(j => s"d${i}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val quoted = Containment.synthesizeQuoted(docs)
    val got = Containment.containmentPairs(quoted, n = 3, maxDf = 50,
        minPpm = 400000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 50L).filter(_ % 5 == 0)
      .map(q => ((q + 13) % 50, q)).toSet
    assert(got == expected)
  }

  test("deterministic under repartition") {
    val docs = (0L until 30L).map(i =>
      (i, (0 until 25).map(j => s"t${(i * 3 + j) % 40}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Containment.containmentPairs(
        Containment.synthesizeQuoted(docs), minPpm = 200000)
      .orderBy("a_id", "b_id").collect()
    val b = Containment.containmentPairs(
        Containment.synthesizeQuoted(docs.repartition(7)), minPpm = 200000)
      .orderBy("a_id", "b_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
