package graft.operators

import graft.SparkSpec

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  test("within-source percentiles are exact ppm of the declared order") {
    val scored = Seq(
      ("a", 0L, 9.0), ("a", 1L, 5.0), ("a", 2L, 1.0),
      ("b", 3L, 100.0), ("b", 4L, 200.0)).toDF("source", "id", "score")
    val out = Calibrate.percentileBySource(scored, "source", "id", "score")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // a: ranks 9.0→1, 5.0→2, 1.0→3 over n=3 → 0, 500000, 1000000
    assert(out(0L) == 0L && out(1L) == 500000L && out(2L) == 1000000L)
    // b: 200.0→0, 100.0→1000000 (n=2)
    assert(out(4L) == 0L && out(3L) == 1000000L)
  }

  test("single-row source gets pct 0 (not a division by zero)") {
    val scored = Seq(("solo", 0L, 42.0)).toDF("source", "id", "score")
    val out = Calibrate.percentileBySource(scored, "source", "id", "score")
      .collect()
    assert(out.head.getLong(3) == 0L)
  }

  test("ties break by id — deterministic under repartition") {
    val scored = (0L until 100L).map(i => ("s", i, (i % 5).toDouble))
      .toDF("source", "id", "score")
    val a = Calibrate.percentileBySource(scored, "source", "id", "score")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Calibrate.percentileBySource(scored.repartition(7),
      "source", "id", "score").orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("keepTopPerSource takes the same FRACTION of every source " +
       "however skewed the raw scales") {
    // source a scores in [0,1], source b in [1000, 2000]: a raw global
    // top-50% keeps ALL of b and none of a; calibrated keeps half each
    val scored = ((0L until 40L).map(i => ("a", i, i.toDouble / 40.0)) ++
      (40L until 80L).map(i => ("b", i, 1000.0 + i)))
      .toDF("source", "id", "score")
    val kept = Calibrate.keepTopPerSource(scored, "source", "id",
      "score", keepPpm = 500000L)
    val bySrc = kept.collect().groupBy(_.getString(0)).view
      .mapValues(_.length).toMap
    assert(bySrc("a") == bySrc("b"))
    // and the kept rows are each source's TOP scores
    val aIds = kept.filter($"source" === "a").collect()
      .map(_.getLong(1)).toSet
    assert(aIds.forall(_ >= 20L))
  }
}
