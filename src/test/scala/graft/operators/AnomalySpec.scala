package graft.operators

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed spike: only the burst bucket flags") {
    val series = Seq(("a", 0L, 5L), ("a", 1L, 5L), ("a", 2L, 5L),
      ("a", 3L, 50L)).toDF("g", "b", "n")
    // n=4, s=65, q=2575: for x=50 lhs=(200-65)^2=18225,
    // varn=4*2575-65^2=6075 -> k=1 flags (18225>6075); x=5 lhs=2025 no
    val r1 = Anomaly.countSpikes(series, "g", "b", "n", k = 1).collect()
    assert(r1.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("a", 3L)))
    assert(r1.head.getLong(5) == 18225L && r1.head.getLong(6) == 6075L)
    // k=3 multiplies rhs by 9 -> 54675 > 18225: nothing flags
    assert(Anomaly.countSpikes(series, "g", "b", "n", k = 3).isEmpty)
  }

  test("uniform series never flags; groups are independent") {
    val series = Seq(("a", 0L, 7L), ("a", 1L, 7L), ("a", 2L, 7L),
      ("b", 0L, 1L), ("b", 1L, 1L), ("b", 2L, 100L))
      .toDF("g", "b", "n")
    val out = Anomaly.countSpikes(series, "g", "b", "n", k = 1)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(out == Set(("b", 2L)))
  }

  test("deterministic under repartition") {
    val series = (0L until 200L).map(i =>
      ("t", i, if (i % 97 == 0) 90L else 3L)).toDF("g", "b", "n")
    val a = Anomaly.countSpikes(series, "g", "b", "n", k = 3)
      .orderBy("b").collect().map(_.toSeq).toSeq
    val b = Anomaly.countSpikes(series.repartition(7), "g", "b", "n",
      k = 3).orderBy("b").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }
}
