package graft.operators

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def kappa(rows: Seq[(String, Long, Long)]): Map[String, Long] =
    Agreement.cohenKappaBy(rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Long]("kappa_ppm")).toMap

  /** The exact definition replayed with BigInt floor division. */
  private def expected(pairs: Seq[(Long, Long)]): Long = {
    val n = BigInt(pairs.size)
    val agree = BigInt(pairs.count(p => p._1 == p._2))
    val ma = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    val mb = pairs.groupBy(_._2).view.mapValues(_.size).toMap
    val s = ma.map { case (c, na) => BigInt(na) * BigInt(mb.getOrElse(c, 0)) }.sum
    val den = n * n - s
    if (den == 0) { if (agree == n) 1000000L else 0L }
    else {
      val num = BigInt(1000000) * (n * agree - s)
      // BigInt / truncates: emulate floor explicitly
      val q = num / den
      (if (q * den > num) q - 1 else q).toLong
    }
  }

  test("perfect agreement is exactly 1e6; total disagreement on a " +
      "2-class swap is exactly -1e6") {
    assert(kappa(Seq(("p", 0L, 0L), ("p", 1L, 1L), ("p", 2L, 2L)))("p")
      === 1000000L)
    // balanced 2-class anti-agreement: p_o = 0, p_e = 1/2 → kappa = −1
    val anti = Seq(("q", 0L, 1L), ("q", 1L, 0L),
      ("q", 0L, 1L), ("q", 1L, 0L))
    assert(kappa(anti)("q") === -1000000L)
  }

  test("hand case matches the BigInt definition (including a negative)") {
    val cases = Seq(
      Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 0L), (2L, 2L), (2L, 1L)),
      // skewed marginals, worse than chance
      Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 0L), (0L, 0L)),
      Seq((0L, 0L), (1L, 1L), (2L, 0L), (2L, 2L)))
    cases.zipWithIndex.foreach { case (ps, i) =>
      val g = s"c$i"
      val got = kappa(ps.map(p => (g, p._1, p._2)))(g)
      assert(got === expected(ps), s"case $i")
    }
  }

  test("degenerate chance agreement: constant annotators") {
    // both constant, same label: p_e = 1, trivially perfect
    assert(kappa(Seq(("x", 1L, 1L), ("x", 1L, 1L)))("x") === 1000000L)
    // both constant on DISJOINT labels: S = 0 so p_e = 0 (not 1!) and
    // kappa = (0 − 0)/(1 − 0) = 0 via the normal path — this is the
    // case that caught the inner group-join dropping the row entirely
    assert(kappa(Seq(("y", 0L, 1L), ("y", 0L, 1L)))("y") === 0L)
  }

  test("groups are independent and partitioning does not change results") {
    val rows = (0 until 60).map { i =>
      (s"g${i % 3}", (i % 4).toLong, ((i + i / 7) % 4).toLong)
    }
    val one = kappa(rows)
    val many = Agreement.cohenKappaBy(
      rows.toDF("g", "a", "b").repartition(13), "g", "a", "b")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Long]("kappa_ppm")).toMap
    assert(one === many)
    (0 until 3).foreach { g =>
      val ps = rows.filter(_._1 == s"g$g").map(r => (r._2, r._3))
      assert(one(s"g$g") === expected(ps), s"g$g")
    }
  }
}
