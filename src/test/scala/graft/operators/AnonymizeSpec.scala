package graft.operators

import graft.SparkSpec
import graft.operators.Anonymize.Ladder

class AnonymizeSpec extends SparkSpec {

  import spark.implicits._

  // 12 rows: ages cluster into two decades, city splits one of them thin
  private def people = Seq(
    (21, "ely"), (22, "ely"), (23, "ely"), (24, "ely"),
    (25, "ripon"), (26, "ripon"), (27, "ripon"),
    (31, "ely"), (32, "ely"), (33, "ely"),
    (34, "ripon"), (39, "wells")
  ).toDF("age", "city")

  private val ladders = Seq(
    Ladder("g_age", Seq("CAST(age AS STRING)",
      "CAST(age div 10 AS STRING)", "'*'")),
    Ladder("g_city", Seq("city", "city", "'*'")))

  test("search stops at the first step inside the suppression budget") {
    // step 0: every class is a singleton (12 violations); step 1
    // ((decade, city)): classes 4/3/3/1/1 — residue 2 of 12 ≤ 20%
    val out = Anonymize.kAnonymize(people, k = 3, ladders,
      maxSuppressedPpm = 200000L).collect()
    assert(out.forall(_.getInt(0) == 1))
    val classes = out.map(r => (r.getString(1), r.getString(2),
      r.getLong(3))).toSet
    assert(classes === Set(("2", "ely", 4L), ("2", "ripon", 3L),
      ("3", "ely", 3L)))
  }

  test("every surviving class holds at least k rows") {
    val out = Anonymize.kAnonymize(people, k = 3, ladders,
      maxSuppressedPpm = 200000L)
    assert(out.filter("n < 3").count() === 0)
  }

  test("zero budget falls through to the coarsest step") {
    // residue at step 1 is 2 rows > 0-ppm budget; step 2 is one class
    val out = Anonymize.kAnonymize(people, k = 3, ladders,
      maxSuppressedPpm = 0L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getInt(0) === 2 && r.getString(1) === "*" &&
      r.getString(2) === "*" && r.getLong(3) === 12L)
  }

  test("a k=1 gate accepts the finest step with no suppression") {
    val out = Anonymize.kAnonymize(people, k = 1, ladders,
      maxSuppressedPpm = 0L)
    assert(out.agg(org.apache.spark.sql.functions.sum("n"))
      .head.getLong(0) === 12L)
    assert(out.collect().forall(_.getInt(0) == 0))
  }

  test("empty input yields an empty class table without failing") {
    assert(Anonymize.kAnonymize(people.limit(0), k = 3, ladders)
      .count() === 0)
  }

  test("t-closeness: EMD is exact on hand distributions; skew forces a step") {
    // global salary bands: 6×1 and 6×2 → G = (6, 12), N = 12, m = 2.
    // (decade 2, ely): 4 rows all band 1 → C=(4,4):
    //   D = |12·4 − 4·6| + |12·4 − 4·12| = 24 + 0 = 24
    //   emd_ppm = 24·10⁶ div (4·12·1) = 500000 — half the mass must move
    // (decade 3, ely): bands (1,2,2) → C=(1,3):
    //   D = |12·1 − 3·6| + 0 = 6 → emd_ppm = 6·10⁶ div 36 = 166666
    val withSal = Seq(
      (21, "ely", 1), (22, "ely", 1), (23, "ely", 1), (24, "ely", 1),
      (31, "ely", 1), (32, "ely", 2), (33, "ely", 2),
      (25, "ripon", 2), (26, "ripon", 2), (27, "ripon", 2),
      (34, "ripon", 2), (39, "wells", 1)
    ).toDF("age", "city", "band")
    // tight t (200000): step 1's (2, ely) class is k-fine but skew-far →
    // 4 + ripon(1)+wells(1) residue... step search coarsens to 2 where
    // the single global class has EMD 0 by construction
    val tight = Anonymize.tCloseness(withSal, k = 3, tPpm = 200000L,
      ladders, "band", maxSuppressedPpm = 300000L).collect()
    assert(tight.length === 1)
    assert(tight.head.getInt(0) === 2 && tight.head.getLong(4) === 0L)
    // loose t (600000) accepts step 1; the hand-computed EMDs come back
    // exactly
    val loose = Anonymize.tCloseness(withSal, k = 3, tPpm = 600000L,
      ladders, "band", maxSuppressedPpm = 300000L)
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(loose === Set(("2", "ely", 4L, 500000L),
      ("3", "ely", 3L, 166666L), ("2", "ripon", 3L, 500000L)))
  }

  test("t-closeness: the whole corpus as one class has EMD exactly 0") {
    val withSal = people.withColumn("band",
      org.apache.spark.sql.functions.expr("age div 10"))
    val out = Anonymize.tCloseness(withSal, k = 1, tPpm = 0L,
      Seq(Ladder("g", Seq("'*'"))), "band").collect()
    assert(out.length === 1 && out.head.getLong(3) === 0L)
  }

  test("l-diversity: a k-satisfying but homogeneous class forces a step") {
    // (decade 2, ely) has 4 rows but diagnoses are ALL 'flu' — k=3 holds,
    // l=2 fails, so step 1 is not enough and the search coarsens to 2
    val withSens = Seq(
      (21, "ely", "flu"), (22, "ely", "flu"), (23, "ely", "flu"),
      (24, "ely", "flu"),
      (31, "ely", "flu"), (32, "ely", "cold"), (33, "ely", "ache")
    ).toDF("age", "city", "dx")
    val out = Anonymize.lDiversify(withSens, k = 3, l = 2, ladders,
      "dx", maxSuppressedPpm = 300000L).collect()
    // step 1: (2,ely)=4 rows l-violating, (3,ely)=3 rows diverse →
    // residue 4/7 = 571k ppm > 300k → step 2 (everything one class)
    assert(out.length === 1)
    assert(out.head.getInt(0) === 2 && out.head.getLong(4) === 3L)
    // relaxing the budget accepts step 1 and keeps only the diverse class
    val out1 = Anonymize.lDiversify(withSens, k = 3, l = 2, ladders,
      "dx", maxSuppressedPpm = 600000L).collect()
    assert(out1.length === 1 && out1.head.getInt(0) === 1)
    assert(out1.head.getString(1) === "3" && out1.head.getLong(4) === 3L)
  }
}
