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
