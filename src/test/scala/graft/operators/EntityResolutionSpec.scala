package graft.operators

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  // (id, name, city, score-band attr)
  private def records = Seq(
    (1L, "acme", "ely", 100L),
    (2L, "acme", "ely", 130L),    // dup of 1: name + close attr + city
    (3L, "acme", "ripon", 400L),  // same name only — below threshold
    (4L, "bolt", "ely", 100L),    // different name, same block2 as 1
    (5L, "bolt", "ely", 150L)     // dup of 4 via name + attr
  ).toDF("id", "name", "attr_city", "attr_v")

  private val blocks = Seq("name",
    "concat(attr_city, '|', cast(attr_v div 100 as string))")
  private val rules = Seq(
    ("name_a = name_b", 50L),
    ("abs(attr_v_a - attr_v_b) <= 60", 30L),
    ("attr_city_a = attr_city_b", 20L))

  test("multi-pass blocking yields each candidate pair once") {
    val cand = EntityResolution.candidatePairs(records, "id", blocks)
    val pairs = cand.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // (1,2): name block AND block2 for neither (130//100=1 vs 100//100=1 —
    // same band, both blocks) — still exactly one row after distinct
    assert(cand.count() === pairs.size)
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(pairs.contains((1L, 4L))) // block2 only: ely|1
  }

  test("scoring matches exactly the pairs over the threshold") {
    val m = EntityResolution.matchPairs(records, "id", blocks, rules, 80L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // 1-2: 50+30+20=100; 4-5: 50+30+20=100; 1-3: 50 only; 1-4: 30+20=50
    assert(m === Set((1L, 2L), (4L, 5L)))
  }

  test("entities: matched records collapse, singletons stand alone") {
    val m = EntityResolution.matchPairs(records, "id", blocks, rules, 80L)
    val e = EntityResolution.entities(records, "id", m)
      .as[(Long, Long)].collect().toMap
    assert(e === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("transitive chains resolve to one entity") {
    val chain = Seq(
      (10L, "x", "a", 100L), (11L, "x", "a", 150L), (12L, "x", "a", 200L))
      .toDF("id", "name", "attr_city", "attr_v")
    // 10-11 and 11-12 match (diff 50 ≤ 60); 10-12 (diff 100) does NOT —
    // the closure must still unite all three
    val m = EntityResolution.matchPairs(chain, "id", Seq("name"), rules, 80L)
    assert(m.count() === 2)
    val e = EntityResolution.entities(chain, "id", m)
      .as[(Long, Long)].collect().toMap
    assert(e === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
  }
}
