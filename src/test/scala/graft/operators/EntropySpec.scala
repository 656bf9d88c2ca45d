package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EntropySpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy: known values, scaled-integer determinism") {
    val docs = Seq(
      (1L, "aaaa"),         // degenerate: entropy 0
      (2L, "aabb"),         // two equiprobable symbols: ln 2
      (3L, "abcd"),         // four equiprobable symbols: ln 4
      (4L, "aab")           // p = (2/3, 1/3)
    ).toDF("doc_id", "text")
    val got = Entropy.charEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("distinct_chars"),
          r.getAs[Double]("entropy_nats"))).toMap
    assert(got(1L) == ((4L, 1L, 0.0)))
    assert(got(2L)._1 == 4L && got(2L)._2 == 2L)
    assert(math.abs(got(2L)._3 - math.log(2)) < 1e-5)
    assert(math.abs(got(3L)._3 - math.log(4)) < 1e-5)
    val expected4 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(got(4L)._3 - expected4) < 1e-5)
    // the scaled-integer reduction is deterministic under repartitioning
    val again = Entropy.charEntropy(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy_nats"))
      .toMap
    assert(got.keys.forall(k => again(k) == got(k)._3))
    // ordering property: natural-ish text above repeated spam
    val mixed = Seq((10L, "zzzzzzzzzzzzzzzz"),
      (11L, "the quick brown fox")).toDF("doc_id", "text")
    val e = Entropy.charEntropy(mixed).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy_nats"))
      .toMap
    assert(e(11L) > e(10L) + 1.0)
  }
}
