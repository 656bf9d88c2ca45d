package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*) =
    rows.toDF("src", "dst", "w")

  test("hand case: relaxation finds the cheaper two-hop path") {
    //    0 -5-> 1,  0 -1-> 2,  2 -1-> 1,  1 -1-> 3
    // best dist(1) = 2 via 0->2->1, dist(3) = 3 (needs 3 hops)
    val e = edges((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 1L))
    val seeds = Seq(0L).toDF("id")
    val d3 = LinkGraph.sssp(e, seeds, rounds = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d3.toSeq === Seq((0L, 0L), (1L, 2L), (2L, 1L), (3L, 3L)))
  }

  test("the hop bound is honest: deeper paths stay unreached/costlier") {
    val e = edges((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 1L))
    val seeds = Seq(0L).toDF("id")
    val d1 = LinkGraph.sssp(e, seeds, rounds = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // one hop: node 1 still carries the direct-edge 5; node 3 absent
    assert(d1.toSeq === Seq((0L, 0L), (1L, 5L), (2L, 1L)))
    val d2 = LinkGraph.sssp(e, seeds, rounds = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d2.toSeq === Seq((0L, 0L), (1L, 2L), (2L, 1L), (3L, 6L)))
  }

  test("multi-seed minimum and hash weights deterministic under repartition") {
    val docs = spark.range(0, 300).select(col("id").as("doc_id"))
    val base = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val seeds = Seq(0L, 7L).toDF("id")
    def run(e: org.apache.spark.sql.DataFrame) =
      LinkGraph.sssp(LinkGraph.hashWeights(e), seeds, rounds = 4)
        .orderBy("id").collect().toSeq
    val a = run(base)
    val b = run(base.repartition(13))
    assert(a === b)
    assert(a.size > 100)
    // weights live in 1..9
    val w = LinkGraph.hashWeights(base).select("w").distinct()
      .collect().map(_.getLong(0))
    assert(w.forall(x => x >= 1 && x <= 9))
  }
}
