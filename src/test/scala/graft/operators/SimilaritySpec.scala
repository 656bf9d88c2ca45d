package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN correctness: brute force is exact; SRP/IVF recall measured against it. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: 200 vectors in 16 dims
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
  }
  private lazy val queries = corpus.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("bruteForceTopK: rank 1 is the query itself (cos ≈ 1), k rows per query") {
    val top = Similarity.bruteForceTopK(corpus, queries, k = 10).collect()
    assert(top.length == 50)
    val self = top.filter(_.getAs[Int]("rank") == 1)
    assert(self.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id")))
    assert(self.forall(r => math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9))
    // ranks are 1..k with strictly non-increasing cosine
    top.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ANN top-k plans: partial top-k below the exchange, no rank window") {
    for (df <- Seq(Similarity.bruteForceTopK(corpus, queries, k = 5),
                   Similarity.srpTopK(corpus, queries, k = 5),
                   Similarity.ivfTopK(corpus, queries, k = 5, kmeansIters = 1))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val partialAt = plan.indexOf("partial_graft_topk")
      val exchangeAt = plan.indexOf("Exchange hashpartitioning")
      assert(partialAt >= 0 && exchangeAt >= 0, plan)
      assert(partialAt > exchangeAt, plan) // tree prints top-down: partial is below
    }
    // the final top-k never funnels a query's corpus stream through a window
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
    brute.collect()
    assert(!brute.queryExecution.executedPlan.toString.contains("Window"),
      brute.queryExecution.executedPlan.toString)
  }

  test("srpTopK finds the query itself and has reasonable recall@10") {
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.srpTopK(corpus, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 5L).forall(q => approx.contains((q, q))))
    // nBits=8 + 1-bit multi-probe on gaussian data: recall is modest by
    // design (it's the speed/recall knob) — assert it beats random chance
    // (10/200 = 5%) by a wide margin and self-hits are perfect (above).
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.15, s"recall@10 = $recall")
  }

  test("materialized IVF index: partition-pruned probes match transient IVF") {
    val dir = tmpDir("ivfindex").toString
    Similarity.writeIvfIndex(corpus, dir, nCentroids = 8)
    val indexed = Similarity.ivfTopKIndexed(spark, dir, queries, k = 5,
      nProbe = 3)
    // pruning: the scan carries a partition filter on centroid_id and reads
    // fewer than all 8 list directories
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.select("centroid_id").distinct().count() == 8)
    val scanned = indexed.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters"), scanned)
    // self-hit correctness survives the index round-trip
    val hits = indexed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 5L).forall(q => hits.contains((q, q))))
  }

  test("ivfTopK finds the query itself; probing more lists improves recall") {
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val few = Similarity.ivfTopK(corpus, queries, k = 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val many = Similarity.ivfTopK(corpus, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 5L).forall(q => many.contains((q, q))))
    val rFew = exact.intersect(few).size.toDouble / exact.size
    val rMany = exact.intersect(many).size.toDouble / exact.size
    assert(rMany >= rFew)
    assert(rMany == 1.0) // probing every list = exact
  }

  test("hardNegatives: never the anchor's label, matches naive recompute") {
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 120L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val anchors = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val got = Similarity.hardNegatives(corpus, anchors, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4)))
    assert(got.length == 4 * 7)
    // no negative shares its anchor's label
    got.foreach { case (qid, _, lbl, _, _) =>
      assert(lbl != (qid % 3).toInt, s"anchor $qid mined its own label") }
    // equals the brute top-k over the label-filtered corpus per anchor
    (0L until 4L).foreach { qid =>
      val one = corpus.filter(col("vec_id") === qid)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val naive = Similarity.bruteForceTopK(
          corpus.filter(col("label") =!= (qid % 3).toInt), one, k = 7)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      val mine = got.filter(_._1 == qid).map(t => (t._2, t._4)).toSet
      assert(mine == naive, s"anchor $qid differs from naive")
    }
  }
}
