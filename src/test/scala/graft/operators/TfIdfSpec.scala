package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Known-answer tests for corpus TF-IDF top terms. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // hand-checkable corpus: "cat" in 1 doc, "dog" in 2, "the" in all 3
  private lazy val docs = Seq(
    (1L, "the cat cat cat dog"),
    (2L, "the dog dog"),
    (3L, "the the the")
  ).toDF("doc_id", "text")

  test("tf, df and n_tokens are exact") {
    val rows = TfIdf.topTerms(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows((1L, "cat")) == ((3L, 5L, 1L)))  // tf=3 of 5, df=1
    assert(rows((1L, "dog")) == ((1L, 5L, 2L)))
    assert(rows((2L, "dog")) == ((2L, 3L, 2L)))
    assert(rows((3L, "the")) == ((3L, 3L, 3L)))
  }

  test("rank orders by tf desc, then df asc, then term asc — integers only") {
    val d1 = TfIdf.topTerms(docs, k = 10).filter($"doc_id" === 1L)
      .orderBy("rank").select("term").as[String].collect().toSeq
    // tf: cat=3; the=1,dog=1 tie → df: dog(2) < the(3)
    assert(d1 == Seq("cat", "dog", "the"))
  }

  test("tfidf formula matches (tf/len) * ln((N+1)/(df+1))") {
    val v = TfIdf.topTerms(docs, k = 10)
      .filter($"doc_id" === 1L && $"term" === "cat")
      .select("tfidf").as[Double].head()
    assert(math.abs(v - 3.0 / 5.0 * math.log(4.0 / 2.0)) < 1e-12)
  }

  test("k caps the per-doc rows") {
    val counts = TfIdf.topTerms(docs, k = 1).groupBy("doc_id").count()
      .select("count").as[Long].collect()
    assert(counts.forall(_ == 1L))
  }

  test("plan: df joins broadcast by default, shuffle when disabled") {
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val bc = TfIdf.topTerms(docs).queryExecution.executedPlan
    assert(flatten(bc).count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      s"expected broadcast df + N joins in:\n$bc")
    val sh = TfIdf.topTerms(docs, broadcastDf = false)
    val flat = flatten(sh.queryExecution.executedPlan)
    // small data may still AQE-convert to broadcast; assert no crash and
    // same answer instead of pinning the join impl
    assert(sh.count() == TfIdf.topTerms(docs).count())
    assert(flat.nonEmpty)
  }
}
