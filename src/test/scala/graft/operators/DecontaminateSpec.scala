package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Known-answer tests for benchmark decontamination (n-gram leakage). */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval doc: tokens a..f → 3-gram shingles {a b c, b c d, c d e, d e f}
  private lazy val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
  private lazy val train = Seq(
    (1L, "a b c x y z"),          // shares exactly "a b c" (1 of 4 shingles)
    (2L, "x y z w v u"),          // clean
    (3L, "A  b C d e f"),         // normalization dup of eval → all 4 overlap
    (4L, "a b")                   // <n tokens → single whole-text shingle
  ).toDF("doc_id", "text")

  test("overlap counts shared distinct shingles per training doc") {
    val out = Decontaminate.overlap(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((1L, 4L))) // "a b c" only
    assert(out(2L) == ((0L, 4L)))
    assert(out(3L) == ((4L, 4L))) // case/whitespace-insensitive
    assert(out(4L) == ((0L, 1L))) // "a b" whole-text shingle ∉ eval 3-grams
  }

  test("overlap_frac is n_overlap / n_shingles") {
    val fracs = Decontaminate.overlap(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(fracs(1L) == 0.25 && fracs(2L) == 0.0 && fracs(3L) == 1.0)
  }

  test("decontaminated gate keeps only docs under maxFrac") {
    val kept = Decontaminate.decontaminated(train, eval, n = 3, maxFrac = 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 4L))
  }

  test("plan: eval side broadcasts — the train side never shuffles text") {
    val plan = Decontaminate.overlap(train, eval, n = 3)
      .queryExecution.executedPlan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    assert(flatten(plan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"expected a broadcast join in:\n$plan")
  }
}
