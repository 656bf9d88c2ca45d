package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: writing both join sides bucketed on the key
  * lets every subsequent join/aggregate on that key run with ZERO exchanges —
  * at 100 TB this converts the dominant cost of a fact-fact join into a
  * co-located map-side merge. This spec pins the plan shape so a regression
  * that reintroduces the shuffle fails loudly.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without any shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_b")

    // force the sort-merge path (tiny test tables would broadcast, which
    // hides the property under test: bucket-aligned sides need no shuffle)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 1000)

      // and an aggregation on the bucket key is shuffle-free too
      val agg = spark.table("bkt_b").groupBy("k").agg(sum("bv"))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE bkt_a")
    spark.sql("DROP TABLE bkt_b")
  }
}
