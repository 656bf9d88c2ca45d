package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly what the plain join returns") {
    val rnd = new scala.util.Random(5)
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (rnd.nextDouble() < 0.9) 7L else rnd.nextLong(100), i))
      .toDF("k", "lv")
    val right = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "rv")

    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
        .select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val salted = SkewJoin.saltedJoin(left, right, Seq("k"),
          saltFactor = 8, joinType = jt)
        .select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(salted == plain, s"join type $jt")
    }
  }

  test("adaptiveSaltedJoin returns exactly what the plain join returns") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 2000).map(i =>
      (if (rnd.nextDouble() < 0.9) 7L else rnd.nextLong(100), i))
      .toDF("k", "lv")
    val right = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "rv")

    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val cols = if (jt == "left_semi" || jt == "left_anti")
        Seq("k", "lv") else Seq("k", "lv", "rv")
      val plain = left.join(right, Seq("k"), jt)
        .select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString(",")).toSeq
      val adaptive = SkewJoin.adaptiveSaltedJoin(left, right, Seq("k"),
          saltFactor = 8, hotThreshold = 100, joinType = jt)
        .select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString(",")).toSeq
      assert(adaptive == plain, s"join type $jt")
    }
  }

  test("adaptive salting detects the hot key and replicates only it") {
    val rnd = new scala.util.Random(13)
    val left = (1 to 2000).map(i =>
      (if (rnd.nextDouble() < 0.9) 7L else rnd.nextLong(100), i))
      .toDF("k", "lv")
    // hot key carries ~1800 of 2000 rows; cold keys ~2 rows each
    val hot = SkewJoin.hotKeys(left, Seq("k"), hotThreshold = 100)
    assert(hot.map(_.head) sameElements Array(7L))

    // composite-key detection goes through the set-probe path
    val left2 = left.withColumn("k2", lit("z"))
    val hot2 = SkewJoin.hotKeys(left2, Seq("k", "k2"), hotThreshold = 100)
    assert(hot2.toSeq == Seq(Seq(7L, "z")))
    val plain2 = left2.join(left2.select(col("k"), col("k2"))
        .distinct().withColumn("rv", lit(1)), Seq("k", "k2"))
    val adaptive2 = SkewJoin.adaptiveSaltedJoin(left2,
      left2.select(col("k"), col("k2")).distinct().withColumn("rv", lit(1)),
      Seq("k", "k2"), saltFactor = 4, hotThreshold = 100)
    assert(adaptive2.count() == plain2.count())
  }

  test("adaptive salting with no hot keys degenerates to the plain join") {
    val left = (0L until 200L).map(k => (k, k * 2)).toDF("k", "lv")
    val right = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    // every key appears once — far under any threshold; auto-derivation
    // (hotThreshold = 0) must find nothing and skip salting entirely
    val out = SkewJoin.adaptiveSaltedJoin(left, right, Seq("k"))
    assert(!out.columns.contains("__salt"))
    assert(out.count() == 100)
    // and the plan carries no explode (no replication of the right side)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("generate"))
  }

  test("adaptive salting rejects right/full outer joins") {
    val df = Seq((1L, 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.adaptiveSaltedJoin(df, df, Seq("k"), joinType = "full_outer")
    }
  }

  test("salting spreads the hot key across partitions") {
    val left = (1 to 1000).map(i => (7L, i)).toDF("k", "lv") // all one key
    val right = Seq((7L, "x")).toDF("k", "rv")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltFactor = 4)
    // post-join rows originated from 4 distinct salt groups: verify the
    // pre-join salted left had all 4 salts populated
    val salts = left.withColumn("__salt",
        pmod(xxhash64(left.columns.map(col): _*), lit(4)))
      .groupBy("__salt").count().collect()
    assert(salts.length == 4)
    assert(salts.map(_.getLong(1)).max < 1000) // no single group holds all
    assert(salted.count() == 1000)
  }
}
