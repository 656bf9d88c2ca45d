package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Determinism, balance, and write-path tests for training shards. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 1000L)
    .map(i => (i, s"tok$i word text ${"pad " * (i % 5).toInt}doc"))
    .toDF("doc_id", "text")

  test("mix is a bijection on ids < P — no two docs collide") {
    val n = Sharding.assign(docs, 16).select("mix").distinct().count()
    assert(n == 1000L)
  }

  test("assignment is deterministic across runs and plans") {
    val a = Sharding.assign(docs, 16).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sharding.assign(docs.repartition(7), 16)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("shards are balanced within binomial noise on sequential ids") {
    val sizes = Sharding.assign(docs, 16).groupBy("shard").count()
      .select("count").as[Long].collect()
    assert(sizes.length == 16)
    // n/k = 62.5; 5 sigma ≈ 38 — sequential ids must not pile up
    assert(sizes.forall(s => s > 24 && s < 101), sizes.mkString(","))
  }

  test("shard decorrelates from id order (adjacent ids scatter)") {
    val shards = Sharding.assign(docs.limit(32), 16)
      .orderBy("doc_id").select("shard").as[Int].collect()
    assert(shards.distinct.length > 8) // 32 consecutive ids hit >8 shards
  }

  test("assignSplits: disjoint, exhaustive, deterministic, near-target shares") {
    val out = Sharding.assignSplits(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("train", "val", "test"))
    assert(out.values.sum == 1000L)
    // 90/5/5 ± binomial noise on 1000 sequential ids
    assert(out("train") > 850 && out("train") < 950, out.toString)
    assert(out("val") > 20 && out("val") < 80)
    assert(out("test") > 20 && out("test") < 80)
    // pure function of id: repartitioning must not move any document
    val a = Sharding.assignSplits(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sharding.assignSplits(docs.repartition(7))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("writeShards: files partition by shard, rows conserved, manifest matches") {
    val dir = tmpDir("shards").toString
    val manifest = Sharding.writeShards(docs, dir, nShards = 8)
    assert(manifest.length == 8)
    assert(manifest.map(_._2).sum == 1000L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000L)
    // every row landed in the directory matching its recomputed shard
    val misplaced = back
      .withColumn("expect", Sharding.shardOf(col("doc_id"), 8))
      .filter(col("shard") =!= col("expect")).count()
    assert(misplaced == 0L)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.json")))
    assert(json.contains("\"n_docs\"") && json.startsWith("["))
    // token counts in manifest equal a direct recount
    assert(manifest.map(_._3).sum ==
      Sharding.shardStats(docs, 8).agg(sum("n_tokens")).head().getLong(0))
  }

  test("leak-free split: clusters whole on one side, chains included") {
    // dup graph with a TRANSITIVE chain across two "fingerprint" pairs:
    // 1-2, 2-3 => {1,2,3} one component; 10-11 another; 20 singleton
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Sharding.assignSplitsLeakFree(docs, pairs,
        splits = Seq("train" -> 0.5, "val" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rep"), r.getAs[String]("split")))).toMap
    // every cluster member shares the representative AND the split
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(1L)._1 == 1L)
    assert(got(10L) == got(11L) && got(10L)._1 == 10L)
    // singleton reps are their own id -> identical to the plain split
    val plain = Sharding.assignSplits(docs.filter(col("doc_id") === 20L),
        splits = Seq("train" -> 0.5, "val" -> 0.5))
      .head().getAs[String]("split")
    assert(got(20L) == ((20L, plain)))
    // property: no pair ever straddles the boundary, whatever the seed
    val rnd = new scala.util.Random(11)
    val ids = (0L until 200L)
    val rpairs = (0 until 120).map(_ =>
      (ids(rnd.nextInt(200)), ids(rnd.nextInt(200))))
      .filter(p => p._1 != p._2).toDF("a_id", "b_id")
    val big = Sharding.assignSplitsLeakFree(ids.toDF("doc_id"), rpairs)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    rpairs.collect().foreach { r =>
      assert(big(r.getLong(0)) == big(r.getLong(1)),
        s"pair ${r.getLong(0)}-${r.getLong(1)} straddles the split")
    }
  }
}
