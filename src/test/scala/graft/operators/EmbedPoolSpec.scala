package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbedPoolSpec extends SparkSpec {
  import spark.implicits._

  test("mean pooling: known vectors") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 0.0f))).toDF("g", "vec")
    val long = EmbedPool.meanPoolLong(df, "g", "vec").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(long == Map(("a", 0) -> 2.0, ("a", 1) -> 4.0,
      ("b", 0) -> 10.0, ("b", 1) -> 0.0))
  }

  test("array face reassembles dimensions in order") {
    val df = Seq(("g", Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("g", "vec")
    val vec = EmbedPool.meanPool(df, "g", "vec")
      .head.getSeq[Double](1)
    assert(vec == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("array face agrees with long face on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val arr = EmbedPool.meanPool(emb, "label", "embedding")
      .select(col("label"), posexplode(col("vec_mean")).as(Seq("pos", "v")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val long = EmbedPool.meanPoolLong(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(arr.keySet == long.keySet)
    assert(arr.forall { case (k, v) => math.abs(v - long(k)) < 1e-12 })
  }
}
