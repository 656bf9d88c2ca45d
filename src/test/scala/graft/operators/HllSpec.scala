package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HyperLogLog: register-file shape and bounds, shard mergeability (the
  * property that makes per-source sketches composable across crawl days),
  * accuracy within the published error bound, and the small-range
  * linear-counting branch.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def values(n: Int) = (0 until n).map(i => s"v$i").toDF("v")

  test("register file: <= m rows, rho in [1, maxRho], duplicate-invariant") {
    val b = 6
    val r = Hll.registers(values(500), "v", b).collect()
    assert(r.length <= (1 << b))
    r.foreach { row =>
      val (idx, rho) = (row.getLong(0), row.getInt(1))
      assert(idx >= 0 && idx < (1 << b))
      assert(rho >= 1 && rho <= Hll.maxRho(b), s"rho $rho out of range")
    }
    // distinct-ness: feeding every value 7 times changes nothing
    val dup = values(500).crossJoin(spark.range(7).select(lit(1).as("x")))
      .select("v")
    val r2 = Hll.registers(dup, "v", b).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(r2 == r.map(x => (x.getLong(0), x.getInt(1))).toSet)
  }

  test("merge property: max-merged shard registers == global registers") {
    val b = 7
    val df = values(2000).withColumn("shard",
      (xxhash64(col("v")) % 4 + 4) % 4)
    val global = Hll.registers(df, "v", b).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toMap
    // build one sketch per shard, union the register tables, re-max
    val shards = (0 until 4).map(s =>
      Hll.registers(df.filter(col("shard") === s), "v", b))
    val merged = shards.reduce(_ union _)
      .groupBy("idx").agg(max("rho").as("rho")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(merged == global)
    // and the merged estimate equals the global estimate exactly
    val em = Hll.estimate(shards.reduce(_ union _)
      .groupBy("idx").agg(max("rho").as("rho")), b).head
    val eg = Hll.estimate(Hll.registers(df, "v", b), b).head
    assert(em == eg)
  }

  test("accuracy: within 3 sigma (1.04/sqrt(m)) of true cardinality") {
    for ((n, b) <- Seq((100, 8), (2000, 8), (20000, 10))) {
      val est = Hll.distinctEstimate(values(n), "v", b)
        .head.getAs[Double]("est")
      val sigma = 1.04 / math.sqrt((1 << b).toDouble)
      assert(math.abs(est - n) / n <= 3 * sigma,
        s"n=$n b=$b est=$est rel=${math.abs(est - n) / n}")
    }
  }

  test("small-range branch: linear counting when registers are sparse") {
    // 5 distinct values over m=256 registers => V > 0, raw <= 2.5m
    val row = Hll.distinctEstimate(values(5), "v", 8).head
    val v = row.getAs[Long]("zero_regs")
    assert(v >= 251 && v <= 256 - 1)
    val est = row.getAs[Double]("est")
    // m*ln(m/V) for V in [251, 255] lands within (0, 8]
    assert(est > 0 && est <= 8.0, s"est=$est")
  }

  test("per-group sketches are independent") {
    val df = (0 until 1000).map(i => (s"g${i % 2}", s"v${i % 500}"))
      .toDF("g", "v")
    // group g0 sees v0..v498 (even), g1 sees odd => each 250 distinct of
    // its own id space; estimates must be near 250 for both
    val out = Hll.distinctEstimate(df, "v", 8, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    assert(out.keySet == Set("g0", "g1"))
    out.values.foreach(e => assert(math.abs(e - 250) / 250.0 < 0.25, s"$out"))
  }
}
