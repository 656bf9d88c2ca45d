package graft.operators

import graft.SparkSpec

class AbTestSpec extends SparkSpec {

  import spark.implicits._

  // 100 users per arm; the first x_a / x_b users of each arm convert
  private def events(xA: Int, xB: Int) =
    ((0 until 100).map(u => (u.toLong, 0, if (u < xA) 1 else 0)) ++
     (0 until 100).map(u => (100L + u, 1, if (u < xB) 1 else 0)))
      .toDF("user_id", "variant", "conv")

  private def verdict(xA: Int, xB: Int) = {
    val r = AbTest.twoProportion(events(xA, xB), "user_id", "variant",
      "conv").collect().head
    (r.getAs[Long]("n_a"), r.getAs[Long]("x_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("x_b"), r.getAs[Long]("lift_ppm"),
      r.getAs[Int]("significant"))
  }

  test("boundary pair around z² = 3.8416 lands on opposite verdicts") {
    // 10% vs 20% at n=100: z² = 3.92 — just significant
    assert(verdict(10, 20) === ((100L, 10L, 100L, 20L, 100000L, 1)))
    // 10% vs 19%: z² = 3.27 — just not
    assert(verdict(10, 19) === ((100L, 10L, 100L, 19L, 90000L, 0)))
  }

  test("clear lift, exact tie, and the zero-variance pools") {
    assert(verdict(10, 30)._6 === 1)
    assert(verdict(25, 25) === ((100L, 25L, 100L, 25L, 0L, 0)))
    // all-converted / none-converted: pooled variance 0, z undefined —
    // the strict inequality reads 0 > 0 and stays insignificant
    assert(verdict(100, 100)._6 === 0)
    assert(verdict(0, 0)._6 === 0)
  }

  test("a user's repeated events convert once") {
    val ev = Seq(
      (1L, 0, 0), (1L, 0, 1), (1L, 0, 0), // one converting user, 3 events
      (2L, 0, 0), (3L, 1, 1), (4L, 1, 0)
    ).toDF("user_id", "variant", "conv")
    val r = AbTest.twoProportion(ev, "user_id", "variant", "conv")
      .collect().head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("x_a") === 1L)
    assert(r.getAs[Long]("n_b") === 2L && r.getAs[Long]("x_b") === 1L)
  }

  test("the decimal cross-multiplication survives large counts") {
    // 10M users per arm, 2.000M vs 2.004M conversions — products reach
    // ~1e31, far past int64; the small absolute lift at this n IS
    // significant (z² ≈ 5.0)
    // counts injected directly (building 20M event rows would test the
    // JVM, not the arithmetic): replay the operator's verdict expression
    // on the pre-aggregated pair
    val big = Seq((10000000L, 2000000L, 10000000L, 2004000L))
      .toDF("n_a", "x_a", "n_b", "x_b")
    import org.apache.spark.sql.functions._
    val a = big.select(col("n_a"), col("x_a"))
    val b = big.select(col("n_b"), col("x_b"))
    val out = a.crossJoin(b)
      .withColumn("diff", expr(
        """CAST(x_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) -
           CAST(x_b AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))"""))
      .withColumn("significant", expr(
        """CAST(CASE WHEN
             CAST(2500 AS DECIMAL(19,0)) *
             CAST(n_a + n_b AS DECIMAL(19,0)) * diff * diff >
             CAST(9604 AS DECIMAL(19,0)) *
             CAST(x_a + x_b AS DECIMAL(19,0)) *
             CAST(n_a + n_b - x_a - x_b AS DECIMAL(19,0)) *
             CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
           THEN 1 ELSE 0 END AS INT)"""))
    assert(out.collect().head.getAs[Int]("significant") === 1)
  }
}
