package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("debiasing is exact integer arithmetic on a hand case") {
    // 10 rows, 4 reported ones under p=0.25:
    // obs = 400000 ppm → (400000 − 250000)·10⁶ div 500000 = 300000
    val rr = (1 to 10).map(i => ("g", if (i <= 4) 1 else 0))
      .toDF("grp", "rr_bit")
    val out = Privacy.debiasedRate(rr, "grp", pPpm = 250000L)
      .select("n", "n_reported", "est_true_ppm")
      .as[(Long, Long, Long)].head()
    assert(out === ((10L, 4L, 300000L)))
  }

  test("estimates clamp to [0, 1e6] when small groups debias past the ends") {
    val rr = Seq(("lo", 0), ("lo", 0), ("hi", 1), ("hi", 1))
      .toDF("grp", "rr_bit")
    val m = Privacy.debiasedRate(rr, "grp", pPpm = 250000L)
      .select("grp", "est_true_ppm").as[(String, Long)].collect().toMap
    assert(m("lo") === 0L)      // obs 0 < p → raw estimate negative
    assert(m("hi") === 1000000L) // obs 1 > 1−p → raw estimate > 1
  }

  test("the seeded coin is deterministic and flips ≈p of the rows") {
    val df = spark.range(0, 20000).toDF("id")
      .withColumn("sig", lit(0)) // all-zero signal: reported 1s ARE flips
    val rr = Privacy.randomizedResponse(df, "id", "sig",
      pPpm = 250000L, seed = "s1")
    val flips = rr.agg(sum("rr_bit")).as[Long].head()
    assert(math.abs(flips - 5000L) < 400L, s"flip count $flips vs ~5000")
    // same seed → identical bits (retry idempotency)
    val again = Privacy.randomizedResponse(df, "id", "sig",
      pPpm = 250000L, seed = "s1")
    assert(rr.select("id", "rr_bit").except(
      again.select("id", "rr_bit")).count() === 0)
    // a different seed draws a different coin sequence
    val other = Privacy.randomizedResponse(df, "id", "sig",
      pPpm = 250000L, seed = "s2")
    assert(rr.select("id", "rr_bit").except(
      other.select("id", "rr_bit")).count() > 0)
  }

  test("the estimator recovers a planted rate through the noise") {
    // true rate 30%: ids with id%10 < 3 carry the signal
    val df = spark.range(0, 50000).toDF("id")
      .withColumn("sig", (col("id") % 10 < 3).cast("int"))
      .withColumn("grp", lit("g"))
    val est = Privacy.debiasedRate(
      Privacy.randomizedResponse(df, "id", "sig",
        pPpm = 250000L, seed = "plant"),
      "grp", pPpm = 250000L)
      .select("est_true_ppm").as[Long].head()
    assert(math.abs(est - 300000L) < 15000L,
      s"estimate $est ppm vs planted 300000")
  }
}
