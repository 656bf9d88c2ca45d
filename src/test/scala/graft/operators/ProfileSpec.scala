package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(17)
    (1 to 10000).map(i =>
      (i.toLong, rnd.nextInt(100), rnd.nextGaussian() * 10 + 50,
        if (i % 10 == 0) None else Some(i.toDouble)))
      .toDF("id", "bucket", "gauss", "maybe")
  }

  test("numericProfile: one-pass exact stats per numeric column") {
    val p = Profile.numericProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "bucket", "gauss", "maybe"))
    val id = p("id")
    assert(id.getAs[Long]("nRows") == 10000 && id.getAs[Long]("nNulls") == 0)
    assert(id.getAs[Double]("min") == 1.0 && id.getAs[Double]("max") == 10000.0)
    assert(id.getAs[Double]("p50") == 5000.5)
    val maybe = p("maybe")
    assert(maybe.getAs[Long]("nNulls") == 1000)
    val gauss = p("gauss")
    assert(math.abs(gauss.getAs[Double]("mean") - 50) < 1)
    assert(math.abs(gauss.getAs[Double]("stddev") - 10) < 1)
    // approx mode stays within sketch tolerance of exact quartiles
    val approx = Profile.numericProfile(df, approx = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(approx("id").getAs[Double]("p50") - 5000.5) < 50)
  }

  test("distributed quartiles match the percentile aggregate on random data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // duplicates, skew, odd sizes — exercise interpolation across and
    // within covering values
    for (n <- Seq(1, 2, 7, 100, 1001)) {
      val vals = (1 to n).map(_ => (rnd.nextInt(20).toDouble,
        rnd.nextGaussian() * 100))
      val df = vals.toDF("dupes", "wide")
      val got = Profile.numericProfile(df).collect()
        .map(r => r.getString(0) -> r).toMap
      val exp = df.agg(
        percentile(col("dupes"), array(lit(0.25), lit(0.5), lit(0.75))),
        percentile(col("wide"), array(lit(0.25), lit(0.5), lit(0.75))))
        .collect().head
      for ((c, i) <- Seq("dupes" -> 0, "wide" -> 1);
           (name, j) <- Seq("p25" -> 0, "p50" -> 1, "p75" -> 2)) {
        val e = exp.getAs[scala.collection.Seq[Double]](i)(j)
        val g = got(c).getAs[Double](name)
        assert(math.abs(e - g) < 1e-9, s"$c $name at n=$n: $e vs $g")
      }
    }
    // all-null column → NaN quartiles, not a crash
    val withNull = Seq((1.0, null.asInstanceOf[java.lang.Double]),
      (2.0, null.asInstanceOf[java.lang.Double])).toDF("a", "b")
    val p = Profile.numericProfile(withNull).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("b").getAs[Double]("p50").isNaN)
    assert(p("a").getAs[Double]("p50") == 1.5)
  }

  test("approxDistinct: HLL estimates within rsd tolerance") {
    val est = Profile.approxDistinct(df, rsd = 0.02)
    assert(math.abs(est("id") - 10000) <= 10000 * 0.06)
    assert(math.abs(est("bucket") - 100) <= 10) // tiny cardinality ~exact
  }
}
