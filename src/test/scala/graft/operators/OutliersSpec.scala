package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("withRobustZ: known median/MAD, planted outlier flagged") {
    // group a: values 1..9 + one planted 1000. median of the 10 values is
    // 5.5; |v-5.5| = 4.5,3.5,...,0.5,...,994.5 → MAD = 2.5 (exact halves)
    val df = ((1 to 9).map(v => ("a", v.toLong)) :+ ("a", 1000L))
      .toDF("g", "v")
    val z = Outliers.withRobustZ(df, "v", "g")
      .select(col("v"), col("__med"), col("__mad"), col("__robust_z"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(z(1000L)._1 == 5.5 && z(1000L)._2 == 2.5)
    assert(z(1000L)._3 > 3.5, "planted outlier must exceed the cut")
    assert((1 to 9).forall(v => z(v.toLong)._3 <= 3.5),
      "the body of the distribution must pass")
    // exact value: |1000-5.5|/(2.5*1.4826)
    assert(z(1000L)._3 == math.abs(1000.0 - 5.5) / (2.5 * 1.4826))
  }

  test("MAD = 0 group: exact-median rows keep, any deviation is infinite") {
    val df = (Seq.fill(5)(("c", 7L)) :+ ("c", 8L)).toDF("g", "v")
    val z = Outliers.withRobustZ(df, "v", "g")
      .select(col("v"), col("__robust_z")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(z(7L) == 0.0)
    assert(z(8L).isPosInfinity)
  }

  test("gate drops exactly the flagged rows; report counts agree") {
    val df = ((1 to 9).map(v => ("a", v.toLong)) :+ ("a", 1000L))
      .toDF("g", "v")
    val kept = Outliers.gate(df, "v", "g")
    assert(kept.count() == 9 &&
      kept.agg(max("v")).head.getLong(0) == 9L)
    assert(kept.columns.toSeq == Seq("g", "v"), "helper columns dropped")
    val rep = Outliers.report(df, "v", "g").head()
    assert(rep.getAs[Long]("n_rows") == 10 && rep.getAs[Long]("n_kept") == 9)
    assert(rep.getAs[Double]("kept_lo") == 1.0 &&
      rep.getAs[Double]("kept_hi") == 9.0)
  }

  test("mean/stddev gate would be dragged open where the robust gate holds") {
    // the motivating property: a huge outlier inflates stddev so much that
    // a 3.5-sigma MEAN gate keeps it, while the MAD gate still drops it
    val vals = (1 to 99).map(_.toLong % 10 + 1) :+ 100000L
    val df = vals.map(("a", _)).toDF("g", "v")
    val Array(mean, std) = df.agg(avg("v"), stddev_samp("v")).head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(100000.0 - mean) / std <= 3.5 * 3,
      "sanity: the outlier sits within a few inflated sigmas")
    assert(Outliers.gate(df, "v", "g").agg(max("v")).head.getLong(0) <= 10L)
  }
}
