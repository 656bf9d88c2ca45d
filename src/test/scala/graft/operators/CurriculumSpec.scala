package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Curriculum interleaving: distributed ranks equal the window recompute,
  * the stride schedule honors weights in every prefix, and the order is
  * deterministic.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("rankWithin equals the single-node window rank") {
    val df = (0 until 200).map(i =>
      (i.toLong, s"s${i % 7}", (i * 37) % 100)).toDF("id", "src", "q")
    val got = Curriculum.rankWithin(df, "src",
        Seq(col("q").desc, col("id").asc))
      .select("id", "rk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("q").desc, col("id").asc))
        - 1)
      .select("id", "rk").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    assert(got == want)
  }

  test("stride interleave: every prefix honors the weight ratio") {
    // A weighted 3, B weighted 1 -> every window of 4 holds 3 A's
    val df = ((0 until 12).map(i => (i.toLong, "A")) ++
      (100 until 112).map(i => (i.toLong, "B"))).toDF("id", "src")
    val seq = Curriculum.interleave(df, "src", Seq(col("id").asc),
        when(col("src") === "A", 3L).otherwise(1L))
      .orderBy("seq").select("src").collect().map(_.getString(0))
    (1 to 4).foreach { n =>
      val prefix = seq.take(4 * n)
      assert(prefix.count(_ == "A") == 3 * n,
        s"prefix ${4 * n}: ${prefix.mkString}")
    }
    // within each source the curriculum order (by id) is preserved
    val ids = Curriculum.interleave(df, "src", Seq(col("id").asc),
        when(col("src") === "A", 3L).otherwise(1L))
      .orderBy("seq").filter(col("src") === "A")
      .select("id").collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }

  test("deterministic: two runs produce the identical sequence") {
    val df = (0 until 300).map(i =>
      (i.toLong, s"s${i % 5}", (i * 13) % 50)).toDF("id", "src", "q")
    def run() = Curriculum.interleave(df, "src",
        Seq(col("q").desc, col("id").asc),
        lit(1) + substring(col("src"), 2, 5).cast("long") % 3)
      .select("seq", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run() == run())
  }
}
