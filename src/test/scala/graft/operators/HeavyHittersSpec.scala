package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FrequentItems

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic Zipf-ish stream: item i (1-based) appears ⌊m/i⌋ times —
    * a long light tail around a few heavy heads, vocab ≫ sketch size. */
  private def zipf(vocab: Int, m: Int): Seq[String] =
    (1 to vocab).flatMap(i => Seq.fill(m / i)(s"w$i"))

  test("Misra–Gries bound: heavy items survive, estimates within n/(k+1)") {
    val k = 20
    val data = zipf(vocab = 2000, m = 600) // n ≈ 600·H(2000) ≈ 4900, vocab 2000 ≫ 2k
    val n = data.length.toLong
    val exact = data.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    // shuffle deterministically so heavy items are spread across partitions
    val shuffled = new scala.util.Random(42).shuffle(data)
    val df = shuffled.toDF("item").repartition(7)
    FrequentItems.register(spark)
    val sk = df.agg(FrequentItems.sketch(col("item"), lit(k)).as("sk"))
      .selectExpr("inline(sk)")
      .as[(String, Long)].collect().toMap
    assert(sk.size <= k, s"sketch returned ${sk.size} > k=$k entries")
    val bound = n / (k + 1)
    exact.foreach { case (w, f) =>
      if (f > bound)
        assert(sk.contains(w), s"item $w with f=$f > n/(k+1)=$bound missing")
      sk.get(w).foreach { est =>
        assert(est <= f, s"overestimate for $w: est=$est > f=$f")
        assert(f - est <= bound, s"undercount for $w: f=$f est=$est bound=$bound")
      }
    }
    // vocab (2000) ≫ capacity (2k=40): compress ran many times on every
    // partition AND in the merge path — the bound above held regardless
  }

  test("exactHeavy equals the naive count-filter plan on a Zipf stream") {
    val denom = 25
    val data = zipf(vocab = 500, m = 400)
    val df = new scala.util.Random(7).shuffle(data).toDF("item").repartition(5)
    val got = HeavyHitters.exactHeavy(df, denom)
      .select("item", "cnt").as[(String, Long)].collect().toMap
    val n = data.length.toLong
    val want = data.groupBy(identity).view
      .mapValues(_.length.toLong).filter(_._2 * denom > n).toMap
    assert(got == want)
  }

  test("exactHeavy matches naive on real testdata tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.functions.TextFunctions._
    val toks = docs.select(explode(tokens(normalizeText(col("text")))).as("item"))
    val denom = 40
    val got = HeavyHitters.exactHeavy(toks, denom)
      .select("item", "cnt").as[(String, Long)].collect().toMap
    val n = toks.count()
    val want = toks.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * denom > n)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("edge cases: empty input, uniform stream, nulls skipped") {
    FrequentItems.register(spark)
    val empty = HeavyHitters.exactHeavy(Seq.empty[String].toDF("item"), 10)
    assert(empty.collect().isEmpty)

    // all-unique stream: nothing exceeds n/denom once n > denom
    val uniq = (1 to 200).map(i => s"u$i").toDF("item")
    assert(HeavyHitters.exactHeavy(uniq, 10).collect().isEmpty)

    // nulls are skipped by the sketch and contribute nothing to n
    val withNulls = (Seq.fill(30)(Some("hot")) ++ Seq.fill(5)(None) ++
      (1 to 20).map(i => Some(s"t$i"))).toDF("item")
    val hh = HeavyHitters.exactHeavy(withNulls, 2)
      .select("item", "cnt").as[(String, Long)].collect().toMap
    assert(hh == Map("hot" -> 30L))
  }

  test("grouped sketch: per-group candidates respect the per-group bound") {
    // graft_mg composes under groupBy like any aggregate — partial
    // sketches merge per GROUP, so the guarantee holds with each group's
    // own n. Two groups with different vocabularies and sizes.
    FrequentItems.register(spark)
    val k = 10
    val data =
      zipf(vocab = 400, m = 300).map(("g1", _)) ++
        zipf(vocab = 50, m = 80).map { w => ("g2", w + "_b") }
    val df = new scala.util.Random(11).shuffle(data)
      .toDF("g", "item").repartition(6)
    val got = df.groupBy("g")
      .agg(FrequentItems.sketch(col("item"), lit(k)).as("sk"))
      .selectExpr("g", "inline(sk)")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val n = rows.length.toLong
      val exact = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val sk = got(g)
      assert(sk.size <= k)
      exact.foreach { case (w, f) =>
        if (f > n / (k + 1)) assert(sk.contains(w), s"$g/$w f=$f missing")
        sk.get(w).foreach { est =>
          assert(est <= f && f - est <= n / (k + 1), s"$g/$w est=$est f=$f")
        }
      }
    }
  }

  test("exactHeavyPerGroup matches per-group naive on real testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.functions.TextFunctions._
    val toks = docs.select(col("lang"),
      explode(tokens(normalizeText(col("text")))).as("item"))
    val got = HeavyHitters.exactHeavyPerGroup(toks, "lang", "item", 40)
      .select("lang", "item", "cnt").as[(String, String, Long)]
      .collect().toSet
    val totals = toks.groupBy("lang").agg(count(lit(1)).as("n"))
    val want = toks.groupBy("lang", "item").agg(count(lit(1)).as("cnt"))
      .join(totals, Seq("lang"))
      .filter(col("cnt") * 40 > col("n"))
      .select("lang", "item", "cnt").as[(String, String, Long)]
      .collect().toSet
    assert(got == want)
    assert(got.map(_._1).size > 1, "expected multiple language groups")
  }

  test("sketch output is est-descending and capped at k") {
    FrequentItems.register(spark)
    val df = zipf(vocab = 300, m = 200).toDF("item").repartition(3)
    val rows = df.agg(FrequentItems.sketch(col("item"), lit(8)).as("sk"))
      .selectExpr("inline(sk)").as[(String, Long)].collect()
    assert(rows.length <= 8)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }
}
