package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(41)
    (1 to 3000).map(i =>
      (i.toLong, Seq("web", "code", "books")(rnd.nextInt(3))))
      .toDF("doc_id", "source")
  }

  test("stratifiedExact: n per stratum, deterministic across runs/shuffles") {
    val s1 = Sampling.stratifiedExact(docs, "source", 10, "doc_id")
    val counts = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10) && counts.size == 3)
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    // same selection from a differently-partitioned input
    val ids2 = Sampling.stratifiedExact(docs.repartition(7), "source", 10,
      "doc_id").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // different seed → different rows
    val ids3 = Sampling.stratifiedExact(docs, "source", 10, "doc_id",
      seed = 7L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 != ids3)
  }

  test("hashSample: ~fraction of rows, monotone in fraction") {
    val ten = Sampling.hashSample(docs, 0.10, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(math.abs(ten.size - 300) < 100, s"got ${ten.size}")
    val twenty = Sampling.hashSample(docs, 0.20, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ten.subsetOf(twenty)) // monotone growth
    assert(Sampling.hashSample(docs, 0.0, "doc_id").count() == 0)
    assert(Sampling.hashSample(docs, 1.0, "doc_id").count() == 3000)
  }

  test("mixture: exact total with largest-remainder shares, tagged rows") {
    val web = docs.filter(col("source") === "web")
    val code = docs.filter(col("source") === "code")
    val books = docs.filter(col("source") === "books")
    val mix = Sampling.mixture(Seq(
      ("web", web, 0.5), ("code", code, 0.3), ("books", books, 0.2)),
      totalRows = 100, keyCol = "doc_id")
    assert(mix.count() == 100)
    val bys = mix.groupBy("__source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys == Map("web" -> 50L, "code" -> 30L, "books" -> 20L))
    // weights that don't divide evenly still sum exactly
    val mix2 = Sampling.mixture(Seq(
      ("web", web, 1.0), ("code", code, 1.0), ("books", books, 1.0)),
      totalRows = 100, keyCol = "doc_id")
    assert(mix2.count() == 100)
    val bys2 = mix2.groupBy("__source").count().collect().map(_.getLong(1))
    assert(bys2.sum == 100 && bys2.max - bys2.min <= 1)
  }

  test("temperatureResample: n^α shares, repetition ordinals, determinism") {
    // heavily skewed groups: 2400 web / 500 code / 100 books
    val skewed = (1 to 3000).map { i =>
      (i.toLong, if (i <= 2400) "web" else if (i <= 2900) "code" else "books")
    }.toDF("doc_id", "source")
    val out = Sampling.temperatureResample(skewed, "source", "doc_id",
      targetRows = 3000L, alpha = 0.5)
    val n = Map("web" -> 2400.0, "code" -> 500.0, "books" -> 100.0)
    val s = List("books", "code", "web").map(g => math.sqrt(n(g))).sum
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (g, ng) =>
      val expect = math.sqrt(ng) / s * 3000.0
      // per-row Bernoulli: binomial σ ≤ sqrt(n)/2 — allow 5σ
      assert(math.abs(got(g) - expect) < 5 * math.sqrt(ng).max(10.0),
        s"$g: got ${got(g)}, expected ~$expect")
    }
    // α=0.5 boosts the tail ABOVE natural size and trims the head below
    assert(got("books") > 100 && got("web") < 2400)
    // every natural row of an upsampled group survives (rate > 1 ⇒ ⌊rate⌋
    // ≥ 1 copies for every row), with copy ordinals 0..copies-1
    val books = out.filter(col("source") === "books")
    assert(books.select("doc_id").distinct().count() == 100)
    val perDoc = books.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), min("copy").as("lo"), max("copy").as("hi"))
      .collect()
    assert(perDoc.forall(r => r.getInt(2) == 0 &&
      r.getInt(3).toLong == r.getLong(1) - 1), "copy must be a 0..c-1 ordinal")
    // deterministic under repartitioning (hash of the key, not of splits)
    val again = Sampling.temperatureResample(skewed.repartition(13),
      "source", "doc_id", targetRows = 3000L, alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
    // α=1 recovers ~natural proportions (rate ≈ 1 for every group)
    val nat = Sampling.temperatureResample(skewed, "source", "doc_id",
      targetRows = 3000L, alpha = 1.0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (g, ng) =>
      assert(math.abs(nat(g) - ng) < 5 * math.sqrt(ng).max(10.0)) }
  }

  test("weightedSampleNoReplace: deterministic, exact k, weights gate entry") {
    val df = (1L to 200L).map(i => (i, i)).toDF("id", "w")
    val a = Sampling.weightedSampleNoReplace(df, 20, "w", "id", "t1")
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedSampleNoReplace(
        df.repartition(7), 20, "w", "id", "t1")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 20, "same tag must reproduce the same sample")
    // zero/negative weights can never be drawn
    val withDead = df.union(Seq((900L, 0L), (901L, -5L)).toDF("id", "w"))
    val c = Sampling.weightedSampleNoReplace(withDead, 200, "w", "id", "t1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!c.contains(900L) && !c.contains(901L) && c.size == 200)
  }

  test("weightedSampleNoReplace: inclusion tracks weight across tags") {
    // two candidates, one 50x heavier; over many independent tags the
    // heavy one must win the k=1 draw most of the time (p = 50/51)
    val df = Seq((1L, 100L), (2L, 2L)).toDF("id", "w")
    val wins = (1 to 40).count { t =>
      Sampling.weightedSampleNoReplace(df, 1, "w", "id", s"tag$t")
        .head.getLong(0) == 1L
    }
    assert(wins >= 32, s"heavy item won only $wins/40 draws")
  }
}
