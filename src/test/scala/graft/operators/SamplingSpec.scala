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
}
