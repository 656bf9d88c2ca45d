package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("weights: target-favored token outweighs raw-only token") {
    val raw = Seq((0L, "alpha beta"), (1L, "alpha gamma"),
                  (2L, "beta beta gamma")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha alpha alpha")).toDF("doc_id", "text")
    val w = Dsir.unigramWeights(raw, target).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(w("alpha") > w("beta") && w("alpha") > w("gamma"))
    // beta never appears in target: weight strictly below a target token
    assert(w("beta") < 0 || w("alpha") > 0)
  }

  test("scoreExact: target-language docs score higher on average") {
    val target = docs.filter(col("lang") === "en")
    val scored = Dsir.scoreExact(docs, target)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val avg = scored.groupBy(col("lang") === "en")
      .agg(mean("score")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false))
  }

  test("scoreExact counts every token occurrence") {
    val raw = Seq((0L, "a a b"), (1L, "b")).toDF("doc_id", "text")
    val target = Seq((9L, "a")).toDF("doc_id", "text")
    val n = Dsir.scoreExact(raw, target).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(0L -> 3L, 1L -> 1L))
  }

  test("hashed path agrees with exact on ranking (top-50 overlap)") {
    // The two paths smooth over different feature spaces (raw vocab V vs
    // bucket count B), which shifts every token weight by a different
    // constant C — the raw score sums then differ by len·ΔC, a pure
    // length effect. The PER-TOKEN density score/n_tokens cancels it:
    // rankings agree up to hash collisions, which 2^16 buckets over a
    // small vocab make rare.
    val target = docs.filter(col("lang") === "en")
    def top(df: org.apache.spark.sql.DataFrame) = df
      .orderBy((col("score") / col("n_tokens")).desc, col("doc_id").asc)
      .select("doc_id").limit(50).collect().map(_.getLong(0)).toSet
    val exact = top(Dsir.scoreExact(docs, target))
    val hashed = top(Dsir.scoreHashed(docs, target, buckets = 1 << 16))
    assert((exact & hashed).size >= 40,
      s"top-50 overlap too small: ${(exact & hashed).size}")
  }

  test("hashed path with few buckets still separates target language") {
    val target = docs.filter(col("lang") === "en")
    val scored = Dsir.scoreHashed(docs, target, buckets = 4096)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val avg = scored.groupBy(col("lang") === "en")
      .agg(mean("score")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false))
  }
}
