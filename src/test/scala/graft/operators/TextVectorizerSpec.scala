package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hashing-trick vectorizer: sparse/dense agreement, determinism, zero
  * vectors for empty docs, and composition with the ANN operators.
  */
class TextVectorizerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark spark hash join"),
    (1L, "hash table  scan"),
    (2L, ""),
    (3L, "spark")).toDF("doc_id", "text")

  test("dense vectors equal the sparse form; empty docs are zero") {
    val dim = 32
    val sparse = TextVectorizer.sparseHashedTf(docs, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = TextVectorizer.hashedVectors(docs, dim).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    assert(dense.keySet == Set(0L, 1L, 2L, 3L))
    dense.foreach { case (id, v) =>
      assert(v.length == dim)
      v.zipWithIndex.foreach { case (x, i) =>
        assert(x == sparse.getOrElse((id, i.toLong), 0L).toFloat,
          s"doc $id bucket $i")
      }
    }
    assert(dense(2L).forall(_ == 0.0f))
    // token counts are conserved: sum of vector = token count
    assert(dense(0L).sum == 4.0f && dense(3L).sum == 1.0f)
  }

  test("same token always lands in the same bucket (determinism)") {
    val a = TextVectorizer.sparseHashedTf(docs, 64).collect().toSet
    val b = TextVectorizer.sparseHashedTf(
      docs.repartition(7), 64).collect().toSet
    assert(a == b)
  }

  test("hashed vectors compose with the ANN operators") {
    val corpus = (0L until 20L).map(i =>
      (i, s"token${i % 4} token${i % 4} filler$i")).toDF("doc_id", "text")
    val vecs = TextVectorizer.hashedVectors(corpus, dim = 64)
      .withColumnRenamed("doc_id", "vec_id")
    val q = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = Similarity.bruteForceTopK(vecs, q, k = 5).collect()
    assert(top.length == 5)
    // docs sharing token0 (i % 4 == 0) dominate the neighborhood
    val ids = top.map(_.getLong(1)).toSet
    assert(ids.contains(0L) && ids.exists(i => i != 0L && i % 4 == 0))
  }
}
