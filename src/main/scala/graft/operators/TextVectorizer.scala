package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, tokens}

/** Feature-hashing text vectorizer (the "hashing trick", Weinberger et al.
  * ICML 2009): map each token to a bucket with a portable hash and count —
  * fixed-dimension bag-of-words vectors with NO learned vocabulary, no
  * dictionary shuffle, no model download. The bridge from raw text to the
  * embedding-space operators: hashed vectors feed the ANN / PCA /
  * near-dup / semantic-dedup machinery when no learned embedding exists.
  *
  * Scale shape:
  *  - One tokenize pass; the only wide exchange is the (doc_id, bucket)
  *    partial-count shuffle — word-count-shaped, fixed-width rows.
  *  - No vocabulary state anywhere (THE point of hashing): dimension is a
  *    constant, collisions are the accepted trade, nothing is learned, so
  *    the operator is embarrassingly parallel and batch-composable.
  *  - The hash is the corpus-standard portable 60-bit md5 form, so an
  *    external engine replays bucket assignment bit-for-bit (the same
  *    trick the *_fixed dedup oracles use).
  *  - Dense materialization is map-from-sorted-sparse + an O(dim) fill —
  *    per row, no cross-row work.
  */
object TextVectorizer {

  /** Portable token → bucket in [0, dim): 60-bit md5 value mod dim. */
  private def bucket(term: org.apache.spark.sql.Column, dim: Int) =
    pmod(conv(substring(md5(concat(lit("tv:"), term)), 1, 15), 16, 10)
      .cast("long"), lit(dim.toLong))

  /** Sparse hashed term frequencies: (idCol, bucket, tf) — the exactly
    * replayable face. */
  def sparseHashedTf(docs: DataFrame, dim: Int = 256,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(dim > 0)
    Dedup.spread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .select(col("doc_id"),
        explode(tokens(normalizeText(col("__text")))).as("term"))
      .groupBy(col("doc_id"), bucket(col("term"), dim).as("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Dense float vectors from the sparse form — (idCol, embedding
    * Array[Float]) in the shape every embedding operator here consumes.
    * Docs with no tokens get the zero vector.
    */
  def hashedVectors(docs: DataFrame, dim: Int = 256,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val sparse = sparseHashedTf(docs, dim, idCol, textCol)
      .groupBy("doc_id")
      .agg(map_from_arrays(collect_list(col("bucket")),
        collect_list(col("tf").cast("float"))).as("m"))
    // left join: empty documents keep a zero vector
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(sparse, Seq("doc_id"), "left")
      .select(col("doc_id"), transform(
        sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("m"), i.cast("long")), lit(0.0f)))
        .as("embedding"))
  }
}
