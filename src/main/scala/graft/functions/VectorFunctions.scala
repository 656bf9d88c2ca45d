package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns, built from
  * higher-order functions (`zip_with` / `aggregate`) so everything stays in
  * codegen — no UDF deserialization per row, which is what makes brute-force
  * similarity scans feasible over billions of embeddings.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
      (x, y) => (x.cast("double") - y.cast("double")) *
                (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
  }

  /** Pre-normalize a vector to unit length (do this ONCE per corpus, then
    * cosine = dot — halves the flops of every subsequent comparison).
    *
    * Delegates to the native one-pass [[VectorExpressions.VecNormalize]]
    * kernel — the HOF formulation (`transform(a, x -> x / l2Norm(a))`)
    * re-evaluated the norm aggregate per ELEMENT (O(d²) per row) and its
    * lambdas pinned the whole projection out of WholeStageCodegen. Same
    * semantics bit-for-bit (zero vectors pass through widened). Requires
    * `VectorExpressions.register` on the session, which every operator
    * call path already does.
    */
  def normalize(a: Column): Column = VectorExpressions.normNative(a)

  /** Sign-random-projection LSH bucket: for each of `planes.length`
    * hyperplanes, bit = (v · plane) >= 0. Returns a long bucket id.
    * Hyperplanes are generated deterministically on the driver (seeded) and
    * inlined as literals — they're tiny (nBits × dim doubles) and broadcast
    * with the plan, so no shuffle and no side-channel state.
    */
  def srpBucket(v: Column, planes: Seq[Array[Double]]): Column = {
    val bits: Seq[Column] = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(VectorExpressions.dotNative(v, planeCol) >= 0.0, lit(1L << i))
        .otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Deterministic pseudo-random unit hyperplanes (xorshift from a seed). */
  def randomPlanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 1000000L).toDouble / 1000000.0
    }
    (0 until nBits).map { _ =>
      val raw = Array.fill(dim)(next() * 2 - 1)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
  }
}
