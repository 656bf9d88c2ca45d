package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-answer tests for int8 vector quantization. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1.0f, -0.5f, 0.25f)),   // maxabs 1.0 → s = 1/127
    (2L, Seq(0.0f, 0.0f, 0.0f)),     // zero vector → s = 1, code 0
    (3L, Seq(12.7f, -12.7f, 6.35f))  // maxabs 12.7 → s = 0.1
  ).toDF("vec_id", "embedding")

  private lazy val q = Quantize.quantizeInt8(vecs).collect()
    .map(r => r.getLong(0) ->
      ((r.getDouble(2), r.getSeq[Int](3).toSeq))).toMap

  test("codes hit the int8 range endpoints and zero vectors are safe") {
    assert(q(1L)._2 == Seq(127, -64, 32)) // round(-63.5) away from zero
    assert(q(2L) == ((1.0, Seq(0, 0, 0))))
    assert(q(3L)._2 == Seq(127, -127, 64))
    assert(math.abs(q(3L)._1 - 12.7 / 127) < 1e-6)
  }

  test("reconstruction error is bounded by scale/2") {
    val errs = Quantize.quantizeInt8(vecs)
      .select(col("vec_id"), col("scale"),
        Quantize.reconMaxErr(col("embedding"), col("q"), col("scale"))
          .as("err"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    errs.foreach { case (s, e) => assert(e <= s / 2 + 1e-12, s"$e vs $s") }
  }

  test("dequantized cosine stays near 1 on random vectors") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 200L)
      .map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val cos = Quantize.quantizeInt8(data)
      .select(Quantize.reconCosine(col("embedding"), col("q")).as("c"))
      .as[Double].collect()
    assert(cos.forall(c => c > 0.999))
  }

  test("intDot is the exact integer MAC") {
    val two = Seq((1L, Seq(1, 2, 3), Seq(4, -5, 6))).toDF("id", "a", "b")
    val d = two.select(Quantize.intDot(col("a"), col("b"))).as[Long].head()
    assert(d == 4 - 10 + 18)
  }
}
