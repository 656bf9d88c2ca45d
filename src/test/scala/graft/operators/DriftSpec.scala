package graft.operators

import graft.SparkSpec

/** PSI drift: identical distributions score ~0, a shifted distribution
  * scores high, tails register, and the bucket spine is complete.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions give PSI ≈ 0; a shift registers") {
    val ref = (0 until 1000).map(i => (i % 100).toLong).toDF("v")
    val same = (0 until 1000).map(i => ((i * 7) % 100).toLong).toDF("v")
    val shifted = (0 until 1000).map(i => 50L + (i % 100)).toDF("v")
    val psiSame = Drift.psi(ref, same, "v", lo = 0L, width = 10L,
      nBuckets = 15)
    val psiShift = Drift.psi(ref, shifted, "v", lo = 0L, width = 10L,
      nBuckets = 15)
    assert(math.abs(psiSame) < 0.01, s"identical dist psi $psiSame")
    assert(psiShift > 0.25, s"shifted dist psi $psiShift")
  }

  test("bucket spine is complete and counts are exact, tails clamp") {
    val ref = Seq(-5L, 0L, 9L, 10L, 99L, 1000L).toDF("v")
    val cur = Seq(5L).toDF("v")
    val rows = Drift.psiBuckets(ref, cur, "v", lo = 0L, width = 10L,
        nBuckets = 5)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 5L))
    // bucket 0: -5 (clamped), 0, 9 from ref; 5 from cur
    assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 1L)
    // last bucket: 99 and 1000 clamp in
    assert(rows(4).getLong(1) == 2L)
    // middle empties exist with zero counts and finite psi terms
    assert(rows(2).getLong(1) == 0L && !rows(2).getDouble(3).isNaN)
  }

  test("PSI is asymmetric-safe: empty buckets on either side stay finite") {
    val ref = Seq(1L, 2L, 3L).toDF("v")
    val cur = Seq(91L, 92L).toDF("v")
    val p = Drift.psi(ref, cur, "v", lo = 0L, width = 10L, nBuckets = 10)
    assert(!p.isNaN && !p.isInfinite && p > 0)
  }
}
