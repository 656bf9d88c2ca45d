package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  // orthogonal-ish basis for hand cases
  private val ex = Seq(1f, 0f, 0f, 0f)
  private val ey = Seq(0f, 1f, 0f, 0f)
  private val ez = Seq(0f, 0f, 1f, 0f)
  private def mix(a: Seq[Float], b: Seq[Float], wa: Float, wb: Float) =
    a.zip(b).map { case (x, y) => x * wa + y * wb }

  test("a planted exact copy is mined with a high margin") {
    val src = emb(0L -> ex, 1L -> ey)
    // tgt: 10 = copy of src 0 (its translation), 11/12 = decoys far
    // from everything, 13 = copy of src 1
    val tgt = emb(10L -> ex, 11L -> ez, 12L -> mix(ez, ey, 0.9f, 0.1f),
      13L -> ey)
    val mined = Bitext.minePairs(src, tgt, k = 2,
        minMarginPpm = 1100000L)
      .orderBy("src_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mined.toSeq == Seq((0L, 10L), (1L, 13L)))
  }

  test("mutuality is required: a one-way best match is not a pair") {
    // src 0 and src 1 BOTH like tgt 10 best, but tgt 10's best is src 0
    // — only (0, 10) can mine; src 1 must not pair with its runner-up
    val src = emb(0L -> ex, 1L -> mix(ex, ey, 0.9f, 0.44f))
    val tgt = emb(10L -> ex, 11L -> ez)
    val mined = Bitext.minePairs(src, tgt, k = 2, minMarginPpm = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mined.toSeq == Seq((0L, 10L)))
  }

  test("the margin gate drops hub pairs raw cosine would keep") {
    // a dense xy-plane cluster on both sides: every pair's cosine is
    // high AND so are its neighborhoods', so margins sit near 1.0 and
    // a 1.2 threshold drops them — while an exact copy with a cold
    // neighborhood (s2/t12 on the z axis) clears the same threshold.
    // Raw cosine can't separate the two cases: 0.997 vs 1.0.
    val src = emb(0L -> mix(ex, ey, 0.8f, 0.6f),
      1L -> mix(ex, ey, 0.6f, 0.8f), 2L -> ez)
    val tgt = emb(10L -> mix(ex, ey, 0.75f, 0.66f),
      11L -> mix(ex, ey, 0.66f, 0.75f), 12L -> ez)
    val all = Bitext.minePairs(src, tgt, k = 2, minMarginPpm = 0L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
      .toMap
    assert(all.contains((0L, 10L)) && all.contains((2L, 12L)))
    assert(all((0L, 10L)) < 1200000L, s"hub pair margin ${all((0L, 10L))}")
    assert(all((2L, 12L)) > 1200000L, s"cold pair margin ${all((2L, 12L))}")
    val gated = Bitext.minePairs(src, tgt, k = 2, minMarginPpm = 1200000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gated.toSeq == Seq((2L, 12L)))
  }

  test("deterministic under repartition") {
    val vecs = (0L until 40L).map(i => i -> Seq.tabulate(8)(j =>
      (((i * 31 + j * 7) % 13).toFloat - 6f) / 6f))
    val src = emb(vecs.filter(_._1 % 2 == 0): _*)
    val tgt = emb(vecs.filter(_._1 % 2 == 1): _*)
    def run(p: Int) = {
      val s2 = if (p == 0) src else src.repartition(p)
      val t2 = if (p == 0) tgt else tgt.repartition(p)
      Bitext.minePairs(s2, t2, k = 3, minMarginPpm = 0L)
        .orderBy("src_id", "tgt_id").collect().toSeq
    }
    val a = run(0)
    assert(a == run(7))
    assert(a.nonEmpty)
  }
}
