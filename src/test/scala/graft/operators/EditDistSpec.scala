package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edit-distance fuzzy matching: exactness of the q-gram-filtered join
  * against the brute-force quadratic recompute, and the short-string
  * band-join path the count filter cannot cover.
  */
class EditDistSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: every pair, exact levenshtein. */
  private def brute(df: org.apache.spark.sql.DataFrame, d: Int) =
    df.as("a").join(df.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_1"), col("b.doc_id").as("id_2"),
        levenshtein(col("a.key"), col("b.key")).cast("long").as("dist"))
      .filter(col("dist") <= d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def fuzzy(df: org.apache.spark.sql.DataFrame, d: Int) =
    EditDist.editDistancePairs(df, maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2).toLong)).toSet

  test("matches brute force exactly on a mutated-string corpus") {
    // deterministic corpus: 40 bases, each with substituted / deleted /
    // inserted / double-mutated variants at varying positions
    val bases = (0 until 40).map(i =>
      s"record number $i of the synthetic corpus ${i % 7}")
    val rows = bases.zipWithIndex.flatMap { case (s, i) =>
      val sub = s.updated(i % s.length, 'Z')
      val del = s.take(i % s.length) + s.drop(i % s.length + 1)
      val ins = s.take((i * 3) % s.length) + "Q" + s.drop((i * 3) % s.length)
      val two = sub.updated((i + 7) % sub.length, 'W')
      Seq(s, sub, del, ins, two)
    }.zipWithIndex.map { case (s, id) => (id.toLong, s) }
    val df = rows.toDF("doc_id", "key")
    (0 to 2).foreach { d =>
      assert(fuzzy(df, d) == brute(df, d), s"mismatch at maxDist=$d")
    }
  }

  test("short strings route through the band join and still match") {
    // all below minLen (q + q*d = 9 at d=2): the count filter cannot see
    // them, the length-band path must
    val df = Seq((0L, "cat"), (1L, "cap"), (2L, "caps"), (3L, "dog"),
      (4L, "do"), (5L, ""), (6L, "catalog!"), (7L, "x"))
      .toDF("doc_id", "key")
    (0 to 2).foreach { d =>
      assert(fuzzy(df, d) == brute(df, d), s"mismatch at maxDist=$d")
    }
  }

  test("mixed short and long strings: cross-population pairs found") {
    val long = "a reasonably long linkage key for the filter"
    val df = Seq(
      (0L, long), (1L, long + "!"), // long-long pair at dist 1
      (2L, "tiny"), (3L, "tinq"), // short-short pair at dist 1
      (4L, long.drop(1))) // long (44→43 chars) pair with 0 at dist 1
      .toDF("doc_id", "key")
    val got = fuzzy(df, 2)
    assert(got == brute(df, 2))
    assert(got.contains((0L, 1L, 1L)) && got.contains((2L, 3L, 1L)) &&
      got.contains((0L, 4L, 1L)))
  }

  test("distance zero finds exact duplicates only") {
    val df = Seq((0L, "same same"), (1L, "same same"), (2L, "different"))
      .toDF("doc_id", "key")
    assert(fuzzy(df, 0) == Set((0L, 1L, 0L)))
  }
}
