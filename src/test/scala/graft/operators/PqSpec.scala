package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: encode correctness against a driver-side replay,
  * the compression shape, and ADC's recall against exact brute force on
  * real testdata.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = graft.sources.Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")

  test("codebook: exact dyadic entries, all codes distinct per subspace") {
    val cb = Pq.codebook(64, 8, 16)
    assert(cb.length == 8 && cb(0).length == 16 && cb(0)(0).length == 8)
    // every entry is an exact dyadic (1/128 units) at component scale
    assert(cb.flatten.flatten.forall(v =>
      v >= -0.125 && v <= 0.125 && (v * 128).isWhole))
    // no duplicated code vector within a subspace (the mod-arithmetic trap)
    cb.foreach { space =>
      assert(space.map(_.toSeq).distinct.length == 16)
    }
  }

  test("encode matches a driver-side argmax replay, one code per subspace") {
    val cb = Pq.codebook(64, 8, 16)
    val rows = Pq.encode(embs.filter(col("vec_id") < 20))
      .select("vec_id", "cv", "codes")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray, r.getSeq[Int](2).toArray))
    assert(rows.length == 20)
    rows.foreach { case (id, cv, codes) =>
      assert(codes.length == 8)
      (0 until 8).foreach { s =>
        val subv = cv.slice(s * 8, s * 8 + 8)
        // argmax by (dot − ‖cb‖²/2, code) == argmin L2, ties → higher code
        val best = (0 until 16).map { c =>
          (subv.zip(cb(s)(c)).map { case (a, b) => a * b }.sum -
            cb(s)(c).map(x => x * x).sum / 2.0, c)
        }.max
        assert(codes(s) == best._2, s"id=$id s=$s")
      }
    }
  }

  test("adc recall tracks the code budget; learned codebooks beat frozen") {
    val q = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(embs, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[(Long, Long, Int)]) =
      rows.count { case (qid, vid, _) => exact.contains((qid, vid)) }

    // frozen closed-form codebooks at the oracle query's settings
    // (m=8, nCodes=16 — 256 B → 8 codes, the most aggressive point):
    // structurally valid ADC but not data-adapted, so quantization error
    // costs recall on this unstructured corpus
    val frozen = Pq.adcTopK(embs, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(frozen.length == 50)
    val frozenHits = recall(frozen)
    assert(frozenHits >= 10, s"frozen recall collapsed: $frozenHits/50")

    // learned per-subspace Lloyd codebooks at a production operating point
    // (m=16 subspaces, 64 codes — still 16× compression): the measured
    // ladder on this corpus is 13/50 (m=8,k=16 learned) → 24 (m=16,k=16)
    // → 33 (m=16,k=64), exactly PQ's compression-recall tradeoff
    val cb = Pq.learnCodebooks(embs, m = 16, nCodes = 64, iters = 2)
    val learned = Pq.adcTopK(embs, q, k = 5, m = 16, nCodes = 64, cb0 = cb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val learnedHits = recall(learned)
    assert(learnedHits >= 25, s"learned recall@5 too low: $learnedHits/50")
    assert(learnedHits > frozenHits,
      s"learning didn't help: $learnedHits <= $frozenHits")
  }

  test("ivf-pq index: probing all lists equals flat ADC; probes prune " +
      "at the partition level") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    Pq.writeIvfPqIndex(embs, dir, nLists = 8,
      coarse = Pq.hadamardCentroids(64, 8))
    val q = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    // nProbe = nLists: zero pruning → must equal the flat ADC scan exactly
    val all = Pq.ivfPqTopK(spark, dir, q, k = 5, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val flat = Pq.adcTopK(embs, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(all.toSeq == flat.toSeq)

    // nProbe = 2: the list scan carries a PartitionFilters isin over
    // centroid_id — file-level pruning, not a post-scan filter
    val pruned = Pq.ivfPqTopK(spark, dir, q, k = 5, nProbe = 2)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("centroid_id"), plan.take(2000))

    // the lists store ONLY (vec_id, codes): no vector column on disk
    val listSchema = spark.read.parquet(s"$dir/lists").schema.fieldNames.toSet
    assert(listSchema == Set("vec_id", "codes", "centroid_id"))
  }

  test("incremental append == one-shot rebuild; committed files untouched") {
    // build on the first half, append the second half: frozen quantizers
    // make assignment/codes pure functions of the vector, so probing the
    // appended index must be BIT-IDENTICAL to an index built over the
    // union in one shot
    val dirInc = java.nio.file.Files.createTempDirectory("pqappend").toString
    val dirFull = java.nio.file.Files.createTempDirectory("pqfull").toString
    val half1 = embs.filter(col("vec_id") % 2 === 0)
    val half2 = embs.filter(col("vec_id") % 2 === 1)
    val coarse = Pq.hadamardCentroids(64, 8)
    Pq.writeIvfPqIndex(half1, dirInc, nLists = 8, coarse = coarse)
    val before = new java.io.File(s"$dirInc/lists").listFiles().flatMap(d =>
      Option(d.listFiles()).toSeq.flatten.map(_.getPath)).toSet
    Pq.appendToIvfPqIndex(spark, dirInc, half2)
    val after = new java.io.File(s"$dirInc/lists").listFiles().flatMap(d =>
      Option(d.listFiles()).toSeq.flatten.map(_.getPath)).toSet
    assert(before.subsetOf(after), "append rewrote committed list files")
    assert(after.size > before.size)

    Pq.writeIvfPqIndex(embs, dirFull, nLists = 8, coarse = coarse)
    val q = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def probe(dir: String) =
      Pq.ivfPqTopK(spark, dir, q, k = 5, nProbe = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    assert(probe(dirInc) == probe(dirFull))
  }

  test("codegen compiles at the learned operating point: no silent " +
      "interpreted fallback") {
    // the retired Column forms unrolled m × nCodes terms into one
    // projection and blew janino's 64 KB method limit at (m=16,
    // nCodes=64) — Spark then SILENTLY ran the stage interpreted. With
    // fallback disabled a codegen bug throws instead of degrading; this
    // drives encode (PqEncodeCodes), the LUT (PqLut) and ADC scoring
    // (PqAdc) through the exact shape that used to fail.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cb = Pq.codebook(64, 16, 64) // 1024 codebook entries
      val enc = Pq.encode(embs.filter(col("vec_id") < 50),
        m = 16, nCodes = 64, cb0 = cb)
      assert(enc.select("vec_id", "codes").collect().length == 50)
      val q = embs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val tk = Pq.adcTopK(embs.filter(col("vec_id") < 200), q, k = 3,
        m = 16, nCodes = 64, cb0 = cb)
      assert(tk.collect().length == 15)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("re-materialized codebooks compare structurally equal — plan " +
      "canonicalization and CSE keys survive") {
    import graft.functions.{PqEncodeCodes, PqLut}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // two semantically identical codebooks materialized separately: the
    // case-class default compared the Array[Double] field by REFERENCE,
    // so these never canonicalized equal and cache/CSE keys silently
    // missed (round-10 ADVICE)
    def cb() = Pq.codebook(64, 8, 16).flatten.flatten
    val vec = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val a = PqEncodeCodes(vec, cb(), 8, 16)
    val b = PqEncodeCodes(vec, cb(), 8, 16)
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    assert(!(a == PqEncodeCodes(vec, cb().map(_ + 1.0), 8, 16)))
    val la = PqLut(vec, cb(), 8, 16)
    val lb = PqLut(vec, cb(), 8, 16)
    assert(la == lb && la.hashCode == lb.hashCode && la.semanticEquals(lb))
    assert(!(la == lb.copy(m = 4)))
    // distinct expression types never cross-compare equal
    assert(!(a == la) && !(la == a))
  }

  test("compression shape: m small codes per vector, codebook is a literal") {
    val enc = Pq.encode(embs)
    assert(enc.schema("codes").dataType.simpleString == "array<int>")
    val sizes = enc.select(size(col("codes"))).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(8)) // 64 floats → 8 codes
    // no shuffle in the encode plan: it's a pure projection
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
