package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Q-digest quantile sketch: exactness when uncompressed, the
  * ε = depth/k rank-error guarantee under compression and merging,
  * order-insensitivity of [[QDigest.mergeAll]], and the Spark faces. */
class QDigestSpec extends SparkSpec {

  import QDigest._

  /** Exact rank interval of `est` in `values`: (count <, count <=). */
  private def ranks(values: Seq[Long], est: Long): (Long, Long) =
    (values.count(_ < est).toLong, values.count(_ <= est).toLong)

  /** The q-digest promise: the returned value's rank interval comes
    * within `bound` of the target rank ⌈q·n⌉ from both sides. */
  private def assertWithinBound(values: Seq[Long], sk: QSketch,
                                qPpm: Long): Unit = {
    val n = values.size.toLong
    val target = math.max(1L, (qPpm * n + 999999L) / 1000000L)
    val est = quantile(sk, qPpm)
    val (lo, hi) = ranks(values, est)
    val bound = rankErrorBound(sk)
    assert(hi >= target - bound && lo <= target + bound,
      s"q=$qPpm: est=$est rank=[$lo,$hi] target=$target bound=$bound")
  }

  private val qs = Seq(10000L, 100000L, 250000L, 500000L,
    750000L, 900000L, 990000L, 1000000L)

  test("uncompressed digest (huge k) answers quantiles exactly") {
    val values = (0L until 100L)
    val b = new Builder(depth = 10, k = 1000000L)
    values.foreach(b.add(_))
    val sk = b.result()
    assert(sk.n === 100L)
    // with n/k = 0 nothing compresses: every quantile is the exact
    // order statistic at rank ceil(q*n)
    assert(quantile(sk, 500000L) === 49L) // rank 50 = value 49
    assert(quantile(sk, 10000L) === 0L)   // rank 1
    assert(quantile(sk, 1000000L) === 99L)
    assert(quantile(sk, 990000L) === 98L) // rank 99
  }

  test("duplicates and skew stay within the rank-error bound") {
    // 90% zeros, a long tail of distinct highs — the latency-like shape
    val values = Seq.fill(900)(0L) ++ (1L to 100L).map(_ * 7L)
    val b = new Builder(depth = 10, k = 20L)
    values.foreach(b.add(_))
    val sk = b.result()
    qs.foreach(q => assertWithinBound(values, sk, q))
    assert(quantile(sk, 500000L) === 0L) // the median IS the heavy value
  }

  test("compression honors the error bound on adversarial shapes") {
    val rnd = new scala.util.Random(42)
    val shapes = Seq(
      Seq.fill(5000)(rnd.nextLong(1L << 20)),            // uniform
      Seq.fill(5000)(math.abs(rnd.nextGaussian() * 1000).toLong), // normal
      (0 until 5000).map(i => (1L << (i % 20))),          // powers
      Seq.fill(5000)(3L)                                  // constant
    )
    shapes.foreach { values =>
      val b = new Builder(depth = 20, k = 50L)
      values.foreach(b.add(_))
      val sk = b.result()
      // compressed well below the data size
      assert(sk.nodes.length / 2 <= 3 * 50 + 1,
        s"size ${sk.nodes.length / 2} exceeds 3k")
      qs.foreach(q => assertWithinBound(values, sk, q))
    }
  }

  test("mergeAll is order-insensitive and keeps the bound") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(8000)(rnd.nextLong(1L << 24))
    val chunks = values.grouped(1000).toSeq.map { c =>
      val b = new Builder(depth = 24, k = 60L)
      c.foreach(b.add(_))
      b.result()
    }
    val m1 = mergeAll(chunks)
    val m2 = mergeAll(chunks.reverse)
    val m3 = chunks.reduceLeft(merge)
    // identical sketches regardless of merge order/shape — the property
    // that makes reduce trees and collect_list orderings safe
    assert(m1.nodes.sameElements(m2.nodes) && m1.n === m2.n)
    qs.foreach(q => assertWithinBound(values, m1, q))
    // a pairwise reduce tree may compress earlier (never later) than the
    // flat union; both must honor the same bound
    qs.foreach(q => assertWithinBound(values, m3, q))
  }

  test("merge of disjoint ranges covers both sides") {
    val low = (0L until 1000L)
    val high = (100000L until 101000L)
    val bl = new Builder(16 + 1, 40L); low.foreach(bl.add(_))
    val bh = new Builder(16 + 1, 40L); high.foreach(bh.add(_))
    val sk = merge(bl.result(), bh.result())
    val all = (low ++ high)
    assert(sk.n === 2000L)
    qs.foreach(q => assertWithinBound(all, sk, q))
    // the median straddles the gap: rank 1000 is the last low value
    val med = quantile(sk, 500000L)
    assert(med < 100000L + rankErrorBound(sk) * 200,
      s"median $med far above the low cluster")
  }

  test("builder rejects out-of-domain values and bad params") {
    val b = new Builder(depth = 8, k = 10L)
    intercept[IllegalArgumentException](b.add(-1L))
    intercept[IllegalArgumentException](b.add(256L))
    intercept[IllegalArgumentException](new Builder(0, 10L))
    intercept[IllegalArgumentException](new Builder(51, 10L))
    intercept[IllegalArgumentException](
      merge(empty(8, 10L), empty(9, 10L)))
    intercept[IllegalArgumentException](quantile(empty(8, 10L), 500000L))
  }

  test("sketch face (DataFrame) matches a local builder's digest") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(5000)(rnd.nextLong(1L << 22))
    val df = values.toDF("v").repartition(7)
    val sk = QDigest.sketch(df, "v", depth = 22, k = 80L)
    assert(sk.n === 5000L)
    qs.foreach(q => assertWithinBound(values, sk, q))
    // nulls are excluded, SQL-aggregate style
    val withNulls = values.map(Option(_)).toDF("v")
      .union(Seq[Option[Long]](None, None).toDF("v"))
    assert(QDigest.sketch(withNulls, "v", 22, 80L).n === 5000L)
  }

  test("sketch-row store: batches merge to the bound, order irrelevant") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 6000).map(i =>
      (s"s${i % 2}", rnd.nextLong(1L << 20), i % 3))
    val df = rows.toDF("k", "v", "day")
    val batches = (0 to 2).map(b =>
      QDigest.sketchRowsByKey(df.filter(col("day") === b), "k", "v",
        depth = 20, k = 80L))
    // the store = the union of per-batch rows, in ANY order
    val store = batches(0).union(batches(1)).union(batches(2))
    val storeRev = batches(2).union(batches(0)).union(batches(1))
    def ests(s: org.apache.spark.sql.DataFrame) =
      QDigest.quantilesOfSketchRows(s, "k", Seq(250000L, 500000L, 900000L))
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3)))).toMap
    val a = ests(store)
    assert(a === ests(storeRev), "batch order changed the answers")
    Seq("s0", "s1").foreach { key =>
      val vs = rows.filter(_._1 == key).map(_._2)
      Seq(250000L, 500000L, 900000L).foreach { q =>
        val (est, n) = a((key, q))
        assert(n === vs.size.toLong)
        val target = math.max(1L, (q * n + 999999L) / 1000000L)
        val (lo, hi) = ranks(vs, est)
        val bound = 20L * n / 80L
        assert(hi >= target - bound && lo <= target + bound,
          s"$key q=$q est=$est rank=[$lo,$hi] target=$target")
      }
    }
  }

  test("quantilesByKey matches per-key local digests") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 6000).map { i =>
      val key = s"g${i % 3}"
      val v = key match {
        case "g0" => rnd.nextLong(1000L)
        case "g1" => 1000000L + rnd.nextLong(1000L)
        case _    => rnd.nextLong(1L << 21)
      }
      (key, v)
    }
    val df = rows.toDF("k", "v").repartition(5)
    val out = QDigest.quantilesByKey(df, "k", "v",
        depth = 21, k = 60L, qsPpm = Seq(250000L, 500000L, 750000L))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 9)
    Seq("g0", "g1", "g2").foreach { key =>
      val vs = rows.filter(_._1 == key).map(_._2)
      Seq(250000L, 500000L, 750000L).foreach { q =>
        val (est, n) = out((key, q))
        assert(n === vs.size.toLong)
        val target = math.max(1L, (q * n + 999999L) / 1000000L)
        val (lo, hi) = ranks(vs, est)
        val bound = 21L * n / 60L
        assert(hi >= target - bound && lo <= target + bound,
          s"$key q=$q est=$est rank=[$lo,$hi] target=$target")
      }
    }
    // group separation: g1's median sits in g1's band, not g0's
    assert(out(("g1", 500000L))._1 >= 1000000L)
    assert(out(("g0", 500000L))._1 < 2000L)
  }

  test("compactSketchStore: 1 row per key, identical answers, idempotent") {
    import spark.implicits._
    import graft.lake.{LakeLog, LakeTable}
    val rnd = new scala.util.Random(23)
    val rows = (0 until 3000).map(i =>
      (s"s${i % 3}", rnd.nextLong(1L << 20), i % 4))
    val df = rows.toDF("k", "v", "day")
    val log = new LakeLog(tmpDir("qsc"))
    (0 to 3).foreach { b =>
      val batch = QDigest.sketchRowsByKey(df.filter(col("day") === b),
        "k", "v", depth = 20, k = 80L)
      if (b == 0) LakeTable.createTable(log, "sk", batch.schema)
      LakeTable.insert(spark, log, "sk", batch, txnId = s"b$b")
    }
    def ests() = QDigest.quantilesOfSketchRows(
        LakeTable.read(spark, log, "sk"), "k",
        Seq(250000L, 500000L, 900000L))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val pre = ests()
    val vPre = log.latestVersion("sk")
    val (before, after) =
      QDigest.compactSketchStore(spark, log, "sk", "k", txnId = "opt1")
    assert(before == 12L && after == 3L) // 3 keys x 4 batches -> 1 each
    assert(log.latestVersion("sk") == vPre + 1, "one atomic commit")
    assert(ests() === pre, "compaction changed quantile answers")
    // replay under the same txn id: duplicate, no new version
    QDigest.compactSketchStore(spark, log, "sk", "k", txnId = "opt1")
    assert(log.latestVersion("sk") == vPre + 1)
    // a fresh compaction of an already-compact store is a no-op rewrite
    // with the same answers (still one row per key)
    val (b2, a2) = QDigest.compactSketchStore(spark, log, "sk", "k")
    assert(b2 == 3L && a2 == 3L && ests() === pre)
  }
}
