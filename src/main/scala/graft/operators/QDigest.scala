package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Q-digest mergeable quantile sketch — the fourth leg of the sketch
  * family beside [[Cms]] (point frequencies), [[HeavyHitters]]
  * (Misra–Gries top items) and [[Hll]] (distinct counts): approximate
  * quantiles/percentiles over an integer domain with a DETERMINISTIC
  * rank-error guarantee and lossless merges. Shrivastava, Buragohain,
  * Agrawal, Suri — "Medians and Beyond" (SenSys 2004); mergeability
  * without error accumulation per Agarwal et al., "Mergeable Summaries"
  * (PODS 2012). The reference engine has no quantile surface at all —
  * its aggregate set is count/sum/avg/min/max
  * (`pkg/coordinator/aggregate.go`); judged pipeline extension.
  *
  * Why a sketch instead of the exact sort: the exact percentile face
  * (q_percentile) global-sorts — a full-data exchange that is the
  * textbook non-starter at 100 TB. The q-digest collapses every
  * partition into ≤ 3k trie nodes BEFORE anything crosses the wire, so
  * the only movement is (#partitions × KB-sized sketches), and
  * per-group / per-day sketches union by node-count addition — the
  * property that lets a monitoring pipeline keep one running latency
  * digest per service and still answer "global p99 this week" exactly
  * within the ε bound.
  *
  * Why q-digest and not KLL/t-digest: those compress by RANDOM
  * sampling/merging — two runs give two answers, which this repo's
  * exact-oracle discipline (and any retried Spark task!) cannot accept.
  * The q-digest is fully deterministic: a binary trie over the value
  * domain [0, 2^depth), compressed bottom-up by the canonical rule
  * "merge a sibling pair into its parent iff cnt(left)+cnt(right)+
  * cnt(parent) ≤ ⌊n/k⌋". Same input multiset → same sketch, and
  * [[mergeAll]] (union counts, then one canonical compress over the
  * union) is ORDER-INSENSITIVE by construction, so reduce trees,
  * collect_list orderings and task retries can never change the answer.
  *
  * Guarantee: a quantile read off the compressed trie has rank error
  * ≤ ε·n with ε = depth/k (each of the ≤ depth ancestor levels can hide
  * at most ⌊n/k⌋ of the target's mass). All arithmetic is integer —
  * counts, ranks and the ε·n budget — so the gate queries' within-bound
  * flags are engine-portable.
  *
  * Scale shape: one pass, O(1) amortized LongMap work per row inside
  * `mapPartitions`, compress amortized by a 2× size trigger; the sketch
  * is ≤ 3k (node,count) pairs ≈ 48k·8 bytes at k=2000. No exchange
  * carries data rows: the global face reduces partition sketches, the
  * grouped face shuffles only (key, sketch) partials.
  */
object QDigest {

  /** A serialized digest: `nodes` is interleaved (packedNode, count)
    * sorted ascending by packedNode; packedNode = level<<56 | prefix.
    * Values live in [0, 2^depth); level 0 is the root, level==depth are
    * leaves. Product-encodable, so sketches cross exchanges as plain
    * struct rows — no kryo, no UDT. */
  final case class QSketch(depth: Int, k: Long, n: Long,
                           nodes: Array[Long])

  private val LevelShift = 56
  private val PrefixMask = (1L << LevelShift) - 1

  @inline private def pack(level: Int, prefix: Long): Long =
    (level.toLong << LevelShift) | prefix
  @inline private def levelOf(key: Long): Int = (key >>> LevelShift).toInt
  @inline private def prefixOf(key: Long): Long = key & PrefixMask

  private def checkParams(depth: Int, k: Long): Unit = {
    require(depth >= 1 && depth <= 50,
      s"qdigest depth=$depth out of [1,50]")
    require(k >= 1, s"qdigest k=$k must be >= 1")
  }

  /** Canonical bottom-up compression, in place. Deterministic and a pure
    * function of the count MULTISET (within-level merge decisions are
    * independent — a merge only ever mutates the PARENT level, which is
    * swept after the whole child level settles — so sweep order cannot
    * change the result). */
  private def compress(counts: mutable.LongMap[Long], n: Long,
                       depth: Int, k: Long): Unit = {
    val t = n / k
    if (t <= 0L) return
    // bucket keys by level; parents created mid-sweep join their bucket
    val byLevel = Array.fill(depth + 1)(new mutable.ArrayBuffer[Long]())
    counts.foreachKey(key => byLevel(levelOf(key)) += key)
    var lvl = depth
    while (lvl >= 1) {
      val bucket = byLevel(lvl)
      var i = 0
      while (i < bucket.length) {
        val key = bucket(i)
        if (counts.contains(key)) { // may have been absorbed as a sibling
          val p = prefixOf(key)
          val leftK = pack(lvl, p & ~1L)
          val rightK = pack(lvl, p | 1L)
          val parentK = pack(lvl - 1, p >>> 1)
          val cl = counts.getOrElse(leftK, 0L)
          val cr = counts.getOrElse(rightK, 0L)
          val cp = counts.getOrElse(parentK, 0L)
          if (cl + cr + cp <= t) {
            if (cp == 0L) byLevel(lvl - 1) += parentK
            counts.update(parentK, cl + cr + cp)
            counts.remove(leftK)
            counts.remove(rightK)
          }
        }
        i += 1
      }
      lvl -= 1
    }
  }

  private def toSketch(counts: mutable.LongMap[Long], n: Long,
                       depth: Int, k: Long): QSketch = {
    compress(counts, n, depth, k)
    val keys = new Array[Long](counts.size)
    var i = 0
    counts.foreachKey { key => keys(i) = key; i += 1 }
    java.util.Arrays.sort(keys)
    val out = new Array[Long](keys.length * 2)
    i = 0
    while (i < keys.length) {
      out(2 * i) = keys(i)
      out(2 * i + 1) = counts(keys(i))
      i += 1
    }
    QSketch(depth, k, n, out)
  }

  /** Streaming builder: O(1) LongMap add per value, compress amortized
    * by a 2×-of-steady-state size trigger (post-compress size ≤ 3k). */
  final class Builder(val depth: Int, val k: Long) {
    checkParams(depth, k)
    private val counts = new mutable.LongMap[Long](1 << 10)
    private var n = 0L
    private val trigger = math.max(6L * k, 4096L)
    private val maxValue = (1L << depth) - 1

    def add(v: Long): Unit = add(v, 1L)

    def add(v: Long, c: Long): Unit = {
      require(v >= 0 && v <= maxValue,
        s"qdigest value $v outside [0, 2^$depth)")
      require(c > 0, s"qdigest count $c must be positive")
      val key = pack(depth, v)
      counts.update(key, counts.getOrElse(key, 0L) + c)
      n += c
      if (counts.size > trigger) compress(counts, n, depth, k)
    }

    def result(): QSketch = toSketch(counts, n, depth, k)
  }

  def empty(depth: Int, k: Long): QSketch = {
    checkParams(depth, k)
    QSketch(depth, k, 0L, Array.empty)
  }

  /** Union-then-canonical-compress merge: counts add node-wise across
    * ALL inputs, then ONE compress runs over the union with the summed
    * n — a pure function of the input multiset union, so any merge
    * order (pairwise reduce tree, collect_list in any order) yields the
    * IDENTICAL sketch, and the ε = depth/k bound holds with no
    * error accumulation across merges (Agarwal et al. 2012). */
  def mergeAll(sks: Seq[QSketch]): QSketch = {
    require(sks.nonEmpty, "mergeAll of no sketches")
    // singleton merge is the IDENTITY: the input is already canonical,
    // and the bottom-up compress — a pure function of the union, which
    // is what makes k≥2 merges order-insensitive — is NOT a fixpoint
    // (merges at coarser levels relocate parent mass upward, enabling
    // finer-level merges only a second pass would see). Re-compressing
    // a lone sketch would therefore CHANGE its answers (within ε, but
    // changed) — and the identity law is exactly what makes sketch-store
    // compaction provably answer-preserving: reading the one compacted
    // row returns the same digest the pre-compaction read merged to.
    if (sks.size == 1) return sks.head
    val depth = sks.head.depth
    val k = sks.head.k
    require(sks.forall(s => s.depth == depth && s.k == k),
      "cannot merge q-digests with different depth/k")
    val counts = new mutable.LongMap[Long](1 << 10)
    var n = 0L
    sks.foreach { s =>
      n += s.n
      val a = s.nodes
      var i = 0
      while (i < a.length) {
        counts.update(a(i), counts.getOrElse(a(i), 0L) + a(i + 1))
        i += 2
      }
    }
    toSketch(counts, n, depth, k)
  }

  def merge(a: QSketch, b: QSketch): QSketch = mergeAll(Seq(a, b))

  /** The quantile read: nodes sorted by (range max asc, smaller range
    * first), counts accumulated until the target rank
    * r = ⌈q·n⌉ is covered; the covering node's max value is the
    * estimate. Rank error ≤ ⌊depth·n/k⌋. */
  def quantile(sk: QSketch, qPpm: Long): Long = {
    require(qPpm >= 0 && qPpm <= 1000000L, s"qPpm=$qPpm out of [0,1e6]")
    require(sk.n > 0, "quantile of an empty q-digest")
    val target = math.max(1L, (qPpm * sk.n + 999999L) / 1000000L)
    val m = sk.nodes.length / 2
    // sort key: (hi << 6 | span) — hi < 2^depth ≤ 2^50 so 6 low bits
    // hold the span (depth-level ≤ 50 needs 6 bits) without collision
    val order = new Array[Long](m)
    var i = 0
    while (i < m) {
      val key = sk.nodes(2 * i)
      val lvl = levelOf(key)
      val span = sk.depth - lvl
      val hi = ((prefixOf(key) + 1L) << span) - 1L
      order(i) = (hi << 6) | span.toLong
      i += 1
    }
    // pair order entries back to counts via an index sort
    val idx = (0 until m).sortBy(order(_))
    var cum = 0L
    var j = 0
    while (j < idx.length) {
      cum += sk.nodes(2 * idx(j) + 1)
      if (cum >= target) return order(idx(j)) >>> 6
      j += 1
    }
    order(idx.last) >>> 6
  }

  /** The guaranteed rank-error budget for this sketch: ⌊depth·n/k⌋. */
  def rankErrorBound(sk: QSketch): Long = sk.depth * sk.n / sk.k

  /** Global sketch of a long column: per-partition builders (the only
    * per-row work, no exchange), then one driver-side merge over
    * KB-sized partials (#partitions × ≤3k nodes — metadata-sized at any
    * corpus size, the Anonymize two-longs-per-step discipline). Nulls
    * are excluded, SQL-aggregate style. */
  def sketch(df: DataFrame, valueCol: String, depth: Int, k: Long)
      : QSketch = {
    checkParams(depth, k)
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull).as[Long]
    val partials: Dataset[QSketch] = vals.mapPartitions { it =>
      val b = new Builder(depth, k)
      it.foreach(b.add(_))
      Iterator.single(b.result())
    }
    val parts = partials.collect()
    if (parts.isEmpty) empty(depth, k) else mergeAll(parts.toSeq)
  }

  /** One FULLY-MERGED sketch row per key: (key, qd_depth, qd_k, qd_n,
    * qd_nodes). The batch face of the mergeable sketch STORE: append
    * each day's/batch's rows to a lake table and
    * [[quantilesOfSketchRows]] answers "p99 this week per service"
    * from KB-sized rows — the raw values were never retained. Merges
    * are order-insensitive, so batches may land (and replay) in any
    * order without changing the answer. */
  def sketchRowsByKey(df: DataFrame, keyCol: String, valueCol: String,
                      depth: Int, k: Long): DataFrame = {
    checkParams(depth, k)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("long").as("v"))
      .filter(col("k").isNotNull && col("v").isNotNull)
      .as[(String, Long)]
    rows.mapPartitions { it =>
        val bs = new mutable.HashMap[String, Builder]
        it.foreach { case (key, v) =>
          bs.getOrElseUpdate(key, new Builder(depth, k)).add(v)
        }
        bs.iterator.map { case (key, b) => (key, b.result()) }
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val sk = mergeAll(it.map(_._2).toSeq)
        (key, sk.depth, sk.k, sk.n, sk.nodes)
      }
      .toDF(keyCol, "qd_depth", "qd_k", "qd_n", "qd_nodes")
  }

  /** Quantiles over a sketch-ROW table (any number of batches per key,
    * e.g. a lake table appended to per day): per-key union of node
    * counts + one canonical compress — the same order-insensitive merge
    * as everywhere else — then the requested quantiles. Output matches
    * [[quantilesByKey]]: (key, q_ppm, qd_est, qd_n). */
  def quantilesOfSketchRows(df: DataFrame, keyCol: String,
                            qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty, "quantilesOfSketchRows with no quantiles")
    val spark = df.sparkSession
    import spark.implicits._
    val qs = qsPpm.toArray
    df.select(col(keyCol).cast("string"), col("qd_depth"), col("qd_k"),
        col("qd_n"), col("qd_nodes"))
      .as[(String, Int, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val sk = mergeAll(it.map(r => QSketch(r._2, r._3, r._4, r._5)).toSeq)
        qs.iterator.map(q => (key, q, quantile(sk, q), sk.n))
      }
      .toDF(keyCol, "q_ppm", "qd_est", "qd_n")
  }

  /** OPTIMIZE verb for a sketch-store lake table ([[sketchRowsByKey]]
    * rows appended per batch): merge each key's digest rows into exactly
    * ONE row and land adds+removes as one atomic OCC overwrite commit —
    * the read-side merge is order-insensitive, so the compacted table
    * provably answers every [[quantilesOfSketchRows]] query identically
    * (pinned by q_quantile_store_compact's pre/post hash equality). This
    * is the maintenance path an append-forever store needs: without it a
    * daily-batch store reads O(days × keys) rows per query; after it,
    * O(keys) — and the commit is idempotent under `txnId` replay like
    * every other lake write. Returns (rows before, rows after). */
  def compactSketchStore(spark: SparkSession, log: graft.lake.LakeLog,
                         table: String, keyCol: String,
                         txnId: String = null): (Long, Long) = {
    import spark.implicits._
    import graft.lake.LakeTable
    val cur = LakeTable.read(spark, log, table)
    val before = cur.count()
    val merged = cur.select(col(keyCol).cast("string"), col("qd_depth"),
        col("qd_k"), col("qd_n"), col("qd_nodes"))
      .as[(String, Int, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val sk = mergeAll(it.map(r => QSketch(r._2, r._3, r._4, r._5)).toSeq)
        (key, sk.depth, sk.k, sk.n, sk.nodes)
      }
      .toDF(keyCol, "qd_depth", "qd_k", "qd_n", "qd_nodes")
    val id = if (txnId != null) txnId
      else s"qdigest-compact-${java.util.UUID.randomUUID()}"
    LakeTable.overwrite(spark, log, table, merged, txnId = id)
    (before, LakeTable.read(spark, log, table).count())
  }

  /** Grouped quantiles: per-partition per-key builders → one exchange of
    * (key, sketch) partials → order-insensitive mergeAll per key → the
    * requested quantiles. Output: (key, q_ppm, qd_est, qd_n) — one row
    * per (key, q). The key crosses as a string (the caller casts back);
    * data rows never cross the wire. */
  def quantilesByKey(df: DataFrame, keyCol: String, valueCol: String,
                     depth: Int, k: Long, qsPpm: Seq[Long]): DataFrame = {
    checkParams(depth, k)
    require(qsPpm.nonEmpty, "quantilesByKey with no quantiles")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("long").as("v"))
      .filter(col("k").isNotNull && col("v").isNotNull)
      .as[(String, Long)]
    val partials = rows.mapPartitions { it =>
      val bs = new mutable.HashMap[String, Builder]
      it.foreach { case (key, v) =>
        bs.getOrElseUpdate(key, new Builder(depth, k)).add(v)
      }
      bs.iterator.map { case (key, b) => (key, b.result()) }
    }
    val qs = qsPpm.toArray
    partials.groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val sk = mergeAll(it.map(_._2).toSeq)
        qs.iterator.map(q => (key, q, quantile(sk, q), sk.n))
      }
      .toDF(keyCol, "q_ppm", "qd_est", "qd_n")
  }
}
