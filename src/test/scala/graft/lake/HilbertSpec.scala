package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HilbertExpressions

/** Hilbert clustering: the curve transform's defining properties
  * (bijectivity, unit-step adjacency — which Morton provably lacks),
  * the hand-derived base case, and lake-layout pruning on both curve
  * columns with a box-query comparison against Morton.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def curve(bits: Int): Seq[(Long, Long, Long)] = {
    HilbertExpressions.register(spark)
    val n = 1 << bits
    (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertExpressions.hilbert2d(col("x"), col("y"), bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("base case (bits=1) matches the hand-derived quadrant order") {
    val m = curve(1).map { case (x, y, d) => (x, y) -> d }.toMap
    assert(m == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("bijective and unit-step adjacent at bits=4 (Morton is not)") {
    val bits = 4
    val cells = curve(bits)
    val n = 1L << bits
    // bijection onto [0, 4^bits)
    assert(cells.map(_._3).sorted == (0L until n * n).toSeq)
    // THE Hilbert property: consecutive curve positions are Manhattan-
    // distance-1 neighbors — no diagonal jumps, which is why per-file
    // bounding boxes come out tighter than Morton's
    val byD = cells.map { case (x, y, d) => d -> (x, y) }.toMap
    (0L until n * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // contrast: Morton interleave DOES jump (e.g. 3=(1,1) -> 4=(0,2) at
    // 2 bits is distance 2) — pin that the property separates the curves
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(j => (((x >> j) & 1L) << (2 * j)) |
        (((y >> j) & 1L) << (2 * j + 1))).reduce(_ | _)
    val mByD = cells.map { case (x, y, _) => morton(x, y) -> (x, y) }.toMap
    val mortonAdjacent = (0L until n * n - 1).forall { d =>
      val (x1, y1) = mByD(d); val (x2, y2) = mByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(!mortonAdjacent)
  }

  test("n-D (Skilling) transform: bijective and unit-step adjacent") {
    HilbertExpressions.register(spark)
    for ((n, bits) <- Seq((3, 3), (4, 2))) {
      val side = 1 << bits
      val total = 1L << (n * bits)
      val coords = (0 until n).map(i => col(s"x$i"))
      val grid = (0L until total).map { v =>
        (0 until n).map(i => (v >> (i * bits)) & (side - 1))
      }.map(xs => org.apache.spark.sql.Row.fromSeq(xs))
      val schema = org.apache.spark.sql.types.StructType(
        (0 until n).map(i => org.apache.spark.sql.types.StructField(
          s"x$i", org.apache.spark.sql.types.LongType)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(grid).asJava), schema)
      val cells = df.select((coords :+
          HilbertExpressions.hilbertNd(coords, bits).as("d")): _*)
        .collect()
        .map(r => (0 until n).map(r.getLong).toVector -> r.getLong(n))
      // bijection onto [0, side^n)
      assert(cells.map(_._2).sorted.toSeq == (0L until total).toSeq,
        s"n=$n bits=$bits not bijective")
      // unit-step adjacency — fails for ANY mis-wired bit
      val byD = cells.map(_.swap).toMap
      (0L until total - 1).foreach { d =>
        val dist = byD(d).zip(byD(d + 1))
          .map { case (a, b) => math.abs(a - b) }.sum
        assert(dist == 1, s"n=$n jump at d=$d: ${byD(d)} -> ${byD(d + 1)}")
      }
    }
  }

  test("doGenCode compiles: no silent interpreted fallback") {
    // with fallback disabled a codegen bug throws instead of silently
    // degrading to eval(); covers both the 2-D and the n-D expression
    HilbertExpressions.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(64).select(
        (col("id") % 8).as("x"), (col("id") / 8).cast("long").as("y"),
        (col("id") % 4).as("z"))
      assert(df.select(HilbertExpressions.hilbert2d(col("x"), col("y"), 3))
        .collect().length == 64)
      assert(df.select(HilbertExpressions.hilbertNd(
          Seq(col("x"), col("y"), col("z")), 3))
        .collect().length == 64)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("hilbert lake clustering prunes on both columns; box reads <= morton") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }
        .map(_.metrics("numFiles").value).sum
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("category",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("price",
        org.apache.spark.sql.types.DoubleType)))
    val rnd = new scala.util.Random(23)
    val data = (1 to 20000).map(_ =>
      (rnd.nextInt(10000).toLong, s"c${rnd.nextInt(3)}",
        rnd.nextInt(10000) / 10.0)).toDF("id", "category", "price")

    def build(curveName: String) = {
      val log = new LakeLog(tmpDir(s"hilb-$curveName"))
      LakeTable.createTable(log, "t", schema)
      LakeTable.insert(spark, log, "t", data, numFiles = 16,
        zOrderBy = Seq("id", "price"), curve = curveName)
      LakeTable.readIndexed(spark, log, "t")
    }
    val h = build("hilbert")
    val m = build("morton")

    // slices on EITHER column prune under hilbert too
    assert(scannedFiles(
      h.filter(col("id") >= 1000 && col("id") < 2000)) <= 8)
    assert(scannedFiles(
      h.filter(col("price") >= 100.0 && col("price") < 200.0)) <= 8)

    // 2-D box queries: hilbert's tighter per-file boxes read no more
    // files than morton's across a sweep of box positions (and strictly
    // fewer in total)
    val boxes = Seq((0, 2500, 0.0, 250.0), (2500, 5000, 250.0, 500.0),
      (5000, 7500, 500.0, 750.0), (7500, 10000, 750.0, 1000.0),
      (1000, 4000, 600.0, 900.0), (6000, 9000, 100.0, 400.0))
    val (hTot, mTot) = boxes.map { case (lo, hi, plo, phi) =>
      val pred = (df: org.apache.spark.sql.DataFrame) =>
        df.filter(col("id") >= lo && col("id") < hi &&
          col("price") >= plo && col("price") < phi)
      val (hf, mf) = (scannedFiles(pred(h)), scannedFiles(pred(m)))
      // correctness of every pruned read
      assert(pred(h).count() == pred(m).count())
      (hf, mf)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(hTot <= mTot, s"hilbert scanned $hTot files vs morton $mTot")
  }
}
