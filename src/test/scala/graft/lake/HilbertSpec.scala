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
