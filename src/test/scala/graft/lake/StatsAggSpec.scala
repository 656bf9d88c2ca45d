package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Metadata-only aggregates: stats answers must EQUAL scan answers wherever
  * the stats path claims availability, fall back (return None) whenever any
  * soundness rule fails, and survive zero data bytes on disk.
  */
class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(log: LakeLog, table: String): Unit = {
    LakeTable.createTable(log, table, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType),
      StructField("s", StringType))))
    // two files; v is null for every third row, s never null
    (0 until 2).foreach { i =>
      val rows = (0 until 50).map { j =>
        val id = (i * 50 + j).toLong
        (id, if (id % 3 == 0) None else Some(id * 1.5), s"s-$id")
      }
      LakeTable.insert(spark, log, table, rows.toDF("id", "v", "s"))
    }
  }

  test("stats answers equal scan answers, including null counts") {
    val log = new LakeLog(tmpDir("statsagg"))
    mkTable(log, "t")
    val res = StatsAgg.fromStats(spark, log.snapshot("t"), Seq("id", "v"))
    assert(res.isDefined, "fully-statted table must answer from metadata")
    val r = res.get.collect().head
    val expect = LakeTable.read(spark, log, "t").agg(
      count(lit(1)), count(col("id")), min("id"), max("id"),
      count(col("v")), min("v"), max("v")).collect().head
    assert(r.getAs[Long]("n_rows") == expect.getLong(0))
    assert(r.getAs[Long]("cnt_id") == expect.getLong(1))
    assert(r.getAs[Long]("min_id") == expect.getLong(2))
    assert(r.getAs[Long]("max_id") == expect.getLong(3))
    assert(r.getAs[Long]("cnt_v") == expect.getLong(4))
    assert(r.getAs[Double]("min_v") == expect.getDouble(5))
    assert(r.getAs[Double]("max_v") == expect.getDouble(6))
  }

  test("answers survive physical data deletion (zero I/O witness)") {
    val log = new LakeLog(tmpDir("statsagg"))
    mkTable(log, "t")
    val before = StatsAgg.aggregate(spark, log, "t", Seq("v")).collect().head
    log.snapshot("t").files.foreach(f =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val after = StatsAgg.aggregate(spark, log, "t", Seq("v")).collect().head
    assert(before == after)
  }

  test("string min/max falls back (truncation makes stats bounds)") {
    val log = new LakeLog(tmpDir("statsagg"))
    mkTable(log, "t")
    assert(StatsAgg.fromStats(spark, log.snapshot("t"), Seq("s")).isEmpty)
    // the fallback path still answers, by scanning
    val r = StatsAgg.aggregate(spark, log, "t", Seq("s")).collect().head
    assert(r.getAs[String]("min_s") == "s-0" &&
      r.getAs[Long]("cnt_s") == 100L)
  }

  test("missing null counts (pre-upgrade log entries) fall back") {
    val log = new LakeLog(tmpDir("statsagg"))
    mkTable(log, "t")
    val snap = log.snapshot("t")
    val stripped = snap.copy(files = snap.files.map(f =>
      f.copy(stats = f.stats.map(_.copy(null_counts = None)))))
    assert(StatsAgg.fromStats(spark, stripped, Seq("v")).isEmpty)
    // COUNT(*) alone needs no per-column stats at all
    val starOnly = StatsAgg.fromStats(spark, stripped, Nil)
    assert(starOnly.isDefined &&
      starOnly.get.collect().head.getAs[Long]("n_rows") == 100L)
  }

  test("all-null column in one file is proven by null counts, not a bound") {
    val log = new LakeLog(tmpDir("statsagg"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType))))
    LakeTable.insert(spark, log, "t",
      Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v"))
    LakeTable.insert(spark, log, "t",
      Seq((3L, Some(7.5)), (4L, Some(2.5))).toDF("id", "v"))
    val r = StatsAgg.fromStats(spark, log.snapshot("t"), Seq("v"))
    assert(r.isDefined)
    val row = r.get.collect().head
    assert(row.getAs[Long]("cnt_v") == 2L &&
      row.getAs[Double]("min_v") == 2.5 && row.getAs[Double]("max_v") == 7.5)
  }

  test("empty table: zero count, null extremes") {
    val log = new LakeLog(tmpDir("statsagg"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val row = StatsAgg.fromStats(spark, log.snapshot("t"), Seq("id"))
      .get.collect().head
    assert(row.getAs[Long]("n_rows") == 0L && row.getAs[Long]("cnt_id") == 0L
      && row.isNullAt(row.fieldIndex("min_id")))
  }

  test("per-partition grouping merges multi-file partitions exactly") {
    val log = new LakeLog(tmpDir("statsagg"))
    LakeTable.createTable(log, "t", StructType(Seq(
      StructField("part", StringType, nullable = false),
      StructField("id", LongType, nullable = false))),
      partitionBy = Seq("part"))
    // two inserts → ≥2 files per partition
    (0 until 2).foreach(i => LakeTable.insert(spark, log, "t",
      (0 until 30).map(j => (s"p${j % 3}", (i * 30 + j).toLong))
        .toDF("part", "id")))
    val got = StatsAgg.fromStatsByPartition(spark, log.snapshot("t"),
      Seq("id"))
    assert(got.isDefined)
    val expect = LakeTable.read(spark, log, "t").groupBy("part")
      .agg(count(lit(1)).as("n_rows"), count(col("id")).as("cnt_id"),
        min("id").as("min_id"), max("id").as("max_id"))
      .orderBy("part").collect().toSeq
    assert(got.get.orderBy("part").collect().toSeq == expect)
    // a non-partitioned table has no partition grouping to answer
    LakeTable.createTable(log, "flat", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    assert(StatsAgg.fromStatsByPartition(spark, log.snapshot("flat"),
      Seq("id")).isEmpty)
  }

  test("copy-on-write delete keeps stats answers exact") {
    val log = new LakeLog(tmpDir("statsagg"))
    mkTable(log, "t")
    LakeTable.deleteWhere(spark, log, "t", "id > 80")
    val r = StatsAgg.fromStats(spark, log.snapshot("t"), Seq("id"))
      .get.collect().head
    assert(r.getAs[Long]("n_rows") == 81L && r.getAs[Long]("max_id") == 80L)
  }

  test("file with min but no max witness falls back (asymmetry guard)") {
    val log = new LakeLog(tmpDir("statsagg"))
    mkTable(log, "t")
    val snap = log.snapshot("t")
    // strip ONLY the max stat for v from one file that has non-null rows:
    // its contribution would silently vanish from the MAX answer
    val crippled = snap.copy(files = snap.files.zipWithIndex.map {
      case (f, 0) => f.copy(stats = f.stats.map(st =>
        st.copy(max_values = st.max_values - "v")))
      case (f, _) => f
    })
    assert(StatsAgg.fromStats(spark, crippled, Seq("v")).isEmpty,
      "min-present/max-absent must fall back, not drop the file's max")
    // symmetric case: max present, min absent (already guarded)
    val crippled2 = snap.copy(files = snap.files.zipWithIndex.map {
      case (f, 0) => f.copy(stats = f.stats.map(st =>
        st.copy(min_values = st.min_values - "v")))
      case (f, _) => f
    })
    assert(StatsAgg.fromStats(spark, crippled2, Seq("v")).isEmpty)
  }
}
