package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CHECK-constraint enforcement on lake writes. */
class LakeConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("qty", DoubleType),
    StructField("cat", StringType)))

  private def freshLog(): LakeLog = new LakeLog(tmpDir("constraints"))

  test("violating insert is rejected atomically: no commit, no files") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema, constraints = Map(
      "qty_positive" -> "qty > 0",
      "cat_known" -> "cat IN ('a','b')"))
    val bad = Seq((1L, 2.0, "a"), (2L, -1.0, "z")).toDF("id", "qty", "cat")
    val e = intercept[LakeValidationException] {
      LakeTable.insert(spark, log, "t", bad)
    }
    assert(e.getMessage.contains("qty_positive") &&
      e.getMessage.contains("cat_known"))
    assert(log.latestVersion("t") == 0)
    assert(LakeTable.read(spark, log, "t").count() == 0)
  }

  test("valid insert commits; NULL predicate passes per SQL CHECK") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema, constraints = Map(
      "qty_positive" -> "qty > 0"))
    // NULL qty → predicate UNKNOWN → row is admitted (SQL CHECK semantics)
    val ok = Seq((1L, Some(2.0), "a"), (2L, None, "b"))
      .toDF("id", "qty", "cat")
    LakeTable.insert(spark, log, "t", ok)
    assert(LakeTable.read(spark, log, "t").count() == 2)
  }

  test("upsert's new rows are validated; rewrites of admitted rows are not") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema, constraints = Map(
      "qty_positive" -> "qty > 0"))
    LakeTable.insert(spark, log, "t",
      Seq((1L, 1.0, "a"), (2L, 2.0, "a")).toDF("id", "qty", "cat"))
    intercept[LakeValidationException] {
      LakeTable.upsert(spark, log, "t",
        Seq((2L, -5.0, "a")).toDF("id", "qty", "cat"), keyCol = "id")
    }
    // table unchanged by the rejected upsert
    assert(LakeTable.read(spark, log, "t")
      .agg(sum("qty")).head().getDouble(0) == 3.0)
    LakeTable.upsert(spark, log, "t",
      Seq((2L, 5.0, "a")).toDF("id", "qty", "cat"), keyCol = "id")
    assert(LakeTable.read(spark, log, "t")
      .agg(sum("qty")).head().getDouble(0) == 6.0)
  }

  test("constraints survive the log round-trip and old logs read as none") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema, constraints = Map(
      "qty_positive" -> "qty > 0"))
    assert(log.snapshot("t").schema.get.checks ==
      Map("qty_positive" -> "qty > 0"))
    assert(LakeTable.describe(log, "t").constraints ==
      Map("qty_positive" -> "qty > 0"))
    LakeTable.createTable(log, "plain", schema)
    assert(log.snapshot("plain").schema.get.checks.isEmpty)
    assert(LakeTable.describe(log, "plain").constraints.isEmpty)
  }

  test("a constraint referencing a missing column fails the write, not silently") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema, constraints = Map(
      "broken" -> "no_such_col > 0"))
    assertThrows[Exception] {
      LakeTable.insert(spark, log, "t",
        Seq((1L, 1.0, "a")).toDF("id", "qty", "cat"))
    }
    assert(log.latestVersion("t") == 0)
  }

  test("ADD CONSTRAINT validates existing rows; DROP re-opens the gate") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema)
    LakeTable.insert(spark, log, "t",
      (1 to 10).map(i => (i.toLong, i.toDouble, "a")).toDF("id", "qty", "cat"))
    // a predicate 3 existing rows violate → rejected with the count
    val e = intercept[LakeValidationException] {
      LakeTable.addConstraint(spark, log, "t", "small", "qty <= 7")
    }
    assert(e.getMessage.contains("3 existing rows"))
    assert(log.snapshot("t").schema.get.checks.isEmpty)
    // a satisfiable one installs and gates subsequent writes
    LakeTable.addConstraint(spark, log, "t", "cap", "qty <= 100")
    intercept[LakeValidationException] {
      LakeTable.insert(spark, log, "t",
        Seq((99L, 500.0, "z")).toDF("id", "qty", "cat"))
    }
    // duplicate name refused; unknown drop refused
    intercept[LakeValidationException] {
      LakeTable.addConstraint(spark, log, "t", "cap", "qty <= 1000")
    }
    intercept[LakeValidationException] {
      LakeTable.dropConstraint(log, "t", "nope")
    }
    // drop re-opens
    LakeTable.dropConstraint(log, "t", "cap")
    LakeTable.insert(spark, log, "t",
      Seq((99L, 500.0, "z")).toDF("id", "qty", "cat"))
    assert(LakeTable.read(spark, log, "t").count() == 11)
    // idempotent txn replay of the metadata commit
    val r1 = LakeTable.addConstraint(spark, log, "t", "again", "qty > 0",
      txnId = "tx-ck")
    val r2 = LakeTable.addConstraint(spark, log, "t", "again2", "qty > -1",
      txnId = "tx-ck")
    assert(r2.duplicate && r2.version == r1.version)
    assert(log.snapshot("t").schema.get.checks.keySet == Set("again"))
  }

  test("ANALYZE persists exact ndv/nulls/min/max; DESCRIBE STATS serves it") {
    val log = freshLog()
    LakeTable.createTable(log, "t", schema)
    LakeTable.insert(spark, log, "t",
      (Seq((1L, 2.5, "a"), (2L, 2.5, "b"), (3L, 4.0, null.asInstanceOf[String])))
        .toDF("id", "qty", "cat"))
    LakeTable.analyze(spark, log, "t")
    val stats = log.snapshot("t").schema.get.tableStats
    assert(stats("__table")("row_count") == "3")
    assert(stats("id")("ndv") == "3" && stats("qty")("ndv") == "2")
    assert(stats("cat")("ndv") == "2" && stats("cat")("nulls") == "1")
    assert(stats("qty")("min") == "2.5" && stats("qty")("max") == "4.0")
    val desc = LakeTable.statsTable(spark, log, "t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(desc == Map("__table" -> 3L, "id" -> 3L, "qty" -> 2L,
      "cat" -> 2L))
    // re-analyze after a write refreshes (row count moves)
    LakeTable.insert(spark, log, "t",
      Seq((4L, 9.0, "d")).toDF("id", "qty", "cat"))
    LakeTable.analyze(spark, log, "t", Seq("id"))
    val again = log.snapshot("t").schema.get.tableStats
    assert(again("__table")("row_count") == "4" && again("id")("ndv") == "4")
    // unknown column refused
    intercept[LakeValidationException] {
      LakeTable.analyze(spark, log, "t", Seq("nope"))
    }
  }
}
