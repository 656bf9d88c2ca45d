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
}
