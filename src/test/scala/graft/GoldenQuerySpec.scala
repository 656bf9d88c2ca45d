package graft

import graft.api.{QueryApi, SqlApi}
import graft.lake.{LakeLog, LakeTable}
import org.apache.spark.sql.types._

/** The reference's de-facto acceptance test
  * (`tests/integration/golden_query_test.go:16-240`) run for REAL: the
  * reference serves this SQL from a mocked endpoint with canned rows
  * (`rest_api.go:709-734`); here the identical table, rows, SQL and
  * expected values execute through the full stack — LakeLog create/insert,
  * snapshot SQL, structured API — with the exact documented answers.
  */
class GoldenQuerySpec extends SparkSpec {
  import spark.implicits._

  private val goldenRows = Seq(
    (1L, "Electronics", "Laptop", 1000.00, 2L, "2024-01-01"),
    (2L, "Electronics", "Mouse", 25.00, 5L, "2024-01-01"),
    (3L, "Electronics", "Keyboard", 75.00, 3L, "2024-01-02"),
    (4L, "Electronics", "Monitor", 300.00, 1L, "2024-01-02"),
    (5L, "Furniture", "Chair", 150.00, 4L, "2024-01-03"),
    (6L, "Furniture", "Desk", 400.00, 2L, "2024-01-03"),
    (7L, "Furniture", "Lamp", 50.00, 6L, "2024-01-04"),
    (8L, "Books", "Novel", 15.00, 10L, "2024-01-05"),
    (9L, "Books", "Textbook", 80.00, 3L, "2024-01-05"))

  test("golden query end-to-end: create, insert, SQL, snapshot isolation") {
    val log = new LakeLog(tmpDir("golden"))
    // schema exactly as golden_query_test.go:60-69 (6 fields, date-as-string)
    LakeTable.createTable(log, "golden_test_table", StructType(Seq(
      StructField("id", LongType),
      StructField("category", StringType),
      StructField("product", StringType),
      StructField("price", DoubleType),
      StructField("quantity", LongType),
      StructField("date", StringType))))
    LakeTable.insert(spark, log, "golden_test_table",
      goldenRows.toDF("id", "category", "product", "price", "quantity", "date"))

    // COUNT(*) sanity (the reference's insert verification)
    assert(LakeTable.read(spark, log, "golden_test_table").count() == 9)

    // the golden SQL, verbatim shape
    val results = SqlApi.queryLake(spark, log, """
        SELECT category,
               COUNT(*) as item_count,
               SUM(price * quantity) as total_revenue,
               AVG(price) as avg_price
        FROM golden_test_table
        GROUP BY category
        ORDER BY category""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))

    // expected values from golden_query_test.go:147-166
    assert(results.toSeq == Seq(
      ("Books", 2L, 390.0, 47.5),
      ("Electronics", 4L, 2650.0, 350.0),
      ("Furniture", 3L, 1700.0, 200.0)))

    // snapshot isolation: re-query ×3 with concurrent-ish commits between
    val v1 = log.latestVersion("golden_test_table")
    (1 to 3).foreach { i =>
      LakeTable.insert(spark, log, "golden_test_table",
        Seq((100L + i, "Noise", "X", 1.0, 1L, "2024-02-01"))
          .toDF("id", "category", "product", "price", "quantity", "date"))
      // version-pinned structured query sees only the original 9 rows
      val pinned = QueryApi.runLake(spark, log, s"""
        {"table_name": "golden_test_table", "version": $v1,
         "group_by": ["category"],
         "aggregates": [{"function": "count", "column": "*",
                         "alias": "item_count"}]}""")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(pinned == Seq(("Books", 2L), ("Electronics", 4L),
        ("Furniture", 3L)))
    }
  }
}
