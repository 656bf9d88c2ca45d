package graft.api

import graft.SparkSpec
import graft.lake.{LakeLog, LakeTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QueryApiSpec extends SparkSpec {
  import spark.implicits._

  test("parse: full QueryAPIRequest shape incl aliases and omitted fields") {
    val req = QueryApi.parse("""
      {"table_name": "sales", "filter": "price > 100",
       "group_by": ["region"],
       "aggregates": [{"function": "count", "column": "*"},
                      {"function": "sum", "column": "price", "alias": "rev"}],
       "version": 3}""")
    assert(req.table_name == "sales" && req.filter.contains("price > 100"))
    assert(req.group_by == Seq("region"))
    assert(req.aggregates == Seq(QueryApi.AggregateApi("count", "*"),
      QueryApi.AggregateApi("sum", "price", Some("rev"))))
    assert(req.version == 3 && req.projection.isEmpty)
    val minimal = QueryApi.parse("""{"table_name": "t"}""")
    assert(minimal == QueryApi.QueryApiRequest("t"))
  }

  test("runLake executes a JSON query snapshot-pinned to a version") {
    val log = new LakeLog(tmpDir("queryapi"))
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("region", StringType), StructField("price", DoubleType)))
    LakeTable.createTable(log, "sales", schema)
    LakeTable.insert(spark, log, "sales",
      Seq((1L, "east", 50.0), (2L, "west", 150.0)).toDF("id", "region", "price"))
    LakeTable.insert(spark, log, "sales",
      Seq((3L, "east", 300.0)).toDF("id", "region", "price"))

    val json = """
      {"table_name": "sales", "filter": "price > 100",
       "group_by": ["region"],
       "aggregates": [{"function": "count", "column": "*"},
                      {"function": "sum", "column": "price", "alias": "rev"}],
       "version": 1}"""
    // pinned to version 1: only rows 1-2 visible → one matching row
    val v1 = QueryApi.runLake(spark, log, json).collect()
    assert(v1.length == 1)
    assert(v1.head.getString(0) == "west" && v1.head.getLong(1) == 1 &&
      v1.head.getDouble(2) == 150.0)
    assert(QueryApi.runLake(spark, log,
      json.replace("\"version\": 1", "\"version\": 0")).count() == 2)
    // default {fn}_{col} naming comes through the API path too
    val cols = QueryApi.runLake(spark, log,
      """{"table_name": "sales",
          "aggregates": [{"function": "avg", "column": "price"}]}""").columns
    assert(cols.toSeq == Seq("avg_price"))
  }

  test("unfiltered count/min/max answers from metadata — zero data I/O") {
    val log = new LakeLog(tmpDir("queryapi_stats"))
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("price", DoubleType)))
    LakeTable.createTable(log, "sales", schema)
    LakeTable.insert(spark, log, "sales",
      Seq((1L, 50.0), (2L, 150.0), (3L, 300.0)).toDF("id", "price"))
    val json = """
      {"table_name": "sales",
       "aggregates": [{"function": "count", "column": "*"},
                      {"function": "min", "column": "price"},
                      {"function": "max", "column": "price", "alias": "top"}]}"""
    val before = QueryApi.runLake(spark, log, json).collect().head
    assert(before.getLong(0) == 3L && before.getDouble(1) == 50.0 &&
      before.getDouble(2) == 300.0)
    assert(QueryApi.runLake(spark, log, json).columns.toSeq ==
      Seq("count_*", "min_price", "top"))
    // the physical witness: delete every data file — the answer is
    // unchanged because no data was ever read
    log.snapshot("sales").files.foreach(f =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(QueryApi.runLake(spark, log, json).collect().head == before)
    // a filtered query takes the data path (and now fails — files gone):
    // proves the fast path is gated exactly on metadata-answerability
    intercept[Exception] {
      QueryApi.runLake(spark, log, """
        {"table_name": "sales", "filter": "price > 100",
         "aggregates": [{"function": "count", "column": "*"}]}""").collect()
    }
  }
}
