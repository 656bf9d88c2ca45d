package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def lin(df: org.apache.spark.sql.DataFrame) =
    Lineage.columnLineage(spark, df)
      .as[(String, String, String)].collect().toSet

  private def lake() = {
    import graft.lake.{LakeLog, LakeTable}
    val log = new LakeLog(tmpDir("lineage"))
    val a = Seq((1L, "x", 2.0)).toDF("id", "tag", "v")
    LakeTable.createTable(log, "ta", a.schema)
    LakeTable.insert(spark, log, "ta", a)
    val b = Seq((1L, 5L)).toDF("id", "w")
    LakeTable.createTable(log, "tb", b.schema)
    LakeTable.insert(spark, log, "tb", b)
    (log, LakeTable.readIndexed(spark, log, "ta"),
      LakeTable.readIndexed(spark, log, "tb"))
  }

  test("aliases, arithmetic and joins resolve to leaf scan columns") {
    val (_, ta, tb) = lake()
    val q = ta.join(tb, Seq("id"))
      .select((col("v") * col("w")).as("vw"),
        upper(col("tag")).as("TAG"), col("id"))
    assert(lin(q) === Set(
      ("vw", "ta", "v"), ("vw", "tb", "w"),
      ("TAG", "ta", "tag"),
      // an INNER using-join's key column is the left side's attribute
      ("id", "ta", "id")))
    // a FULL using-join coalesces both sides' key — both appear
    val full = ta.join(tb, Seq("id"), "full").select("id")
    assert(lin(full) === Set(("id", "ta", "id"), ("id", "tb", "id")))
  }

  test("aggregates union their input refs; filters add no column lineage") {
    val (_, ta, _) = lake()
    val q = ta.filter(col("tag") =!= "q")
      .groupBy("tag").agg(sum(col("v") + col("id")).as("s"))
    assert(lin(q) === Set(
      ("tag", "ta", "tag"),
      ("s", "ta", "v"), ("s", "ta", "id")))
  }

  test("explode inherits the generator's inputs") {
    val (_, ta, _) = lake()
    val q = ta.select(explode(split(col("tag"), ",")).as("piece"))
    assert(lin(q) === Set(("piece", "ta", "tag")))
  }

  test("unions merge positionally across both children") {
    val (_, ta, tb) = lake()
    val q = ta.select(col("v").as("m"))
      .unionAll(tb.select(col("w").cast("double").as("m")))
    assert(lin(q) === Set(("m", "ta", "v"), ("m", "tb", "w")))
  }

  test("window functions carry their order/partition refs") {
    val (_, ta, _) = lake()
    import org.apache.spark.sql.expressions.Window
    val q = ta.select(col("id"),
      sum("v").over(Window.partitionBy("tag").orderBy("id")).as("run"))
    val got = lin(q)
    assert(got.contains(("run", "ta", "v")))
    assert(got.contains(("id", "ta", "id")))
  }

  test("masked reads: a masked column's lineage is its mask's RAW sources") {
    import graft.lake.Masking
    val (log, _, _) = lake()
    // mask referencing its own column: the analyst's view of `tag` is
    // still influenced by — and only by — the raw ta.tag
    Masking.setMask(spark, log, "ta", "tag",
      "concat(substring(tag, 1, 1), '***')", exemptRoles = Seq("admin"))
    // mask referencing ANOTHER column: the governance case lineage must
    // surface — what the analyst sees as `v` actually flows from ta.id
    Masking.setMask(spark, log, "ta", "v", "CAST(id AS DOUBLE)")
    val masked = Masking.readMasked(spark, log, "ta", "analyst")
    assert(lin(masked) === Set(
      ("id", "ta", "id"),
      ("tag", "ta", "tag"),          // masked, still sourced from raw tag
      ("v", "ta", "id")))            // cross-column mask: flows from id!
    // the exempt role reads raw — identity lineage
    assert(lin(Masking.readMasked(spark, log, "ta", "admin"))
      .contains(("tag", "ta", "tag")))
    // a CONSTANT mask severs dataflow: correct lineage is empty for that
    // column (the policy listing, not lineage, records governed columns)
    Masking.setMask(spark, log, "ta", "tag", "'REDACTED'")
    val sealed0 = Masking.readMasked(spark, log, "ta", "analyst")
    assert(!lin(sealed0).exists(_._1 == "tag"))
  }

  test("plain parquet scans name the file's base name") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val q = docs.select(length(col("text")).as("len"))
    assert(lin(q) === Set(("len", "documents", "text")))
  }
}
