package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import MaterializedView.MvDef

/** Join (star-schema) materialized views: the MV aggregates fact ⋈ dim,
  * fact appends fold incrementally while the dim is unchanged, any dim
  * commit forces (and un-noops into) a full recompute, and after every
  * refresh sequence the MV equals the join-aggregate recomputed from
  * current state. */
class JoinMvSpec extends SparkSpec {
  import spark.implicits._

  private val factSchema = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("cust_id", LongType),
    StructField("amount", DoubleType)))
  private val dimSchema = StructType(Seq(
    StructField("cust_id", LongType, nullable = false),
    StructField("segment", StringType)))

  private def facts(ids: Range) =
    ids.map(i => (i.toLong, (i % 4).toLong, i * 1.0))
      .toDF("order_id", "cust_id", "amount")

  private def setup(): (LakeLog, MvDef) = {
    val log = new LakeLog(tmpDir("jmv"))
    LakeTable.createTable(log, "fact", factSchema)
    LakeTable.createTable(log, "dim", dimSchema)
    LakeTable.insert(spark, log, "dim",
      Seq((0L, "basic"), (1L, "basic"), (2L, "premium"))
        .toDF("cust_id", "segment"))
    val d = MvDef("rev_by_segment", "fact", "segment", Seq("amount"),
      joinTable = Some("dim"), joinOn = Some("cust_id"))
    MaterializedView.create(log, d)
    (log, d)
  }

  private def expected(log: LakeLog) =
    LakeTable.read(spark, log, "fact")
      .join(LakeTable.read(spark, log, "dim"), Seq("cust_id"), "inner")
      .groupBy("segment")
      .agg(count(lit(1)).as("n_rows"), sum("amount").as("sum_amount"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  private def actual(log: LakeLog, d: MvDef) =
    LakeTable.read(spark, log, d.name)
      .select("segment", "n_rows", "sum_amount")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("fact appends fold incrementally through the join") {
    val (log, d) = setup()
    LakeTable.insert(spark, log, "fact", facts(1 to 40))
    val r1 = MaterializedView.refresh(spark, log, d)
    assert(r1.mode == "incremental")
    assert(actual(log, d) == expected(log))
    // cust_id 3 has no dim row: inner-join semantics drop those orders
    assert(LakeTable.read(spark, log, d.name)
      .agg(sum("n_rows")).as[Long].head() == 30L)

    LakeTable.insert(spark, log, "fact", facts(41 to 60))
    val r2 = MaterializedView.refresh(spark, log, d)
    assert(r2.mode == "incremental" && r2.fromVersion == r1.toVersion)
    assert(actual(log, d) == expected(log))
    // replayed refresh is a noop
    assert(MaterializedView.refresh(spark, log, d).mode == "noop")
  }

  test("a dim commit forces full recompute and un-noops a current MV") {
    val (log, d) = setup()
    LakeTable.insert(spark, log, "fact", facts(1 to 40))
    assert(MaterializedView.refresh(spark, log, d).mode == "incremental")
    // dim-only change: fact is current, but the MV is stale vs the dim —
    // refresh must NOT report noop, and must take the full path
    LakeTable.insert(spark, log, "dim",
      Seq((3L, "premium")).toDF("cust_id", "segment"))
    val r = MaterializedView.refresh(spark, log, d)
    assert(r.mode == "full",
      s"dim change must force full recompute, got ${r.mode}")
    assert(actual(log, d) == expected(log))
    // the previously-dropped cust 3 orders now count
    assert(LakeTable.read(spark, log, d.name)
      .agg(sum("n_rows")).as[Long].head() == 40L)
    assert(MaterializedView.refresh(spark, log, d).mode == "noop")
    // fact appends after the dim change fold incrementally again
    LakeTable.insert(spark, log, "fact", facts(41 to 50))
    val r2 = MaterializedView.refresh(spark, log, d)
    assert(r2.mode == "incremental")
    assert(actual(log, d) == expected(log))
  }

  test("fact DV deletes fold as negative deltas through the join") {
    val (log, d) = setup()
    LakeTable.insert(spark, log, "fact", facts(1 to 40))
    assert(MaterializedView.refresh(spark, log, d).mode == "incremental")
    LakeTable.deleteWhereMor(spark, log, "fact", "amount > 30")
    val r = MaterializedView.refresh(spark, log, d)
    assert(r.mode == "incremental_dv", s"got ${r.mode}")
    assert(actual(log, d) == expected(log))
  }

  test("create validates join column and name collisions") {
    val log = new LakeLog(tmpDir("jmvv"))
    LakeTable.createTable(log, "f", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("shared", StringType))))
    LakeTable.createTable(log, "d1", StructType(Seq(
      StructField("k", LongType), StructField("seg", StringType),
      StructField("shared", StringType))))
    LakeTable.createTable(log, "d2", StructType(Seq(
      StructField("k", StringType), StructField("seg", StringType))))
    // non-join column name overlap refused
    intercept[IllegalArgumentException](MaterializedView.create(log,
      MvDef("m1", "f", "seg", Seq("v"),
        joinTable = Some("d1"), joinOn = Some("k"))))
    // join column type mismatch refused
    intercept[IllegalArgumentException](MaterializedView.create(log,
      MvDef("m2", "f", "seg", Seq("v"),
        joinTable = Some("d2"), joinOn = Some("k"))))
    // missing joinOn refused
    intercept[IllegalArgumentException](MaterializedView.create(log,
      MvDef("m3", "f", "seg", Seq("v"), joinTable = Some("d2"))))
  }

  test("GDPR forget on the fact composes: MOR erasure folds as a " +
      "negative delta and the MV stops reflecting the subject") {
    val (log, d) = setup()
    LakeTable.insert(spark, log, "fact", facts(1 to 40))
    assert(MaterializedView.refresh(spark, log, d).mode == "incremental")
    // erase one customer's orders from the fact (merge-on-read — the
    // forget path's per-table mechanism). Cust 1 shares the basic
    // segment with cust 0, so no group empties and the DV window folds
    // as a negative delta without the emptied-group full fallback.
    Forget.forgetKey(spark, log, Seq("fact"), "cust_id", "1", "req-1")
    val r = MaterializedView.refresh(spark, log, d)
    assert(r.mode == "incremental_dv", s"got ${r.mode}")
    assert(actual(log, d) == expected(log))
    val basic = LakeTable.read(spark, log, d.name)
      .filter(col("segment") === "basic").select("n_rows")
      .as[Long].head()
    assert(basic == 10L, s"basic segment kept $basic rows, expected 10")
  }

  test("SQL face: CREATE ... JOIN ... ON + REFRESH by name") {
    val (log, _) = setup()
    import graft.api.LakeSql
    LakeTable.insert(spark, log, "fact", facts(1 to 20))
    LakeSql.execute(spark, log, "CREATE MATERIALIZED VIEW seg_rev ON " +
      "fact JOIN dim ON cust_id KEY segment SUM (amount)")
    val st = LakeSql.execute(spark, log,
      "REFRESH MATERIALIZED VIEW seg_rev").head()
    assert(st.getAs[String]("mode") == "incremental" ||
      st.getAs[String]("mode") == "full")
    val d = MaterializedView.loadDef(log, "seg_rev").get
    assert(d.joinTable.contains("dim") && d.joinOn.contains("cust_id"))
    assert(actual(log, d) == expected(log))
  }
}
