package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("merge"))
    val rows = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("id", "tag", "v")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows, numFiles = 2)
    log
  }

  private def state(log: LakeLog) =
    LakeTable.read(spark, log, "t").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq

  test("ordered clauses: delete-if, else update, plus insert") {
    val log = setup()
    val src = Seq((2L, "B", 200.0), (3L, "C", -1.0), (9L, "i", 90.0))
      .toDF("id", "tag", "v")
    val r = LakeTable.merge(spark, log, "t", src, "id",
      matched = Seq(
        LakeTable.MergeClause("delete", Some("src_v < 0")),
        LakeTable.MergeClause("update")),
      insertWhen = Some(None))
    assert((r.updated, r.deleted, r.inserted) === (1L, 1L, 1L))
    assert(state(log) === Seq(
      (1L, "a", 10.0),          // untouched
      (2L, "B", 200.0),         // updated (delete cond false -> update)
      (4L, "d", 40.0),          // untouched (id 3 deleted)
      (9L, "i", 90.0)))         // inserted
  }

  test("conditions see target columns by name and source as src_") {
    val log = setup()
    val src = Seq((1L, "A", 5.0), (2L, "B", 500.0)).toDF("id", "tag", "v")
    // update only when the source value EXCEEDS the target's
    LakeTable.merge(spark, log, "t", src, "id",
      matched = Seq(LakeTable.MergeClause("update", Some("src_v > v"))),
      insertWhen = None)
    assert(state(log) === Seq((1L, "a", 10.0), (2L, "B", 500.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("no matched clause holding keeps the target row; guarded insert") {
    val log = setup()
    val src = Seq((1L, "x", 1.0), (8L, "y", -8.0), (9L, "z", 9.0))
      .toDF("id", "tag", "v")
    val r = LakeTable.merge(spark, log, "t", src, "id",
      matched = Seq(LakeTable.MergeClause("delete", Some("src_v > 100"))),
      insertWhen = Some(Some("v > 0"))) // only positive rows insert
    assert((r.updated, r.deleted, r.inserted) === (0L, 0L, 1L))
    assert(state(log).map(_._1) === Seq(1L, 2L, 3L, 4L, 9L))
    assert(state(log).head === ((1L, "a", 10.0))) // kept unchanged
  }

  test("duplicate source keys are an error; NULL keys flow to insert") {
    val log = setup()
    intercept[LakeValidationException] {
      LakeTable.merge(spark, log, "t",
        Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "tag", "v"), "id",
        matched = Seq(LakeTable.MergeClause("update")))
    }
    // NULL keys: a nullable-key table; the NULL-keyed source row never
    // matches and flows to INSERT (SQL equality semantics)
    val log2 = new LakeLog(tmpDir("merge-null"))
    val base = Seq((Option(1L), "a", 10.0), (Option(2L), "b", 20.0))
      .toDF("id", "tag", "v")
    LakeTable.createTable(log2, "t", base.schema)
    LakeTable.insert(spark, log2, "t", base)
    val withNull = Seq((Option(2L), "B", 200.0), (Option.empty[Long], "n", 7.0))
      .toDF("id", "tag", "v")
    val r = LakeTable.merge(spark, log2, "t", withNull, "id",
      matched = Seq(LakeTable.MergeClause("update")),
      insertWhen = Some(None))
    assert((r.updated, r.inserted) === (1L, 1L))
    assert(LakeTable.read(spark, log2, "t")
      .filter(col("id").isNull).count() === 1)
    assert(LakeTable.read(spark, log2, "t")
      .filter(col("id") === 2L).select("tag").as[String].head === "B")
  }

  test("idempotent under txn replay; CDC sees updates+inserts only") {
    val log = setup()
    val src = Seq((2L, "B", 200.0), (9L, "i", 90.0)).toDF("id", "tag", "v")
    val v0 = log.latestVersion("t")
    val r1 = LakeTable.merge(spark, log, "t", src, "id",
      matched = Seq(LakeTable.MergeClause("update")),
      insertWhen = Some(None), txnId = "m1")
    val r2 = LakeTable.merge(spark, log, "t", src, "id",
      matched = Seq(LakeTable.MergeClause("update")),
      insertWhen = Some(None), txnId = "m1")
    assert(r2.duplicate && r2.version == r1.version)
    assert(log.latestVersion("t") == r1.version)
    // the change feed replays exactly the logical adds (rewritten
    // survivors are layout, rewrite=true, excluded)
    val cdc = LakeTable.changesSince(spark, log, "t", v0)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(cdc === Seq((2L, "B", 200.0), (9L, "i", 90.0)))
  }

  test("SQL face: MERGE INTO with ordered WHEN clauses") {
    val log = setup()
    LakeTable.createTable(log, "stage",
      Seq((0L, "", 0.0)).toDF("id", "tag", "v").schema)
    LakeTable.insert(spark, log, "stage",
      Seq((2L, "B", -1.0), (4L, "D", 400.0), (9L, "i", 90.0))
        .toDF("id", "tag", "v"))
    val res = graft.api.LakeSql.execute(spark, log,
      "MERGE INTO t USING (SELECT * FROM stage) ON id " +
        "WHEN MATCHED AND (src_v < 0) THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED AND (v > 50) THEN INSERT *")
    val row = res.collect().head
    assert(state(log) === Seq((1L, "a", 10.0), (3L, "c", 30.0),
      (4L, "D", 400.0), (9L, "i", 90.0)))
    // the plain upsert form still parses (no WHEN tail)
    graft.api.LakeSql.execute(spark, log,
      "MERGE INTO t USING (SELECT 1 AS id, 'z' AS tag, " +
        "CAST(99 AS DOUBLE) AS v) ON id")
    assert(state(log).head === ((1L, "z", 99.0)))
    assert(row != null)
  }
}
