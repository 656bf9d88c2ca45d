package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("scd"))
    val b0 = Seq((1L, "gold", 100L), (2L, "silver", 200L))
      .toDF("key", "tier", "score")
    Scd.create(log, "dim", b0.schema)
    Scd.applyBatch(spark, log, "dim", b0, "key", Seq("tier", "score"), 0L)
    log
  }

  private def dim(log: LakeLog) =
    LakeTable.read(spark, log, "dim")
      .select("key", "tier", "score", "eff_from", "eff_to", "is_current")
      .as[(Long, String, Long, Long, Option[Long], Int)]
      .collect().toSet

  test("a change closes the current row and opens a successor") {
    val log = setup()
    Scd.applyBatch(spark, log, "dim",
      Seq((1L, "platinum", 100L)).toDF("key", "tier", "score"),
      "key", Seq("tier", "score"), 5L)
    assert(dim(log) === Set(
      (1L, "gold", 100L, 0L, Some(5L), 0),
      (1L, "platinum", 100L, 5L, None, 1),
      (2L, "silver", 200L, 0L, None, 1)))
  }

  test("no-op echoes create no versions; new keys insert open") {
    val log = setup()
    val v = log.latestVersion("dim")
    Scd.applyBatch(spark, log, "dim",
      Seq((1L, "gold", 100L), (3L, "bronze", 50L))
        .toDF("key", "tier", "score"),
      "key", Seq("tier", "score"), 5L)
    assert(dim(log) === Set(
      (1L, "gold", 100L, 0L, None, 1),
      (2L, "silver", 200L, 0L, None, 1),
      (3L, "bronze", 50L, 5L, None, 1)))
    assert(log.latestVersion("dim") === v + 1) // one commit, no rewrite loop
  }

  test("asOf answers the dimension at any integer instant") {
    val log = setup()
    Scd.applyBatch(spark, log, "dim",
      Seq((1L, "platinum", 100L)).toDF("key", "tier", "score"),
      "key", Seq("tier", "score"), 5L)
    Scd.applyBatch(spark, log, "dim",
      Seq((1L, "diamond", 100L)).toDF("key", "tier", "score"),
      "key", Seq("tier", "score"), 9L)
    def tierAt(t: Long) = Scd.asOf(spark, log, "dim", t)
      .filter(col("key") === 1L).select("tier").as[String].collect().toSeq
    assert(tierAt(0L) === Seq("gold"))
    assert(tierAt(4L) === Seq("gold"))
    assert(tierAt(5L) === Seq("platinum"))
    assert(tierAt(8L) === Seq("platinum"))
    assert(tierAt(9L) === Seq("diamond"))
  }

  test("chained changes keep one current row per key") {
    val log = setup()
    for (i <- 1L to 4L)
      Scd.applyBatch(spark, log, "dim",
        Seq((2L, s"tier$i", 200L)).toDF("key", "tier", "score"),
        "key", Seq("tier", "score"), i)
    val cur = LakeTable.read(spark, log, "dim")
      .filter(col("is_current") === 1).groupBy("key")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(cur === Map(1L -> 1L, 2L -> 1L))
    assert(LakeTable.read(spark, log, "dim")
      .filter(col("key") === 2L).count() === 5) // 1 open + 4 history
  }

  test("joinAsOf enriches each fact with ITS time's dimension version") {
    val log = setup()
    Scd.applyBatch(spark, log, "dim",
      Seq((1L, "platinum", 100L)).toDF("key", "tier", "score"),
      "key", Seq("tier", "score"), 5L)
    val facts = Seq((1L, 0L, "early"), (1L, 4L, "pre"), (1L, 5L, "at"),
      (2L, 9L, "other"), (99L, 3L, "orphan"))
      .toDF("custkey", "t_fact", "tag")
    val out = Scd.joinAsOf(facts, LakeTable.read(spark, log, "dim"),
        "key", "custkey", "t_fact")
      .select("tag", "tier").as[(String, Option[String])]
      .collect().toMap
    assert(out === Map("early" -> Some("gold"), "pre" -> Some("gold"),
      "at" -> Some("platinum"), "other" -> Some("silver"),
      "orphan" -> None)) // left join keeps dimension-less facts
  }

  test("duplicate keys within a batch are rejected") {
    val log = setup()
    intercept[LakeValidationException] {
      Scd.applyBatch(spark, log, "dim",
        Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("key", "tier", "score"),
        "key", Seq("tier", "score"), 5L)
    }
  }

  test("SQL face: APPLY CHANGES INTO closes and reopens through Scd") {
    val log = setup()
    // seed a source table the FROM subquery can select from
    val src = Seq((1L, "platinum", 100L), (3L, "bronze", 50L))
      .toDF("key", "tier", "score")
    LakeTable.createTable(log, "changes", src.schema)
    LakeTable.insert(spark, log, "changes", src)
    val st = graft.api.LakeSql.execute(spark, log,
      "APPLY CHANGES INTO dim FROM (SELECT key, tier, score FROM changes) " +
        "KEY key TRACK (tier, score) AT 7").collect().head
    assert(st.getAs[Long]("eff_at") === 7L)
    assert(dim(log) === Set(
      (1L, "gold", 100L, 0L, Some(7L), 0),
      (1L, "platinum", 100L, 7L, None, 1),
      (2L, "silver", 200L, 0L, None, 1),
      (3L, "bronze", 50L, 7L, None, 1)))
  }

  test("replaying a txn id applies once") {
    val log = setup()
    val b = Seq((1L, "platinum", 100L)).toDF("key", "tier", "score")
    val first = Scd.applyBatch(spark, log, "dim", b, "key",
      Seq("tier", "score"), 5L, txnId = "batch-5")
    val again = Scd.applyBatch(spark, log, "dim", b, "key",
      Seq("tier", "score"), 5L, txnId = "batch-5")
    assert(again.duplicate && again.version === first.version)
    assert(LakeTable.read(spark, log, "dim").count() === 3)
  }

  test("all-echo batches register their txn id like every lake write") {
    val log = setup()
    // pure echo of the seeded current rows → no delta, but the txn must
    // still record: a later reuse of the id with DIFFERENT data has to
    // short-circuit as a duplicate, not re-apply
    val echo = Seq((1L, "gold", 100L), (2L, "silver", 200L))
      .toDF("key", "tier", "score")
    val r = Scd.applyBatch(spark, log, "dim", echo, "key",
      Seq("tier", "score"), 5L, txnId = "batch-echo")
    assert(!r.duplicate)
    assert(log.committedVersion("dim", "batch-echo") === Some(r.version))
    val reuse = Scd.applyBatch(spark, log, "dim",
      Seq((1L, "platinum", 100L)).toDF("key", "tier", "score"),
      "key", Seq("tier", "score"), 9L, txnId = "batch-echo")
    assert(reuse.duplicate && reuse.version === r.version)
    // the divergent payload did NOT apply
    assert(LakeTable.read(spark, log, "dim")
      .filter(col("tier") === "platinum").count() === 0)
  }
}
