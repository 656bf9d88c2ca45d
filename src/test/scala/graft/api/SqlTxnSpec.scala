package graft.api

import graft.SparkSpec
import graft.lake.{Field, LakeLog, LakeTable, LakeValidationException,
  MultiTxn, TableSchema}
import org.apache.spark.sql.functions._

/** BEGIN TRANSACTION ... COMMIT/ROLLBACK: the SQL face over the 2PC
  * machinery — atomic multi-table visibility, all-or-nothing aborts,
  * idempotent replay, and the only-INSERT grammar gate. */
class SqlTxnSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(): LakeLog = {
    val log = new LakeLog(tmpDir("sqltxn"))
    log.createTable("src", TableSchema(Seq(
      Field("id", "int64"), Field("v", "int64"))))
    LakeTable.insert(spark, log, "src",
      (1 to 20).map(i => (i.toLong, i.toLong * 3)).toDF("id", "v"))
    log.createTable("a", TableSchema(Seq(
      Field("id", "int64"), Field("v", "int64"))))
    log.createTable("b", TableSchema(Seq(Field("total", "int64"))))
    log
  }

  test("COMMIT publishes every participant atomically") {
    val log = seeded()
    val st = LakeSql.execute(spark, log,
      """BEGIN TRANSACTION 'tx1';
         INSERT INTO a SELECT id, v FROM src WHERE id <= 10;
         INSERT INTO b SELECT sum(v) AS total FROM src WHERE id <= 10;
         COMMIT""").head()
    assert(st.getAs[Boolean]("committed"))
    assert(st.getAs[String]("tables") == "a@1,b@1")
    assert(LakeTable.read(spark, log, "a").count() == 10L)
    assert(LakeTable.read(spark, log, "b").as[Long].head() == 165L)
    // the recorded snapshot reads consistently
    val snap = MultiTxn.readAt(spark, log, "tx1")
    assert(snap("a").count() == 10L && snap("b").count() == 1L)
  }

  test("ROLLBACK leaves no trace; mid-stage failure aborts everything") {
    val log = seeded()
    LakeSql.execute(spark, log,
      """BEGIN TRANSACTION 'tx2';
         INSERT INTO a SELECT id, v FROM src;
         ROLLBACK""")
    assert(LakeTable.read(spark, log, "a").count() == 0L)
    assert(log.latestVersion("a") == 0L, "rollback must not commit")
    // a non-INSERT verb inside the block is refused and the already-
    // staged participant is aborted — nothing becomes visible
    val e = intercept[LakeValidationException](LakeSql.execute(spark, log,
      """BEGIN TRANSACTION 'tx3';
         INSERT INTO a SELECT id, v FROM src;
         DELETE FROM a WHERE id > 5;
         COMMIT"""))
    assert(e.getMessage.contains("only INSERT INTO"))
    assert(LakeTable.read(spark, log, "a").count() == 0L)
    assert(MultiTxn.done(log, "tx3").isEmpty)
  }

  test("replayed COMMIT block is idempotent (returns recorded versions)") {
    val log = seeded()
    val block =
      """BEGIN TRANSACTION 'tx4';
         INSERT INTO a SELECT id, v FROM src WHERE id <= 5;
         COMMIT"""
    val st1 = LakeSql.execute(spark, log, block).head()
    val st2 = LakeSql.execute(spark, log, block).head()
    assert(st1.getAs[String]("tables") == st2.getAs[String]("tables"))
    assert(LakeTable.read(spark, log, "a").count() == 5L,
      "replay must not double-insert")
    assert(log.latestVersion("a") == 1L)
  }

  test("statements outside a block cannot see staged (pre-decide) data") {
    val log = seeded()
    // stage without deciding (simulates reading mid-transaction)
    MultiTxn.stage(spark, log, "tx5", "a",
      spark.range(3).select(col("id"), col("id").as("v")))
    assert(LakeSql.execute(spark, log, "SELECT count(*) AS n FROM a")
      .as[Long].head() == 0L, "staged writes must be invisible")
    MultiTxn.commit(spark, log, "tx5", Seq("a"))
    assert(LakeSql.execute(spark, log, "SELECT count(*) AS n FROM a")
      .as[Long].head() == 3L)
  }

  test("semicolons inside string literals don't fragment the block") {
    val log = seeded()
    log.createTable("c", TableSchema(Seq(
      Field("id", "int64"), Field("tag", "string"))))
    val st = LakeSql.execute(spark, log,
      """BEGIN TRANSACTION 'txsemi';
         INSERT INTO c SELECT id, 'a;b' AS tag FROM src WHERE id <= 4;
         COMMIT""").head()
    assert(st.getAs[Boolean]("committed"))
    val tags = LakeTable.read(spark, log, "c").select("tag")
      .distinct().as[String].collect().toSeq
    assert(tags == Seq("a;b"))
  }

  test("double-quoted literals and bracketed comments don't fragment " +
      "the block") {
    val log = seeded()
    log.createTable("c", TableSchema(Seq(
      Field("id", "int64"), Field("tag", "string"))))
    // Spark's default lexer reads "x;y" as a STRING literal, and a
    // /* ... */ span is commentary — neither semicolon is a boundary
    val st = LakeSql.execute(spark, log,
      """BEGIN TRANSACTION 'txdq';
         INSERT INTO c SELECT id, "x;y" AS tag /* tail; note */
           FROM src WHERE id <= 3;
         COMMIT""").head()
    assert(st.getAs[Boolean]("committed"))
    val tags = LakeTable.read(spark, log, "c").select("tag")
      .distinct().as[String].collect().toSeq
    assert(tags == Seq("x;y"))
    assert(LakeTable.read(spark, log, "c").count() == 3L)
  }

  test("replaying a committed txn id with a DIFFERENT body refuses") {
    val log = seeded()
    val block =
      """BEGIN TRANSACTION 'txr';
         INSERT INTO a SELECT id, v FROM src WHERE id <= 5;
         COMMIT"""
    LakeSql.execute(spark, log, block)
    // identical body replays idempotently...
    assert(LakeSql.execute(spark, log, block).head()
      .getAs[Boolean]("committed"))
    // ...but the same id carrying different statements must fail loudly
    // instead of silently no-opping onto the old versions
    val e = intercept[LakeValidationException](LakeSql.execute(spark, log,
      """BEGIN TRANSACTION 'txr';
         INSERT INTO a SELECT id, v FROM src WHERE id <= 10;
         COMMIT"""))
    assert(e.getMessage.contains("DIFFERENT statement body"))
    assert(LakeTable.read(spark, log, "a").count() == 5L)
  }
}
