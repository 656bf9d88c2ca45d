package graft.lake

import graft.SparkSpec
import graft.api.{LakeSql, ResultCache, SqlApi}
import org.apache.spark.sql.functions._

/** Logical views: catalog CRUD through the OCC mini-log, creation-order
  * replay, dependency validation (create-time analysis, no stranded
  * dependents), composition with time travel and the result cache. */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(): LakeLog = {
    val log = new LakeLog(tmpDir("views"))
    log.createTable("s", TableSchema(Seq(
      Field("id", "int64"), Field("cat", "string"),
      Field("amt", "int64"))))
    LakeTable.insert(spark, log, "s",
      (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
        i.toLong * 10)).toDF("id", "cat", "amt"))
    log
  }

  test("create, read, replace, drop through SQL; views see live data") {
    val log = seeded()
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE VIEW big AS SELECT id, amt FROM s WHERE amt > 200")
    assert(sql("SELECT count(*) AS n FROM big").as[Long].head() == 20L)
    // a view is a macro over CURRENT state: new rows show up unrefreshed
    LakeTable.insert(spark, log, "s",
      Seq((100L, "a", 999L)).toDF("id", "cat", "amt"))
    assert(sql("SELECT count(*) AS n FROM big").as[Long].head() == 21L)
    // replace narrows it; plain CREATE on an existing name refuses
    intercept[LakeValidationException](
      sql("CREATE VIEW big AS SELECT id FROM s"))
    sql("CREATE OR REPLACE VIEW big AS " +
      "SELECT id, amt FROM s WHERE amt > 300")
    assert(sql("SELECT count(*) AS n FROM big").as[Long].head() == 11L)
    assert(sql("DESCRIBE VIEWS").count() == 1L)
    sql("DROP VIEW big")
    intercept[Exception](sql("SELECT count(*) FROM big").collect())
    intercept[LakeValidationException](sql("DROP VIEW big"))
  }

  test("views stack in creation order and validate at create time") {
    val log = seeded()
    def sql(s: String) = LakeSql.execute(spark, log, s)
    sql("CREATE VIEW v1 AS SELECT cat, sum(amt) AS total " +
      "FROM s GROUP BY cat")
    sql("CREATE VIEW v2 AS SELECT cat FROM v1 WHERE total > 4000")
    assert(sql("SELECT cat FROM v2").as[String].collect().toSeq ==
      Seq("a"))
    // a bad definition fails AT CREATE (missing column), not at read
    intercept[LakeValidationException](
      sql("CREATE VIEW bad AS SELECT nope FROM s"))
    // dropping v1 would strand v2 — refused; dropping v2 first works
    intercept[LakeValidationException](sql("DROP VIEW v1"))
    sql("DROP VIEW v2")
    sql("DROP VIEW v1")
    assert(sql("DESCRIBE VIEWS").count() == 0L)
    // a replace that breaks a dependent is refused the same way
    sql("CREATE VIEW w1 AS SELECT cat, amt FROM s")
    sql("CREATE VIEW w2 AS SELECT amt FROM w1")
    intercept[LakeValidationException](
      sql("CREATE OR REPLACE VIEW w1 AS SELECT cat FROM s"))
    assert(sql("SELECT count(*) AS n FROM w2").as[Long].head() == 40L)
  }

  test("view name cannot shadow a table; bad names refused") {
    val log = seeded()
    intercept[LakeValidationException](
      Views.create(spark, log, "s", "SELECT 1"))
    intercept[IllegalArgumentException](
      Views.create(spark, log, "no-dash", "SELECT 1"))
  }

  test("views compose with time travel on base tables") {
    val log = seeded()
    def sql(s: String) = LakeSql.execute(spark, log, s)
    val v1 = log.latestVersion("s")
    LakeTable.insert(spark, log, "s",
      Seq((200L, "b", 5000L)).toDF("id", "cat", "amt"))
    sql("CREATE VIEW tot AS SELECT sum(amt) AS t FROM s")
    assert(sql("SELECT t FROM tot").as[Long].head() == 8200L + 5000L)
    // pinning the BASE table pins what the view reads
    assert(SqlApi.queryLake(spark, log, "SELECT t FROM tot",
      versions = Map("s" -> v1)).as[Long].head() == 8200L)
  }

  test("view DDL invalidates the result cache (commitless staleness)") {
    val log = seeded()
    val cache = new ResultCache[Long]()
    def fp() = cache.fingerprint(log)
    val fp0 = fp()
    Views.create(spark, log, "v", "SELECT count(*) AS n FROM s")
    val fp1 = fp()
    assert(fp1 != fp0, "CREATE VIEW must move the fingerprint")
    Views.create(spark, log, "v", "SELECT count(*) + 1 AS n FROM s",
      orReplace = true)
    val fp2 = fp()
    assert(fp2 != fp1, "REPLACE VIEW must move the fingerprint")
    Views.drop(spark, log, "v")
    assert(fp() != fp2, "DROP VIEW must move the fingerprint")
  }

  test("concurrent CREATE VIEWs both land (OCC mini-log)") {
    val log = seeded()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 4).map { i =>
      new Thread(() => {
        try Views.create(spark, log, s"cv$i",
          s"SELECT id FROM s WHERE id % 4 = ${i % 4}")
        catch { case e: Throwable => errs.add(e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent creates failed: ${errs.peek()}")
    assert(Views.catalog(log).views.map(_.name).toSet ==
      Set("cv1", "cv2", "cv3", "cv4"))
    // and the mini-log line is gapless
    assert(Views.catalogVersion(log) == 4L)
  }

  test("torn newest catalog entry fails closed") {
    val log = seeded()
    Views.create(spark, log, "v", "SELECT id FROM s")
    val dir = log.root.resolve("_views")
    java.nio.file.Files.writeString(
      dir.resolve(f"${2L}%020d.json"), "{\"views\": [tru")
    val e = intercept[LakeValidationException](Views.catalog(log))
    assert(e.getMessage.contains("fail-closed"))
  }

  test("CREATE TABLE under an existing view name is refused") {
    val log = seeded()
    LakeSql.execute(spark, log, "CREATE VIEW v AS SELECT id FROM s")
    // the reverse of the view-side shadow guard: registerAll registers
    // views AFTER tables, so this table would be invisible to SELECTs
    val e = intercept[LakeValidationException](
      log.createTable("v", TableSchema(Seq(Field("id", "int64")))))
    assert(e.getMessage.contains("view with that name exists"))
    intercept[LakeValidationException](
      LakeSql.execute(spark, log, "CREATE TABLE v (id int64)"))
    // dropping the view frees the name
    LakeSql.execute(spark, log, "DROP VIEW v")
    log.createTable("v", TableSchema(Seq(Field("id", "int64"))))
    assert(log.listTables().contains("v"))
  }
}
