package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RowFilterSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("rowfilter"))
    val rows = Seq((1L, "EU", 100.0), (2L, "US", -50.0), (3L, "EU", -5.0),
      (4L, "APAC", 30.0)).toDF("id", "region", "bal")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows)
    log
  }

  test("non-exempt roles see only matching rows; exempt roles see all") {
    val log = setup()
    RowFilter.setFilter(spark, log, "t", "region = 'EU'",
      exemptRoles = Seq("admin"))
    assert(RowFilter.readFiltered(spark, log, "t", "analyst")
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    assert(RowFilter.readFiltered(spark, log, "t", "admin").count() === 4)
    // replace narrows further; drop restores everything
    RowFilter.setFilter(spark, log, "t", "region = 'EU' AND bal > 0")
    assert(RowFilter.readFiltered(spark, log, "t", "analyst")
      .select("id").as[Long].collect().toSeq === Seq(1L))
    RowFilter.dropFilter(log, "t")
    assert(RowFilter.policy(log, "t").isEmpty)
    assert(RowFilter.readFiltered(spark, log, "t", "analyst").count() === 4)
  }

  test("validation: non-boolean and non-analyzing predicates refuse") {
    val log = setup()
    intercept[LakeValidationException] {
      RowFilter.setFilter(spark, log, "t", "region") // string, not bool
    }
    intercept[LakeValidationException] {
      RowFilter.setFilter(spark, log, "t", "nope = 1")
    }
  }

  test("governed read: filter judges RAW values, then masks apply") {
    val log = setup()
    // the filter references region; region is ALSO masked — membership
    // must be decided on the raw value, appearance on the masked one
    RowFilter.setFilter(spark, log, "t", "region = 'EU'")
    Masking.setMask(spark, log, "t", "region", "'***'")
    val got = RowFilter.readGoverned(spark, log, "t", "analyst")
      .orderBy("id").select("id", "region").as[(Long, String)]
      .collect().toSeq
    assert(got === Seq((1L, "***"), (3L, "***")))
    // an exempt-from-masks role still honors the row filter (and vice
    // versa would hold — the two policies gate independently)
    Masking.setMask(spark, log, "t", "region", "'***'",
      exemptRoles = Seq("admin"))
    RowFilter.setFilter(spark, log, "t", "region = 'EU'",
      exemptRoles = Seq("auditor"))
    assert(RowFilter.readGoverned(spark, log, "t", "admin")
      .select("region").distinct().as[String].collect().toSeq === Seq("EU"))
    assert(RowFilter.readGoverned(spark, log, "t", "auditor")
      .count() === 4)
  }

  test("torn newest entry fails CLOSED; repair restores reads") {
    val log = setup()
    RowFilter.setFilter(spark, log, "t", "bal > 0")
    val dir = log.tableDir("t").resolve("_rowfilters")
    val newest = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".json")).sorted.last
    java.nio.file.Files.writeString(java.nio.file.Paths.get(newest),
      "{\"expr\": TRUNC")
    val e = intercept[LakeValidationException] {
      RowFilter.readGoverned(spark, log, "t", "analyst").count()
    }
    assert(e.getMessage.contains("fail-closed"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(newest),
      "{\"expr\": \"bal > 0\", \"exempt_roles\": []}")
    assert(RowFilter.readFiltered(spark, log, "t", "analyst").count() === 2)
  }

  test("the filter PUSHES DOWN to the scan like any predicate") {
    val log = setup()
    RowFilter.setFilter(spark, log, "t", "bal > 0")
    val plan = RowFilter.readFiltered(spark, log, "t", "analyst")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(bal,0.0)"),
      s"row filter did not reach the scan:\n$plan")
  }

  test("SQL verbs: SET ROW FILTER with EXEMPT, plain, DROP") {
    val log = setup()
    graft.api.LakeSql.execute(spark, log,
      "ALTER TABLE t SET ROW FILTER (region = 'EU' AND (bal > 0 OR " +
        "id = 3)) EXEMPT (admin, dpo)")
    val p = RowFilter.policy(log, "t").get
    assert(p.expr == "region = 'EU' AND (bal > 0 OR id = 3)")
    assert(p.exempt_roles == Seq("admin", "dpo"))
    assert(RowFilter.readFiltered(spark, log, "t", "x").count() === 2)
    assert(RowFilter.readFiltered(spark, log, "t", "dpo").count() === 4)
    graft.api.LakeSql.execute(spark, log,
      "ALTER TABLE t SET ROW FILTER (bal < 0)")
    assert(RowFilter.readFiltered(spark, log, "t", "x").count() === 2)
    graft.api.LakeSql.execute(spark, log, "ALTER TABLE t DROP ROW FILTER")
    assert(RowFilter.policy(log, "t").isEmpty)
  }
}
