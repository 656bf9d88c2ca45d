package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaskingSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("mask"))
    val rows = Seq((1L, "BUILDING", 1234.56), (2L, "AUTO", -42.0))
      .toDF("id", "seg", "bal")
    LakeTable.createTable(log, "t", rows.schema)
    LakeTable.insert(spark, log, "t", rows)
    log
  }

  test("masks rewrite at read time per role; exempt roles read raw") {
    val log = setup()
    Masking.setMask(spark, log, "t", "seg",
      "concat(substring(seg, 1, 1), '***')", exemptRoles = Seq("admin"))
    val analyst = Masking.readMasked(spark, log, "t", "analyst")
      .orderBy("id").select("seg").as[String].collect().toSeq
    assert(analyst === Seq("B***", "A***"))
    val admin = Masking.readMasked(spark, log, "t", "admin")
      .orderBy("id").select("seg").as[String].collect().toSeq
    assert(admin === Seq("BUILDING", "AUTO"))
    // masking is a projection: other columns untouched
    assert(Masking.readMasked(spark, log, "t", "analyst")
      .agg(sum("bal")).as[Double].head() === 1192.56)
  }

  test("policies persist, replace per column, and drop") {
    val log = setup()
    Masking.setMask(spark, log, "t", "seg", "'X'")
    Masking.setMask(spark, log, "t", "seg", "'Y'") // replace
    assert(Masking.policy(log, "t").masks.map(_.expr) === Seq("'Y'"))
    assert(Masking.readMasked(spark, log, "t", "anyone")
      .select("seg").distinct().as[String].collect().toSeq === Seq("Y"))
    Masking.dropMask(log, "t", "seg")
    assert(Masking.policy(log, "t").masks.isEmpty)
    assert(Masking.readMasked(spark, log, "t", "anyone")
      .filter($"seg" === "AUTO").count() === 1)
  }

  test("validation: unknown column, non-analyzing expr, type change") {
    val log = setup()
    intercept[LakeValidationException] {
      Masking.setMask(spark, log, "t", "nope", "'x'")
    }
    intercept[LakeValidationException] {
      Masking.setMask(spark, log, "t", "seg", "not_a_col + 1")
    }
    intercept[LakeValidationException] {
      Masking.setMask(spark, log, "t", "bal", "'redacted'") // double→string
    }
  }

  test("SQL verbs: SET MASK with nested parens + EXEMPT, DROP MASK") {
    val log = setup()
    graft.api.LakeSql.execute(spark, log,
      "ALTER TABLE t SET MASK seg AS (concat(substring(seg, 1, 1), " +
        "'***')) EXEMPT (admin, dpo)")
    val m = Masking.policy(log, "t").masks.head
    assert(m.expr == "concat(substring(seg, 1, 1), '***')")
    assert(m.exempt_roles == Seq("admin", "dpo"))
    assert(Masking.readMasked(spark, log, "t", "dpo")
      .filter($"seg" === "AUTO").count() === 1)
    graft.api.LakeSql.execute(spark, log, "ALTER TABLE t DROP MASK seg")
    assert(Masking.policy(log, "t").masks.isEmpty)
  }
}
