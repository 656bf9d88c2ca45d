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

  test("a mask referencing another masked column sees the RAW value") {
    val log = setup()
    // bal's mask references seg; seg itself is masked. One-select
    // semantics: bal's mask must see the RAW seg ("BUILDING"), not the
    // masked "B***" — regardless of install order.
    Masking.setMask(spark, log, "t", "seg", "'***'")
    Masking.setMask(spark, log, "t", "bal",
      "CAST(length(seg) AS DOUBLE)")
    val got = Masking.readMasked(spark, log, "t", "analyst")
      .orderBy("id").select("bal").as[Double].collect().toSeq
    assert(got === Seq(8.0, 4.0)) // length(BUILDING), length(AUTO)
    // and the reverse install order gives the same answer
    val log2 = setup()
    Masking.setMask(spark, log2, "t", "bal",
      "CAST(length(seg) AS DOUBLE)")
    Masking.setMask(spark, log2, "t", "seg", "'***'")
    assert(Masking.readMasked(spark, log2, "t", "analyst")
      .orderBy("id").select("bal").as[Double].collect().toSeq
      === Seq(8.0, 4.0))
  }

  test("concurrent SET MASK on different columns: neither is lost") {
    val log = setup()
    val threads = (0 until 2).map { i =>
      val colName = if (i == 0) "seg" else "bal"
      val ex = if (i == 0) "'***'" else "CAST(0.0 AS DOUBLE)"
      new Thread(() => (0 until 25).foreach { _ =>
        Masking.setMask(spark, log, "t", colName, ex)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val cols = Masking.policy(log, "t").masks.map(_.column).sorted
    assert(cols === Seq("bal", "seg"),
      s"a concurrent mask update was lost: surviving policy = $cols")
  }

  test("torn newest policy entry fails CLOSED, not with a JSON crash") {
    val log = setup()
    Masking.setMask(spark, log, "t", "seg", "'***'")
    // simulate a corrupted newest entry (e.g. bit rot / manual edit)
    val dir = log.tableDir("t").resolve("_masks")
    val newest = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".json")).sorted.last
    java.nio.file.Files.writeString(java.nio.file.Paths.get(newest),
      "{\"masks\": [ TRUNC")
    val e = intercept[LakeValidationException] {
      Masking.readMasked(spark, log, "t", "analyst").count()
    }
    assert(e.getMessage.contains("fail-closed"))
    // mutation on a torn policy also refuses (can't read-modify-write
    // what it can't read) instead of silently resetting the policy
    intercept[LakeValidationException] {
      Masking.setMask(spark, log, "t", "bal", "CAST(0.0 AS DOUBLE)")
    }
    // repair: rewrite the torn entry → reads resume with the policy
    java.nio.file.Files.writeString(java.nio.file.Paths.get(newest),
      "{\"masks\": [{\"column\": \"seg\", \"expr\": \"'***'\", " +
        "\"exempt_roles\": []}]}")
    assert(Masking.readMasked(spark, log, "t", "analyst")
      .select("seg").distinct().as[String].collect().toSeq === Seq("***"))
  }

  test("a crash mid-write (stale staged temp) never becomes the policy") {
    val log = setup()
    Masking.setMask(spark, log, "t", "seg", "'***'")
    // a killed writer leaves only a temp file; policy reads ignore it
    val dir = log.tableDir("t").resolve("_masks")
    java.nio.file.Files.writeString(
      java.nio.file.Files.createTempFile(dir, ".staged", ".json"),
      "{\"masks\": [ half-writ")
    assert(Masking.policy(log, "t").masks.map(_.expr) === Seq("'***'"))
    // and later mutations still commit cleanly past the orphan
    Masking.setMask(spark, log, "t", "bal", "CAST(0.0 AS DOUBLE)")
    assert(Masking.policy(log, "t").masks.size === 2)
  }

  test("legacy single-file _masks.json still governs reads") {
    val log = setup()
    java.nio.file.Files.writeString(
      log.tableDir("t").resolve("_masks.json"),
      "{\"masks\": [{\"column\": \"seg\", \"expr\": \"'L'\", " +
        "\"exempt_roles\": []}]}")
    assert(Masking.readMasked(spark, log, "t", "x")
      .select("seg").distinct().as[String].collect().toSeq === Seq("L"))
    // first mini-log commit supersedes the legacy file
    Masking.setMask(spark, log, "t", "seg", "'N'")
    assert(Masking.readMasked(spark, log, "t", "x")
      .select("seg").distinct().as[String].collect().toSeq === Seq("N"))
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

  test("vacuum keeps the newest N entries; policy, commit line and " +
      "fail-closed reads unaffected") {
    val log = setup()
    // 12 mutations -> 12 full-catalog entries
    (1 to 6).foreach { i =>
      Masking.setMask(spark, log, "t", "seg", s"'m$i'")
      Masking.setMask(spark, log, "t", "bal", s"CAST($i.0 AS DOUBLE)")
    }
    val dir = log.tableDir("t").resolve("_masks")
    def entries() = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(n => n.endsWith(".json") &&
        !java.nio.file.Paths.get(n).getFileName.toString.startsWith("."))
      .sorted.toSeq
    assert(entries().size == 12)
    val before = Masking.policy(log, "t")
    assert(Masking.vacuumPolicyLog(log, "t", keep = 3) == 9)
    assert(entries().size == 3)
    assert(Masking.policy(log, "t") == before, "vacuum changed the policy")
    // idempotent; keep >= current is a no-op
    assert(Masking.vacuumPolicyLog(log, "t", keep = 3) == 0)
    // the next mutation still lands as version 13 (max + 1, gapless
    // going forward) and the read-modify-write sees the survivors
    Masking.setMask(spark, log, "t", "seg", "'final'")
    assert(entries().last.endsWith(f"${13L}%020d.json"))
    assert(Masking.policy(log, "t").masks
      .find(_.column == "seg").get.expr == "'final'")
    // a torn NEWEST entry after vacuum still fails closed
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(entries().last), "{\"masks\": [ TORN")
    val e = intercept[LakeValidationException] {
      Masking.readMasked(spark, log, "t", "analyst").count()
    }
    assert(e.getMessage.contains("fail-closed"))
  }

  test("row-filter and view mini-logs vacuum the same way") {
    val log = setup()
    (1 to 5).foreach(i =>
      RowFilter.setFilter(spark, log, "t", s"bal > $i.0"))
    assert(RowFilter.vacuumPolicyLog(log, "t", keep = 2) == 3)
    // the governing filter is the newest (bal > 5.0): only row 1 passes
    assert(RowFilter.readFiltered(spark, log, "t", "analyst").count() == 1L)
    (1 to 5).foreach(i => graft.lake.Views.create(spark, log, s"v$i",
      s"SELECT id FROM t WHERE id >= $i", orReplace = true))
    val vBefore = Views.catalogVersion(log)
    assert(Views.vacuumCatalog(log, keep = 1) == 4)
    assert(Views.catalogVersion(log) == vBefore,
      "vacuum must not move the catalog version (cache fingerprint)")
    assert(Views.catalog(log).views.map(_.name) ==
      Seq("v1", "v2", "v3", "v4", "v5"))
    Views.drop(spark, log, "v5")
    assert(Views.catalogVersion(log) == vBefore + 1)
  }
}
