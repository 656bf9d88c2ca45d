package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RefsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  private def setup(): LakeLog = {
    val log = new LakeLog(tmpDir("refs"))
    LakeTable.createTable(log, "t", schema)
    LakeTable.insert(spark, log, "t",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))           // v1
    LakeTable.insert(spark, log, "t",
      Seq((3L, "c")).toDF("id", "v"))                      // v2
    log
  }

  test("tags pin versions; reads resolve through them") {
    val log = setup()
    val r = Refs.createTag(log, "t", "rel-1", 1L)
    assert(r.version == 1L)
    assert(Refs.resolveOrThrow(log, "t", "rel-1").version == 1L)
    assert(LakeTable.read(spark, log, "t",
      Refs.resolveOrThrow(log, "t", "rel-1").version).count() == 2)
    assert(Refs.list(log, "t").map(_.name) == Seq("rel-1"))
    assert(Refs.taggedVersions(log, "t") == Set(1L))
  }

  test("tags are immutable, validated, droppable") {
    val log = setup()
    Refs.createTag(log, "t", "rel-1", 1L)
    intercept[LakeValidationException] { // immutable
      Refs.createTag(log, "t", "rel-1", 2L)
    }
    intercept[LakeValidationException] { // version 0 = latest-sentinel
      Refs.createTag(log, "t", "zero", 0L)
    }
    intercept[LakeValidationException] { // uncommitted version
      Refs.createTag(log, "t", "future", 99L)
    }
    intercept[LakeValidationException] { // bad name
      Refs.createTag(log, "t", "no/slash", 1L)
    }
    Refs.dropTag(log, "t", "rel-1")
    assert(Refs.resolve(log, "t", "rel-1").isEmpty)
    intercept[LakeValidationException] { Refs.dropTag(log, "t", "rel-1") }
  }

  test("a tagged version's files survive VACUUM past retention") {
    val log = setup()
    LakeTable.insert(spark, log, "t",
      Seq((4L, "d")).toDF("id", "v"))                      // v3: 3rd file
    Refs.createTag(log, "t", "keep", 2L)
    // compaction RETIRES the small files (rewrites all three into one,
    // ≥3-file grouping floor), pushing them out of every later
    // snapshot — vacuum's reclaim set
    LakeTable.compact(spark, log, "t", force = true)
    LakeTable.vacuum(log, "t", retainVersions = 1)
    // the tagged snapshot must still read in full despite RETAIN 1
    assert(LakeTable.read(spark, log, "t", 2L).count() == 3)
    // after dropping the tag, vacuum reclaims the retired files
    Refs.dropTag(log, "t", "keep")
    LakeTable.vacuum(log, "t", retainVersions = 1)
    val v2Files = log.snapshot("t", 2L).files.map(_.path)
    assert(v2Files.exists(p => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))),
      "untagged out-of-retention files should be reclaimed")
    // the latest snapshot is untouched throughout
    assert(LakeTable.read(spark, log, "t").count() == 4)
  }

  test("branches are movable pointers; tags refuse moves") {
    val log = setup()
    Refs.createBranch(log, "t", "prod", 1L)
    assert(Refs.resolveOrThrow(log, "t", "prod").version == 1L)
    assert(Refs.resolveOrThrow(log, "t", "prod").kind == Refs.Branch)
    // promotion: the pointer advances only when the operator says so
    Refs.moveBranch(log, "t", "prod", 2L)
    assert(Refs.resolveOrThrow(log, "t", "prod").version == 2L)
    // a tag cannot move
    Refs.createTag(log, "t", "rel", 1L)
    intercept[LakeValidationException] { Refs.moveBranch(log, "t", "rel", 2L) }
    // a branch cannot be re-created over itself
    intercept[LakeValidationException] { Refs.createBranch(log, "t", "prod", 1L) }
    // moves validate the target version like creation does
    intercept[LakeValidationException] { Refs.moveBranch(log, "t", "prod", 99L) }
    // both kinds pin vacuum
    assert(Refs.pinnedVersions(log, "t") == Set(1L, 2L))
  }

  test("SQL face: branches — CREATE / MOVE / read-through / DROP") {
    val log = setup()
    def sql(q: String) = graft.api.LakeSql.execute(spark, log, q)
    sql("ALTER TABLE t CREATE BRANCH prod AS OF VERSION 1")
    assert(sql("SELECT count(*) AS n FROM t VERSION AS OF 'prod'")
      .collect().head.getLong(0) == 2L)
    sql("ALTER TABLE t MOVE BRANCH prod TO VERSION 2")
    assert(sql("SELECT count(*) AS n FROM t VERSION AS OF 'prod'")
      .collect().head.getLong(0) == 3L)
    val refs = sql("DESCRIBE REFS t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq == Seq(("prod", "branch", 2L)))
    sql("ALTER TABLE t DROP BRANCH prod")
    assert(Refs.list(log, "t").isEmpty)
  }

  test("SQL face: CREATE TAG / tag time travel / DESCRIBE REFS / DROP") {
    val log = setup()
    val spark2 = spark
    graft.api.LakeSql.execute(spark2, log,
      "ALTER TABLE t CREATE TAG rel-1 AS OF VERSION 1")
    val n = graft.api.LakeSql.execute(spark2, log,
      "SELECT count(*) AS n FROM t VERSION AS OF 'rel-1'")
      .collect().head.getLong(0)
    assert(n == 2L)
    val refs = graft.api.LakeSql.execute(spark2, log, "DESCRIBE REFS t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq == Seq(("rel-1", "tag", 1L)))
    intercept[LakeValidationException] { // unknown tag fails loudly
      graft.api.LakeSql.execute(spark2, log,
        "SELECT count(*) FROM t VERSION AS OF 'nope'").collect()
    }
    graft.api.LakeSql.execute(spark2, log, "ALTER TABLE t DROP TAG rel-1")
    assert(Refs.list(log, "t").isEmpty)
  }
}
