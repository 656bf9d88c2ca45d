package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.LakeSql

/** GENERATED ALWAYS AS columns: computed when absent, validated when
  * provided, usable as partition columns, and guarded against UPDATE /
  * rename / drop that would silently break the derivation.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (LakeLog, String) = {
    val log = new LakeLog(tmpDir("gen"))
    LakeSql.execute(spark, log,
      "CREATE TABLE t (id int64, ts int64, " +
        "day int64 GENERATED ALWAYS AS (cast(ts / 86400 as bigint))) " +
        "PARTITIONED BY (day)")
    (log, "t")
  }

  test("absent generated column is computed; partitions land correctly") {
    val (log, t) = fresh()
    val df = Seq((1L, 1000L), (2L, 90000L), (3L, 200000L))
      .toDF("id", "ts")
    LakeTable.insert(spark, log, t, df)
    val got = LakeTable.read(spark, log, t).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // one partition value per file group in the log
    assert(log.snapshot(t).files.map(_.partition("day")).toSet ==
      Set("0", "1", "2"))
  }

  test("provided generated column is validated: forgery rejects the batch") {
    val (log, t) = fresh()
    LakeTable.insert(spark, log, t,
      Seq((1L, 1000L, 0L)).toDF("id", "ts", "day")) // consistent: ok
    val v = log.latestVersion(t)
    intercept[LakeValidationException] {
      LakeTable.insert(spark, log, t,
        Seq((2L, 1000L, 99L)).toDF("id", "ts", "day")) // forged
    }
    assert(log.latestVersion(t) == v)
    assert(LakeTable.read(spark, log, t).count() == 1)
  }

  test("filter on the generated partition column prunes from the log") {
    val (log, t) = fresh()
    LakeTable.insert(spark, log, t,
      (0L until 30L).map(i => (i, i * 86400L + 5L)).toDF("id", "ts"))
    val q = LakeTable.readIndexed(spark, log, t).filter(col("day") === 7)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L))
    val m = graft.Metrics.measure("gen-prune", q)
    assert(m.filesPruned > 0)
  }

  test("guards: UPDATE of generated/source columns, rename, drop, chains") {
    val (log, t) = fresh()
    LakeTable.insert(spark, log, t, Seq((1L, 1000L)).toDF("id", "ts"))
    intercept[LakeValidationException] {
      LakeTable.updateWhere(spark, log, t, "id = 1", Seq("day" -> "5"))
    }
    intercept[LakeValidationException] {
      LakeTable.updateWhere(spark, log, t, "id = 1", Seq("ts" -> "0"))
    }
    intercept[LakeValidationException] {
      log.renameColumn(t, "ts", "stamp", "g1") // generation source
    }
    intercept[LakeValidationException] { log.dropColumn(t, "ts", "g2") }
    // updating an unrelated column still works
    assert(LakeTable.updateWhere(spark, log, t, "id = 1",
      Seq("id" -> "10")).rowsUpdated == 1)
    // chained generation is rejected at declaration
    intercept[LakeValidationException] {
      log.createTable("chain", TableSchema(
        Seq(Field("a", "int64"), Field("b", "int64"), Field("c", "int64")),
        generated_columns = Some(Map("b" -> "a + 1", "c" -> "b + 1"))))
    }
  }

  test("upsert and replaceWhere compute the generated column too") {
    val (log, t) = fresh()
    LakeTable.insert(spark, log, t,
      Seq((1L, 1000L), (2L, 90000L)).toDF("id", "ts"))
    LakeTable.upsert(spark, log, t,
      Seq((2L, 200000L), (3L, 1000L)).toDF("id", "ts"), "id")
    val got = LakeTable.read(spark, log, t).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 0L))
    LakeTable.replaceWhere(spark, log, t, "day = 0",
      Seq((9L, 2000L)).toDF("id", "ts"))
    val after = LakeTable.read(spark, log, t).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(after == Map(9L -> 0L, 2L -> 2L))
  }
}
