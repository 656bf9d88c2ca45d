package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks the latest right row at-or-before each left time, per key") {
    val left = Seq(
      ("k1", 5L, "e1"), ("k1", 10L, "e2"), ("k1", 1L, "e0"),
      ("k2", 6L, "e3")
    ).toDF("key", "t", "name")
    val right = Seq(
      ("k1", 2L, 20.0), ("k1", 7L, 70.0), ("k1", 10L, 100.0),
      ("k2", 9L, 90.0)
    ).toDF("key", "t", "price")

    val out = AsOfJoin.asof(left, right, Seq("key"), "t", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet

    assert(out == Set(
      ("k1", 1L, "e0", null),      // nothing at or before t=1
      ("k1", 5L, "e1", 20.0),      // t=2 is latest <= 5
      ("k1", 10L, "e2", 100.0),    // equal time counts (<= semantics)
      ("k2", 6L, "e3", null)))     // k2's only right row is later
  }

  test("asof matches the naive range-join formulation on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
      .toDF("key", "t", "row_id")
    val right = (1 to 200).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, t)
      .toDF("key", "t", "v")

    val fast = AsOfJoin.asof(left, right, Seq("key"), "t", "t")
      .collect().map(r => r.getInt(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    // naive oracle: range join + keep max right t per left row
    val l = left.as("l"); val r = right.as("r")
    val naive = l.join(r,
        col("l.key") === col("r.key") && col("r.t") <= col("l.t"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("row_id").orderBy(col("r.t").desc_nulls_last)))
      .filter(col("rk") === 1)
      .collect().map(row => row.getAs[Int]("row_id") ->
        Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double])).toMap

    assert(fast == naive)
  }

  test("forward / nearest / tolerance match their naive formulations") {
    val rnd = new scala.util.Random(19)
    val left = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
      .toDF("key", "t", "row_id")
    val right = (1 to 200).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("key", "t", "v")
    val l = left.as("l"); val r = right.as("r")

    def naive(cond: Column, closest: Column): Map[Int, Option[Double]] =
      l.join(r, col("l.key") === col("r.key") && cond, "left")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("row_id")
            // second key: at equal distance the EARLIER right row wins,
            // i.e. the backward candidate — pandas' nearest tie rule
            .orderBy(closest, col("r.t").asc_nulls_last)))
        .filter(col("rk") === 1)
        .collect().map(row => row.getAs[Int]("row_id") ->
          Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double])).toMap
    def fast(direction: String, tol: Option[Column] = None) =
      AsOfJoin.asof(left, right, Seq("key"), "t", "t",
          direction = direction, tolerance = tol)
        .collect().map(r => r.getInt(2) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    // forward: smallest right t >= left t
    assert(fast("forward") ==
      naive(col("r.t") >= col("l.t"), col("r.t").asc_nulls_last))
    // nearest: min |distance|, ties -> backward (the <= in the naive sort
    // expression encodes that: at equal distance the earlier right sorts
    // first via the second key)
    assert(fast("nearest") ==
      naive(lit(true),
        abs(col("r.t") - col("l.t")).asc_nulls_last))
    // backward with tolerance 50: matches older than 50 ticks become NULL
    assert(fast("backward", Some(lit(50L))) ==
      naive(col("r.t") <= col("l.t") && col("r.t") >= col("l.t") - 50,
        col("r.t").desc_nulls_last))
    // forward with tolerance 50
    assert(fast("forward", Some(lit(50L))) ==
      naive(col("r.t") >= col("l.t") && col("r.t") <= col("l.t") + 50,
        col("r.t").asc_nulls_last))
    // nearest with tolerance 50: min |distance| within the bound, ties
    // -> backward (earlier right) via the naive second sort key
    assert(fast("nearest", Some(lit(50L))) ==
      naive(abs(col("r.t") - col("l.t")) <= 50,
        abs(col("r.t") - col("l.t")).asc_nulls_last))
  }

  test("asof carries the matched right row atomically when payload has NULLs") {
    val left = Seq(("k", 10L, "e")).toDF("key", "t", "name")
    // latest right row at t=7 has a NULL in one payload column: the output
    // must be (NULL, 7.7) from that row — not mix a=1.0 from the older row
    val right = Seq(
      ("k", 3L, java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(1.1)),
      ("k", 7L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(7.7))
    ).toDF("key", "t", "a", "b")

    val row = AsOfJoin.asof(left, right, Seq("key"), "t", "t").collect().head
    assert(row.isNullAt(row.fieldIndex("a")))
    assert(row.getDouble(row.fieldIndex("b")) == 7.7)
  }

  test("asof plan has no nested-loop join — one shuffle, window carry") {
    val left = Seq(("k", 1L, "x")).toDF("key", "t", "name")
    val right = Seq(("k", 1L, 1.0)).toDF("key", "t", "v")
    val plan = AsOfJoin.asof(left, right, Seq("key"), "t", "t")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
