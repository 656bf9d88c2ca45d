package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native VecDotProduct vs the higher-order-function reference
  * implementation: identical results in both codegen and interpreted paths.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotNative matches HOF dot on float arrays, incl nulls and empties") {
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(3)
    val rows = (0 until 100).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat),
        Array.fill(32)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("id", "a", "b")
    val both = df.select(col("id"),
        VectorExpressions.dotNative(col("a"), col("b")).as("native"),
        VectorFunctions.dot(col("a"), col("b")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9) }

    // null propagation
    val withNull = Seq((1L, null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("id", "a", "b")
      .select(VectorExpressions.dotNative(col("a"), col("b")).as("d"))
    assert(withNull.collect().head.isNullAt(0))

    // empty arrays → 0.0
    val empty = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
      .select(VectorExpressions.dotNative(col("a"), col("b")).as("d"))
    assert(empty.collect().head.getDouble(0) == 0.0)

    // double arrays and SQL surface
    val dbl = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    dbl.createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT graft_vec_dot(a, b) FROM vecs")
      .collect().head.getDouble(0) == 32.0)
  }

  test("normNative matches the HOF normalize bit-for-bit, incl zero vecs") {
    VectorExpressions.register(spark)
    // the pre-kernel formulation, kept here as the reference semantics
    def hofNormalize(a: org.apache.spark.sql.Column) = {
      val n = VectorFunctions.l2Norm(a)
      when(n === 0.0, a).otherwise(transform(a, x => x.cast("double") / n))
    }
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))) :+
      (100L, Array.fill(64)(0.0f)) // all-zero: must pass through, not NaN
    val both = rows.toDF("id", "a")
      .select(col("id"),
        VectorExpressions.normNative(col("a")).as("native"),
        hofNormalize(col("a")).as("hof"))
      .collect()
    both.foreach { r =>
      val n = r.getSeq[Double](1); val h = r.getSeq[Double](2)
      assert(n.length == h.length)
      // bit-for-bit: the kernel replays the exact cast/sum/divide order
      n.zip(h).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y), s"id=${r.getLong(0)}") }
    }
    // double input and unit norm
    val d = Seq(Tuple1(Array(3.0, 4.0))).toDF("a")
      .select(VectorExpressions.normNative(col("a")).as("n")).collect()
    assert(d.head.getSeq[Double](0) == Seq(0.6, 0.8))
    // null propagates
    val nn = Seq(Tuple1(null.asInstanceOf[Array[Double]])).toDF("a")
      .select(VectorExpressions.normNative(col("a")).as("n")).collect()
    assert(nn.head.isNullAt(0))
  }

  test("native normalize keeps the projection in whole-stage codegen") {
    VectorExpressions.register(spark)
    // no HOFs in the fixture: a transform() lambda would itself pin the
    // projection out of codegen regardless of the kernel under test
    val df = spark.range(3)
      .select(col("id"),
        array((1 to 4).map(i => (col("id") + i).cast("double")): _*).as("a"))
      .select(col("id"), VectorExpressions.normNative(col("a")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_vec_norm") && l.trim.startsWith("*(")), plan)
  }

  test("generated code for all three kernels actually COMPILES") {
    // The '*(n)' plan check above is necessary but not sufficient: Janino
    // compiles the generated source at EXECUTION time, and a compile error
    // there silently falls back to interpreted eval (the plan string never
    // changes). codegen.fallback=false turns that silent downgrade into a
    // test failure — this caught a wrong package path in VecNormalize's
    // doGenCode that every plan-level assertion missed.
    VectorExpressions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(4)
        .select(col("id"),
          array((1 to 4).map(i => (col("id") + i).cast("double")): _*).as("a"),
          array((1 to 4).map(i => (col("id") * i).cast("float")): _*).as("b"),
          array(col("id") * 7 + 3, col("id") + 1).as("fp1"),
          array(col("id") * 11 + 5, col("id") + 2).as("fp2"))
        .select(
          VectorExpressions.normNative(col("a")).as("n"),
          VectorExpressions.dotNative(col("a"), col("b")).as("d"),
          VectorExpressions.maskJaccard(col("fp1"), col("fp2")).as("j"))
      val rows = df.collect()
      assert(rows.length == 4 && !rows.head.isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native dot is used inside whole-stage codegen") {
    VectorExpressions.register(spark)
    // spark.range keeps a real physical plan (a literal Seq const-folds into
    // a LocalRelation with no codegen stage at all)
    val df = spark.range(3)
      .select(col("id"),
        transform(sequence(lit(0), lit(4)), i => (col("id") + i).cast("double"))
          .as("a"))
      .select(col("id"), VectorExpressions.dotNative(col("a"), col("a")).as("d"))
    // '*(n)' prefixes mark WholeStageCodegen stages in the plan string; the
    // node evaluating graft_vec_dot must carry one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_vec_dot") && l.trim.startsWith("*(")), plan)
    // id=0 → [0,1,2,3,4] → Σx² = 30
    assert(df.orderBy("id").collect().head.getDouble(1) == 30.0)
  }
}
