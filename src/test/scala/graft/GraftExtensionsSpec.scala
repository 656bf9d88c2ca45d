package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The extensions path needs its own SparkSession (extensions apply only at
  * session construction), so this spec manages one in isolation instead of
  * using the shared fixture.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers SQL kernels") {
    // getOrCreate returns the active OR default session if one exists (and
    // would skip applying extensions) — clear both, restore afterwards
    val activeBefore = SparkSession.getActiveSession
    val defaultBefore = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // the config-string form is a STATIC conf — honored only when this
    // builder also creates the SparkContext (true standalone, not when an
    // earlier suite made one). withExtensions covers the shared-context
    // case; both paths exercise the same GraftExtensions.apply.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val dot = spark.sql(
        "SELECT graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .collect().head.getDouble(0)
      assert(dot == 11.0)
      val jac = spark.sql(
        "SELECT graft_mask_jaccard(array(3L), array(1L))")
        .collect().head.getDouble(0)
      assert(jac == 0.5) // {bits 0,1} vs {bit 0}
    } finally {
      defaultBefore.foreach(SparkSession.setDefaultSession)
      activeBefore.foreach(SparkSession.setActiveSession)
      if (defaultBefore.isEmpty && activeBefore.isEmpty) {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
  }
}
