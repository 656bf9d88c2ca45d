package graft

import org.apache.spark.sql.functions._

/** SparkEntry.benchPhases duplicates each split query's build/probe logic
  * so Bench can time the phases apart — which creates drift risk: an edit
  * to the bundled `queries` entry that forgets the phases twin would make
  * the bench silently time something else. This pins build();probe() ==
  * the bundled query, row for row, on the smallest fixture.
  */
class BenchPhasesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle entry names a real query (no orphan oracles)") {
    // an oracleSql key without a queries twin would silently never be
    // checked by the gate (Verify only dumps queries)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles with no query: $orphans")
  }

  test("every benchPhases entry reproduces its bundled query exactly") {
    val phases = SparkEntry.benchPhases
    assert(phases.keySet.subsetOf(SparkEntry.queries.keySet))
    phases.foreach { case (name, mk) =>
      val (build, probe) = mk(spark, sfDir)
      build()
      val split = probe().collect().map(_.toString).sorted
      val bundled = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted
      assert(split.sameElements(bundled),
        s"$name: phase-split result drifted from the bundled query " +
          s"(${split.length} vs ${bundled.length} rows)")
    }
  }
}
