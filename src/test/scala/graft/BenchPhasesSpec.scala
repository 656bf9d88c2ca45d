package graft

/** Consistency pins around SparkEntry's query/oracle/benchPhases maps.
  * The bundled `queries` entries for split queries are now DERIVED from
  * benchPhases (`build(); probe()`), so face drift is impossible by
  * construction — what remains worth pinning is that every split entry
  * has a query twin, actually runs standalone, and returns rows.
  */
class BenchPhasesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle entry names a real query (no orphan oracles)") {
    // an oracleSql key without a queries twin would silently never be
    // checked by the gate (Verify only dumps queries)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles with no query: $orphans")
  }

  test("every benchPhases entry has a query twin and probes non-empty") {
    val phases = SparkEntry.benchPhases
    assert(phases.keySet.subsetOf(SparkEntry.queries.keySet))
    phases.foreach { case (name, mk) =>
      val (build, probe) = mk(spark, sfDir)
      build()
      assert(probe().count() > 0, s"$name: probe returned no rows")
    }
  }
}
