package graft.api

import graft.lake.LakeLog

/** Snapshot-keyed query result cache — the control-plane feature every
  * serving lakehouse front-end carries (Databricks/Snowflake result
  * cache): repeated dashboard queries answer from memory as long as the
  * data hasn't moved, and ANY commit invalidates by construction rather
  * than by TTL guesswork.
  *
  * The key is (normalized SQL, snapshot fingerprint), where the
  * fingerprint is every table's latest version — so a cached result can
  * NEVER be stale: any commit to any table changes the fingerprint and
  * the next read recomputes. That is deliberately over-invalidating
  * (a commit to an unrelated table also misses); exact per-statement
  * table-reference tracking would narrow it, but staleness is a
  * correctness bug while over-invalidation is only a missed
  * optimization — the conservative key is the right default. Snapshot
  * reads being pure functions of (SQL, versions) is exactly the
  * property the lake's OCC log guarantees.
  *
  * Only statements the caller declares CACHEABLE should go through
  * [[getOrCompute]] (the REST face routes SELECT/WITH here and sends
  * DML around it). Entries are LRU-bounded; hit/miss counters feed the
  * metrics endpoint. Scale note: this caches RESULT rows (dashboards,
  * top-k, aggregates — the maxInlineRows-bounded REST shape), never
  * scan-sized data; the engine-side analog for big intermediates is
  * the lake itself (materialized views + snapshot reads).
  */
final class ResultCache[V](maxEntries: Int = 256) {

  private val lru =
    new java.util.LinkedHashMap[(String, String), V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), V]): Boolean =
        size() > maxEntries
    }
  private var hitCount = 0L
  private var missCount = 0L

  /** The invalidation key: every table's latest version. One log replay
    * of the version listings, no data read. */
  def fingerprint(log: LakeLog): String =
    log.listTables().sorted
      .map(t => s"$t=${log.latestVersion(t)}").mkString(",")

  /** Returns (value, hit). `compute` runs at most once per (sql,
    * fingerprint); the whole call is synchronized — result rows are
    * small by contract, and single-flight beats stampeding the engine
    * with duplicate dashboard queries. */
  def getOrCompute(sql: String, fingerprint: String)(compute: => V)
      : (V, Boolean) = synchronized {
    val k = (sql.trim, fingerprint)
    val cached = lru.get(k)
    if (cached != null) { hitCount += 1; (cached, true) }
    else {
      missCount += 1
      val v = compute
      lru.put(k, v)
      (v, false)
    }
  }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def entries: Int = synchronized(lru.size())
}
