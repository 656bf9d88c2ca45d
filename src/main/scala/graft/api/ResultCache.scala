package graft.api

import graft.lake.{LakeLog, Refs}

/** Snapshot-keyed query result cache — the control-plane feature every
  * serving lakehouse front-end carries (Databricks/Snowflake result
  * cache): repeated dashboard queries answer from memory as long as the
  * data hasn't moved, and ANY commit invalidates by construction rather
  * than by TTL guesswork.
  *
  * The key is (normalized SQL, snapshot fingerprint), where the
  * fingerprint is every table's latest version PLUS its refs state
  * (name→version→kind for every tag/branch) — so a cached result can
  * NEVER be stale: any commit to any table changes the version part,
  * and any ref mutation (MOVE BRANCH, CREATE/DROP TAG — which change
  * what `VERSION AS OF '<name>'` and `DESCRIBE REFS` answer WITHOUT a
  * commit) changes the refs part, and any view DDL (CREATE [OR
  * REPLACE] / DROP VIEW — which changes what a SELECT over the view
  * returns, also commitless) bumps the view-catalog version. That is deliberately over-
  * invalidating (a commit to an unrelated table also misses); exact
  * per-statement table-reference tracking would narrow it, but
  * staleness is a correctness bug while over-invalidation is only a
  * missed optimization — the conservative key is the right default.
  * Snapshot reads being pure functions of (SQL, versions, refs) is
  * exactly the property the lake's OCC log + atomic ref files
  * guarantee.
  *
  * Only statements the caller declares CACHEABLE should go through
  * [[getOrCompute]] (the REST face routes SELECT/WITH here and sends
  * DML around it). Entries are LRU-bounded; hit/miss counters feed the
  * metrics endpoint. Single-flight is PER KEY: concurrent identical
  * queries compute once, but an unrelated slow miss never blocks other
  * statements' hits (the global lock guards only map operations, never
  * a Spark job). Scale note: this caches RESULT rows (dashboards,
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
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.CompletableFuture[V]]()
  private var hitCount = 0L
  private var missCount = 0L

  /** The invalidation key: every table's latest version and its full
    * refs state. One log replay of the version listings plus one
    * ref-file listing per table — metadata-sized, no data read. Refs
    * are fingerprinted by (name, version, kind, created_ms): created_ms
    * makes even drop-and-recreate-at-the-same-version distinguishable,
    * so a cached DESCRIBE REFS can never serve a predecessor's row. */
  def fingerprint(log: LakeLog): String = {
    val tables = log.listTables().sorted.map { t =>
      val refs = Refs.list(log, t)
        .map(r => s"${r.name}@${r.version}:${r.kind}:${r.created_ms}")
        .mkString("[", ";", "]")
      s"$t=${log.latestVersion(t)}$refs"
    }.mkString(",")
    // view DDL mutates what a SELECT means without any table commit —
    // the same commitless-staleness class as branch moves; the catalog
    // mini-log version folds it into the key
    s"$tables|views=${graft.lake.Views.catalogVersion(log)}"
  }

  /** Returns (value, hit). `compute` runs at most once per (sql,
    * fingerprint) — concurrent callers of the SAME key wait for the one
    * computation (and count as hits); callers of OTHER keys proceed
    * independently. A failed compute propagates to every waiter and
    * caches nothing. */
  def getOrCompute(sql: String, fingerprint: String)(compute: => V)
      : (V, Boolean) = {
    val k = (sql.trim, fingerprint)
    val cached = synchronized {
      val c = lru.get(k)
      if (c != null) hitCount += 1
      c
    }
    if (cached != null) return (cached, true)
    val mine = new java.util.concurrent.CompletableFuture[V]()
    val theirs = inFlight.putIfAbsent(k, mine)
    if (theirs != null) {
      // another caller is computing this exact key: wait on THEIR job
      val v = try theirs.join()
      catch { case e: java.util.concurrent.CompletionException =>
        throw Option(e.getCause).getOrElse(e)
      }
      synchronized { hitCount += 1 }
      (v, true)
    } else {
      try {
        val v = compute
        synchronized { missCount += 1; lru.put(k, v) }
        mine.complete(v)
        (v, false)
      } catch {
        case e: Throwable => mine.completeExceptionally(e); throw e
      } finally inFlight.remove(k)
    }
  }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def entries: Int = synchronized(lru.size())
}
