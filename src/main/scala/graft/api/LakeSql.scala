package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.lake.{Field, LakeLog, LakeTable, TableSchema}

/** SQL statement dispatcher over lake tables — the DML/utility face the
  * reference's mocked `/query` endpoint gestures at. [[SqlApi.queryLake]]
  * covers reads (full ANSI SQL through Catalyst); this adds the
  * table-mutating statements a lakehouse user expects to type, each routed
  * to the corresponding lake operation (all the ACID/OCC machinery
  * applies):
  *
  *   CREATE TABLE t (c type, ...) [PARTITIONED BY (c, ...)]
  *   INSERT INTO t SELECT ...                (source: any lake tables)
  *   INSERT INTO t REPLACE WHERE <pred> SELECT ...
  *                                           (atomic predicate-scoped
  *                                            overwrite — Delta's
  *                                            replaceWhere backfill)
  *   MERGE INTO t USING (SELECT ...) ON key  (keyed upsert: matched rows
  *                                            replaced, new rows
  *                                            inserted — updateAll/
  *                                            insertAll semantics)
  *   SELECT ... FROM t VERSION AS OF v ...   (time-travel read; clause
  *                                            stripped, version routed to
  *                                            the snapshot resolver)
  *   SELECT ... FROM t TIMESTAMP AS OF 'ts'  (timestamp time travel —
  *                                            resolved to the newest
  *                                            version committed ≤ ts via
  *                                            binary search over the
  *                                            log's commit timestamps)
  *   UPDATE t SET c = expr, ... WHERE <pred> (copy-on-write row update;
  *                                            stat-pruned file rewrite,
  *                                            one OCC commit)
  *   RESTORE TABLE t TO TIMESTAMP AS OF 'ts'
  *   DELETE FROM t WHERE <pred>              (merge-on-read deletion
  *                                            vectors; a leading COW hint
  *                                            block — "DELETE" then
  *                                            slash-star + COW star-slash
  *                                            then "FROM" — forces the
  *                                            copy-on-write rewrite)
  *   ALTER TABLE t ADD COLUMN c type         (nullable schema evolution)
  *   APPLY CHANGES INTO dim FROM (SELECT ...) KEY k TRACK (a, b) AT n
  *                                           (SCD Type 2 batch — changed
  *                                            keys close + reopen at the
  *                                            integer effective time n;
  *                                            graft.lake.Scd)
  *   ALTER TABLE t SET PARTITIONED BY (c, ...)
  *                                           (partition-spec evolution —
  *                                            metadata-only; empty parens
  *                                            return future writes to a
  *                                            flat layout)
  *   OPTIMIZE t [WHERE <pred>] [ZORDER BY (c, ...)] [CURVE hilbert]
  *                                           (forced compaction; WHERE
  *                                            scopes it to the files the
  *                                            predicate can touch — the
  *                                            "optimize one partition"
  *                                            form; CURVE picks the
  *                                            clustering curve — morton
  *                                            default, hilbert any arity)
  *   VACUUM t [RETAIN n VERSIONS]
  *   RESTORE TABLE t TO VERSION AS OF v
  *   DESCRIBE HISTORY t  /  DESCRIBE DETAIL t
  *   ALTER TABLE t CREATE TAG name AS OF VERSION v
  *                                           (immutable named ref —
  *                                            graft.lake.Refs; pinned
  *                                            versions survive VACUUM)
  *   ALTER TABLE t CREATE BRANCH name AS OF VERSION v
  *   ALTER TABLE t MOVE BRANCH name TO VERSION v
  *                                           (movable promotion pointer —
  *                                            `prod` rides validated
  *                                            versions, never raw head)
  *   ALTER TABLE t DROP TAG|BRANCH name
  *   DESCRIBE REFS t                         ((name, kind, version))
  *   CREATE MATERIALIZED VIEW m ON t [JOIN dim ON c] KEY k
  *     [SUM (a,..)] [MIN (b,..)] [MAX (c,..)]
  *                                           (incremental MV: count(*)
  *                                            implicit; definition
  *                                            persists beside the MV
  *                                            table — graft.lake
  *                                            .MaterializedView. The
  *                                            JOIN form aggregates the
  *                                            star join fact ⋈ dim:
  *                                            fact appends fold
  *                                            incrementally while the
  *                                            dim is unchanged; a dim
  *                                            commit forces a full
  *                                            recompute)
  *   REFRESH MATERIALIZED VIEW m             (incremental where the log
  *                                            allows, full otherwise;
  *                                            returns the mode + the
  *                                            folded version window)
  *   ALTER TABLE t SET MASK c AS (expr) [EXEMPT (role, ...)]
  *                                           (column masking policy —
  *                                            graft.lake.Masking; reads
  *                                            through readMasked rewrite
  *                                            c per caller role)
  *   ALTER TABLE t DROP MASK c
  *   SELECT ... FROM t VERSION AS OF 'name'  (time travel by REF — the
  *                                            quoted name resolves to
  *                                            its pinned version)
  *   CREATE [OR REPLACE] VIEW v AS SELECT ...
  *                                           (logical view — persisted
  *                                            SELECT macro in the
  *                                            `_views/` catalog
  *                                            mini-log, expanded at
  *                                            plan time; graft.lake
  *                                            .Views)
  *   DROP VIEW v / DESCRIBE VIEWS
  *   SELECT ... FROM TABLE_CHANGES('t', from[, to]) ...
  *                                           (Delta-style CDC reader:
  *                                            the (from, to] change
  *                                            feed — inserts + DV
  *                                            deletes tagged
  *                                            _change_type — usable
  *                                            anywhere a table can
  *                                            appear in the SELECT;
  *                                            non-expressible CoW
  *                                            windows refuse loudly)
  *   SELECT ... FROM TABLE_DIFF('t', from, to, 'key[,key2]') ...
  *                                           (keyed row-level diff:
  *                                            insert/delete/update
  *                                            classification, valid on
  *                                            ANY window incl. CoW
  *                                            rewrites)
  *   BEGIN TRANSACTION 'id'; INSERT INTO t1 SELECT ...;
  *     INSERT INTO t2 SELECT ...; COMMIT|ROLLBACK
  *                                           (cross-table atomic txn:
  *                                            every INSERT stages via
  *                                            WAP, COMMIT decides +
  *                                            rolls forward through
  *                                            the presumed-abort 2PC —
  *                                            graft.lake.MultiTxn; all
  *                                            participants appear
  *                                            atomically or never.
  *                                            Replaying a committed id
  *                                            requires the EXACT same
  *                                            statement body — the
  *                                            replay guard hashes the
  *                                            trimmed statement text,
  *                                            so even a whitespace or
  *                                            case reformat of the
  *                                            script reads as a reused
  *                                            id and is refused;
  *                                            re-run crashed scripts
  *                                            byte-identical)
  *   anything else → [[SqlApi.queryLake]] (SELECT etc.)
  *
  * The type names in DDL are the lake's declared types (int32, int64,
  * float32, float64, string, boolean, date, timestamp, *_array). Utility
  * statements return one-row status DataFrames so every statement yields
  * a DataFrame. The grammar is deliberately small and regex-anchored —
  * it matches the Delta-style syntax for these operations, not a general
  * SQL parser (Catalyst remains the parser for everything relational).
  */
object LakeSql {

  private val Delete =
    """(?is)\s*DELETE\s+(/\*\+\s*COW\s*\*/\s+)?FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+(\w+)(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?(?:\s+CURVE\s+(\w+))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  // maintenance verbs for the sketch store and the governance mini-logs
  private val OptimizeSketch =
    """(?is)\s*OPTIMIZE\s+SKETCH\s+STORE\s+(\w+)\s+KEY\s+(\w+)\s*;?\s*""".r
  private val VacuumPolicies =
    ("""(?is)\s*VACUUM\s+POLICIES\s+ON\s+(\w+)""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""").r
  private val VacuumViews =
    ("""(?is)\s*VACUUM\s+VIEW\s+CATALOG""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""").r
  private val Restore =
    """(?is)\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTs =
    """(?is)\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val Update =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val History = """(?is)\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*""".r
  private val Detail = """(?is)\s*DESCRIBE\s+DETAIL\s+(\w+)\s*;?\s*""".r
  private val InsertReplace =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s+REPLACE\s+WHERE\s+(.+?)\s+(SELECT\s.+)""".r
  // keyed merge: WHEN MATCHED → replace the row, WHEN NOT MATCHED →
  // insert (Delta's updateAll/insertAll defaults — the only merge shape
  // [[LakeTable.upsert]] implements, so the grammar declares no clauses)
  private val MergeInto =
    """(?is)\s*MERGE\s+INTO\s+(\w+)\s+USING\s+\((.+)\)\s+ON\s+(\w+)\s*;?\s*""".r
  private val InsertInto =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s+(SELECT\s.+)""".r
  // full conditional MERGE (ordered WHEN clauses) — must be tried BEFORE
  // the plain MergeInto upsert form, whose regex requires the statement
  // to END at the key and so cannot swallow a WHEN tail
  private val MergeFull =
    ("""(?is)\s*MERGE\s+INTO\s+(\w+)\s+USING\s+\((.+)\)\s+ON\s+(\w+)""" +
      """\s+(WHEN\s+.+?)\s*;?\s*""").r
  private val WhenMatched =
    ("""(?is)\s*MATCHED(?:\s+AND\s*\((.+)\))?\s+THEN\s+""" +
      """(DELETE|UPDATE\s+SET\s+\*)\s*""").r
  private val WhenNotMatched =
    """(?is)\s*NOT\s+MATCHED(?:\s+AND\s*\((.+)\))?\s+THEN\s+INSERT\s+\*\s*""".r
  // Incremental materialized views by name: the definition persists as
  // `_mvdef.json` beside the MV's backing table, so REFRESH needs only
  // the name. Aggregate vocabulary mirrors MvDef: count(*) is implicit,
  // SUM/MIN/MAX clauses list covered columns.
  private val CreateMv =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+ON\s+(\w+)""" +
      """(?:\s+JOIN\s+(\w+)\s+ON\s+(\w+))?\s+""" +
      """KEY\s+([\w,\s]+?)(?:\s+SUM\s*\(([^)]*)\))?(?:\s+MIN\s*\(([^)]*)\))?""" +
      """(?:\s+MAX\s*\(([^)]*)\))?\s*;?\s*""").r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*;?\s*""".r
  // column masking policies: the EXEMPT form must be tried FIRST — the
  // greedy expr group in the plain form would otherwise swallow an
  // EXEMPT clause into the mask expression
  private val SetMaskExempt =
    ("""(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+MASK\s+(\w+)\s+AS\s*""" +
      """\((.+)\)\s+EXEMPT\s*\(([^)]*)\)\s*;?\s*""").r
  private val SetMask =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+MASK\s+(\w+)\s+AS\s*\((.+)\)\s*;?\s*""".r
  private val DropMask =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+MASK\s+(\w+)\s*;?\s*""".r
  // row-level security: same EXEMPT-first ordering rationale as masks
  private val SetRowFilterExempt =
    ("""(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+ROW\s+FILTER\s*""" +
      """\((.+)\)\s+EXEMPT\s*\(([^)]*)\)\s*;?\s*""").r
  private val SetRowFilter =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+ROW\s+FILTER\s*\((.+)\)\s*;?\s*""".r
  private val DropRowFilter =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+ROW\s+FILTER\s*;?\s*""".r
  // logical views: persisted SELECT macros in the `_views/` catalog
  // mini-log (graft.lake.Views) — expanded at plan time, zero storage
  private val CreateView =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropView = """(?is)\s*DROP\s+VIEW\s+(\w+)\s*;?\s*""".r
  private val DescViews = """(?is)\s*DESCRIBE\s+VIEWS\s*;?\s*""".r
  // CDC table-valued function inside any SELECT: TABLE_CHANGES('t', from
  // [, to]) — substituted with a registered change-feed temp view
  private val TableChangesRef =
    """(?i)TABLE_CHANGES\s*\(\s*'(\w+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r
  // keyed row-level diff between two versions (insert/delete/update
  // classification) — works on ANY window, including the CoW rewrites
  // TABLE_CHANGES must refuse: TABLE_DIFF('t', from, to, 'key[,key2]')
  private val TableDiffRef =
    ("""(?i)TABLE_DIFF\s*\(\s*'(\w+)'\s*,\s*(\d+)\s*,\s*(\d+)\s*,""" +
      """\s*'([\w,\s]+)'\s*\)""").r
  // multi-statement cross-table transaction: INSERT INTO statements
  // staged through the WAP path, decided + rolled forward by the
  // presumed-abort 2PC (graft.lake.MultiTxn) — all participants become
  // visible atomically at COMMIT, or never (ROLLBACK / crash pre-decide)
  private val TxnBlock =
    ("""(?is)\s*BEGIN\s+TRANSACTION\s+'([^'\s]+)'\s*;(.+;)\s*""" +
      """(COMMIT|ROLLBACK)\s*;?\s*""").r
  // SELECT-side time travel: `FROM t VERSION AS OF v` (any table
  // reference position). The clause is stripped and the version is
  // routed to [[SqlApi.queryLake]]'s per-table version map; one version
  // per table per statement.
  private val VersionRef =
    """(?i)\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  // `FROM t TIMESTAMP AS OF '2026-08-14 10:00:00'` (or epoch millis) —
  // resolved to a version via the log's commit timestamps, then routed
  // exactly like VERSION AS OF
  private val TimestampRef =
    """(?i)\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r

  /** '2026-08-14 10:00:00[.fff]', '2026-08-14' or raw epoch millis →
    * epoch millis (session-local time, same clock the log stamps). */
  private[graft] def parseTsMs(s: String): Long = {
    val t = s.trim
    if (t.matches("\\d{13,}")) t.toLong
    else if (t.matches("\\d{4}-\\d{2}-\\d{2}"))
      java.sql.Timestamp.valueOf(t + " 00:00:00").getTime
    else java.sql.Timestamp.valueOf(t).getTime
  }

  /** Split on TOP-LEVEL commas only (paren depth tracked). */
  private[graft] def splitTopCommas(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => parts += cur.result(); cur.clear()
      case c =>
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        cur += c
    }
    parts += cur.result()
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Positions inside string literals (single- OR double-quoted; doubled-
    * quote AND backslash escapes honored — Spark's default lexer with
    * `escapedStringLiterals=false` accepts both, so `'a\';b'` is ONE
    * literal whose semicolon must not split a txn block), `--` line
    * comments, or bracketed slash-star comments (nesting honored —
    * Spark's lexer nests them; an unterminated bracket marks through to
    * the end, failing safe).
    * The TVF substitutions and the txn-block splitter consult this so
    * SQL text inside a literal or comment is never rewritten or treated
    * as a statement boundary — a raw regex over the whole statement
    * would rewrite `'...TABLE_CHANGES(...)...'` (silently altering the
    * literal's value) and a bare `split(";")` would fragment an INSERT
    * whose SELECT carries a semicolon in a string. */
  private[graft] def literalSpans(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        in(i) = true
        var k = i + 1
        var open = true
        while (open && k < s.length) {
          in(k) = true
          if (s.charAt(k) == '\\') {
            // backslash escape: the escaped char (delimiter included)
            // stays inside; a trailing lone backslash leaves the literal
            // open, marking through to the end (fail-safe)
            if (k + 1 < s.length) in(k + 1) = true
            k += 2
          } else if (s.charAt(k) == c) {
            if (k + 1 < s.length && s.charAt(k + 1) == c) {
              in(k + 1) = true; k += 2 // doubled-quote escape stays inside
            } else open = false
          } else k += 1
        }
        i = k + 1
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') { in(i) = true; i += 1 }
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        in(i) = true; in(i + 1) = true
        var depth = 1
        var k = i + 2
        while (depth > 0 && k < s.length) {
          in(k) = true
          if (s.charAt(k) == '/' && k + 1 < s.length &&
              s.charAt(k + 1) == '*') {
            in(k + 1) = true; depth += 1; k += 2
          } else if (s.charAt(k) == '*' && k + 1 < s.length &&
              s.charAt(k + 1) == '/') {
            in(k + 1) = true; depth -= 1; k += 2
          } else k += 1
        }
        i = k
      } else i += 1
    }
    in
  }

  /** All `re` matches whose START is outside string literals/comments.
    * (A match may itself CONTAIN a quoted argument — TABLE_CHANGES('t',…)
    * does — so the filter keys on the start position only.) */
  private def matchesOutsideLiterals(s: String, re: scala.util.matching.Regex)
      : List[scala.util.matching.Regex.Match] = {
    val in = literalSpans(s)
    re.findAllMatchIn(s).filter(m => !in(m.start)).toList
  }

  /** Replace exactly the matches [[matchesOutsideLiterals]] accepts. */
  private def replaceOutsideLiterals(s: String,
      re: scala.util.matching.Regex)(
      rep: scala.util.matching.Regex.Match => String): String = {
    val ms = matchesOutsideLiterals(s, re)
    if (ms.isEmpty) s
    else {
      val sb = new StringBuilder
      var pos = 0
      ms.foreach { m =>
        sb.append(s.substring(pos, m.start)).append(rep(m)); pos = m.end
      }
      sb.append(s.substring(pos))
      sb.result()
    }
  }

  /** Split on TOP-LEVEL semicolons only (string literals respected) —
    * the txn-block statement splitter. */
  private[graft] def splitTopSemis(s: String): Seq[String] = {
    val in = literalSpans(s)
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ';' && !in(i)) { parts += cur.result(); cur.clear() }
      else cur += c
      i += 1
    }
    parts += cur.result()
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** SQL-facing governance vacuums must keep ≥ 2 entries: a concurrent
    * cross-process reader resolves the mini-log's current version and
    * THEN opens that entry — keeping only the newest would let one
    * in-between mutation + vacuum delete the entry it already resolved.
    * Two survivors cover that one-commit race window; the library call
    * (PolicyLog.vacuum, keep ≥ 1) stays available for callers who own
    * the whole log. */
  private def requireGovernanceKeep(keep: Int): Unit =
    if (keep < 2)
      throw new graft.lake.LakeValidationException(
        s"RETAIN $keep VERSIONS would race concurrent policy readers — " +
          "governance vacuums keep at least 2 entries")

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Split `a = f(x, y), b = g(z)` on TOP-LEVEL commas only. */
  private[graft] def splitAssignments(s: String): Seq[(String, String)] =
    splitTopCommas(s).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad SET assignment: '$a'")
      (a.take(i).trim, a.drop(i + 1).trim)
    }
  private val CreateT =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s*\((.+?)\)\s*(?:PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val AlterAdd =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+(\w+)\s*;?\s*""".r
  private val AlterRename =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val Analyze =
    """(?is)\s*ANALYZE\s+TABLE\s+(\w+)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+COLUMNS\s*\(([^)]*)\))?\s*;?\s*""".r
  private val DescStats =
    """(?is)\s*DESCRIBE\s+STATS\s+(\w+)\s*;?\s*""".r
  private val AlterDrop =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r
  // SCD Type 2 maintenance (graft.lake.Scd) — the APPLY CHANGES INTO
  // verb (Databricks DLT's shape): batch rows close+reopen changed keys
  // at the integer effective time
  private val ApplyChanges =
    """(?is)\s*APPLY\s+CHANGES\s+INTO\s+(\w+)\s+FROM\s*\((.+)\)\s+KEY\s+(\w+)\s+TRACK\s*\(([^)]*)\)\s+AT\s+(\d+)\s*;?\s*""".r
  // partition-spec evolution (LakeLog.alterPartitioning): empty parens
  // drop the spec (future writes land flat)
  private val AlterPart =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+PARTITIONED\s+BY\s*\(([^)]*)\)\s*;?\s*""".r
  // Iceberg-style refs: immutable tags + movable branches over
  // versions (graft.lake.Refs)
  private val CreateTag =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+CREATE\s+TAG\s+([\w.-]+)\s+AS\s+OF\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val CreateBranch =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+CREATE\s+BRANCH\s+([\w.-]+)\s+AS\s+OF\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val MoveBranch =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+MOVE\s+BRANCH\s+([\w.-]+)\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val DropTag =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+(?:TAG|BRANCH)\s+([\w.-]+)\s*;?\s*""".r
  private val DescRefs =
    """(?is)\s*DESCRIBE\s+REFS\s+(\w+)\s*;?\s*""".r
  // `FROM t VERSION AS OF 'tag-name'` — a quoted ref resolves through
  // the table's tags to its pinned version, then routes like a numeric
  // VERSION AS OF
  private val TagRef =
    """(?i)\b(\w+)\s+VERSION\s+AS\s+OF\s+'([^']+)'""".r

  private def status(spark: SparkSession,
                     fields: (String, Any)*): DataFrame = {
    val st = StructType(fields.map { case (n, v) =>
      StructField(n, v match {
        case _: Long | _: Int => LongType
        case _: Boolean => BooleanType
        case _ => StringType
      })
    })
    val row = Row(fields.map {
      case (_, v: Int) => v.toLong
      case (_, v) => v
    }: _*)
    spark.createDataFrame(java.util.List.of(row), st)
  }

  /** Execute one statement; every statement returns a DataFrame. */
  def execute(spark: SparkSession, log: LakeLog, sql: String): DataFrame =
    sql match {
      case CreateT(table, colsSpec, partBy) =>
        val GenCol =
          """(?is)(\w+)\s+(\w+)\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*""".r
        var gens = Map.empty[String, String]
        val fields = splitTopCommas(colsSpec).map {
          case GenCol(n, t, e) =>
            gens += n -> e.trim
            Field(n, t.toLowerCase)
          case c =>
            val parts = c.split("\\s+")
            require(parts.length == 2, s"bad column spec: '$c'")
            Field(parts(0), parts(1).toLowerCase)
        }
        val partCols = Option(partBy).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        log.createTable(table, TableSchema(fields.toIndexedSeq,
          partition_columns = if (partCols.isEmpty) None else Some(partCols),
          generated_columns = if (gens.isEmpty) None else Some(gens)))
        status(spark, "table" -> table, "created" -> true,
          "version" -> 0L)
      case SetMaskExempt(table, column, maskExpr, roles) =>
        graft.lake.Masking.setMask(spark, log, table, column, maskExpr.trim,
          roles.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        status(spark, "table" -> table, "masked" -> column,
          "exempt" -> roles.trim)
      case SetMask(table, column, maskExpr) =>
        graft.lake.Masking.setMask(spark, log, table, column, maskExpr.trim)
        status(spark, "table" -> table, "masked" -> column, "exempt" -> "")
      case DropMask(table, column) =>
        graft.lake.Masking.dropMask(log, table, column)
        status(spark, "table" -> table, "unmasked" -> column)
      case SetRowFilterExempt(table, filterExpr, roles) =>
        graft.lake.RowFilter.setFilter(spark, log, table, filterExpr.trim,
          roles.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        status(spark, "table" -> table, "row_filter" -> filterExpr.trim,
          "exempt" -> roles.trim)
      case SetRowFilter(table, filterExpr) =>
        graft.lake.RowFilter.setFilter(spark, log, table, filterExpr.trim)
        status(spark, "table" -> table, "row_filter" -> filterExpr.trim,
          "exempt" -> "")
      case DropRowFilter(table) =>
        graft.lake.RowFilter.dropFilter(log, table)
        status(spark, "table" -> table, "row_filter" -> "")
      case CreateMv(name, base, dim, joinOn, key, sums, mins, maxs) =>
        def cols(s: String) = Option(s).toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
        // KEY accepts a comma list: first column is the upsert anchor,
        // the rest become the composite key's extra columns
        val keys = key.split(",").map(_.trim).filter(_.nonEmpty)
        val d = graft.lake.MaterializedView.MvDef(name, base, keys.head,
          cols(sums), cols(mins), cols(maxs),
          extraKeyCols = keys.tail.toSeq,
          joinTable = Option(dim), joinOn = Option(joinOn))
        graft.lake.MaterializedView.create(log, d)
        graft.lake.MaterializedView.saveDef(log, d)
        status(spark, "mv" -> name,
          "base" -> (base + Option(dim).fold("")(j => s" JOIN $j")),
          "key" -> key, "created" -> true)
      case RefreshMv(name) =>
        val d = graft.lake.MaterializedView.loadDef(log, name).getOrElse(
          throw new graft.lake.LakeValidationException(
            s"no materialized view '$name' (create it with CREATE " +
              "MATERIALIZED VIEW)"))
        val r = graft.lake.MaterializedView.refresh(spark, log, d)
        status(spark, "mv" -> name, "mode" -> r.mode,
          "from_version" -> r.fromVersion, "to_version" -> r.toVersion)
      case MergeFull(table, select, key, whenTail) =>
        val rows = SqlApi.queryLake(spark, log, select)
        // split the tail on WHEN boundaries and parse each clause in the
        // written order (first-clause-wins semantics downstream)
        val parts = whenTail.split("(?is)\\bWHEN\\b").toSeq
          .map(_.trim).filter(_.nonEmpty)
        var matchedClauses = Seq.empty[LakeTable.MergeClause]
        var insertWhen: Option[Option[String]] = None
        parts.foreach {
          case WhenNotMatched(cond) =>
            insertWhen = Some(Option(cond).map(_.trim))
          case WhenMatched(cond, act) =>
            val kind =
              if (act.trim.toUpperCase.startsWith("DELETE")) "delete"
              else "update"
            matchedClauses = matchedClauses :+
              LakeTable.MergeClause(kind, Option(cond).map(_.trim))
          case other => throw new graft.lake.LakeValidationException(
            s"cannot parse MERGE clause: WHEN $other")
        }
        val r = LakeTable.merge(spark, log, table, rows, key,
          matchedClauses, insertWhen)
        status(spark, "table" -> table, "key" -> key,
          "version" -> r.version, "updated" -> r.updated,
          "deleted" -> r.deleted, "inserted" -> r.inserted)
      case MergeInto(table, select, key) =>
        val rows = SqlApi.queryLake(spark, log, select)
        val r = LakeTable.upsert(spark, log, table, rows, key)
        status(spark, "table" -> table, "key" -> key,
          "version" -> r.version)
      case InsertReplace(table, pred, select) =>
        val rows = SqlApi.queryLake(spark, log, select)
        val r = LakeTable.replaceWhere(spark, log, table, pred.trim, rows)
        status(spark, "table" -> table,
          "files_replaced" -> r.filesReplaced.toLong,
          "rows_removed" -> r.rowsRemoved, "rows_added" -> r.rowsAdded,
          "version" -> r.version)
      case InsertInto(table, select) =>
        val rows = SqlApi.queryLake(spark, log, select)
        val r = LakeTable.insert(spark, log, table, rows)
        status(spark, "table" -> table, "version" -> r.version)
      case Delete(cowHint, table, pred) =>
        if (cowHint != null) {
          val r = LakeTable.deleteWhere(spark, log, table, pred)
          status(spark, "table" -> table, "mode" -> "cow",
            "rows_deleted" -> r.rowsDeleted, "version" -> r.version)
        } else {
          val r = LakeTable.deleteWhereMor(spark, log, table, pred)
          status(spark, "table" -> table, "mode" -> "mor",
            "rows_deleted" -> r.rowsDeleted, "version" -> r.version)
        }
      case AlterAdd(table, colName, colType) =>
        val cur = log.snapshot(table).schema.getOrElse(
          throw new graft.lake.LakeValidationException(
            s"table $table has no schema"))
        val r = log.evolveSchema(table,
          cur.copy(fields = cur.fields :+
            Field(colName, colType.toLowerCase, nullable = true)),
          txnId = s"altadd-$table-$colName-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table, "added" -> colName,
          "version" -> r.version)
      case ApplyChanges(table, select, key, trackSpec, at) =>
        val rows = SqlApi.queryLake(spark, log, select)
        val tracked = trackSpec.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val r = graft.lake.Scd.applyBatch(spark, log, table, rows, key,
          tracked, at.toLong)
        status(spark, "table" -> table, "eff_at" -> at.toLong,
          "version" -> r.version)
      case AlterPart(table, colSpec) =>
        val cols = colSpec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val r = log.alterPartitioning(table, cols,
          txnId = s"altpart-$table-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table,
          "partitioned_by" -> cols.mkString(","), "version" -> r.version)
      case AddConstraint(table, name, pred) =>
        val r = LakeTable.addConstraint(spark, log, table, name, pred.trim,
          txnId = s"altck-$table-$name-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table, "constraint" -> name,
          "version" -> r.version)
      case DropConstraint(table, name) =>
        val r = LakeTable.dropConstraint(log, table, name,
          txnId = s"dropck-$table-$name-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table, "dropped_constraint" -> name,
          "version" -> r.version)
      case Analyze(table, colSpec) =>
        val cols = Option(colSpec).toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
        val r = LakeTable.analyze(spark, log, table, cols,
          txnId = s"analyze-$table-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table, "analyzed" -> true,
          "version" -> r.version)
      case DescStats(table) => LakeTable.statsTable(spark, log, table)
      case AlterRename(table, oldName, newName) =>
        val r = log.renameColumn(table, oldName, newName,
          txnId = s"altren-$table-$oldName-$newName-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table, "renamed" -> oldName,
          "to" -> newName, "version" -> r.version)
      case AlterDrop(table, colName) =>
        val r = log.dropColumn(table, colName,
          txnId = s"altdrop-$table-$colName-${java.util.UUID.randomUUID()}")
        status(spark, "table" -> table, "dropped" -> colName,
          "version" -> r.version)
      case Optimize(table, where, zorder, curve) =>
        val zCols = Option(zorder).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val r = LakeTable.compact(spark, log, table,
          LakeTable.CompactionConfig(zOrderBy = zCols,
            curve = Option(curve).map(_.toLowerCase).getOrElse("morton")),
          force = true,
          where = Option(where).map(_.trim).filter(_.nonEmpty))
        status(spark, "table" -> table,
          "files_removed" -> r.filesRemoved.toLong,
          "files_added" -> r.filesAdded.toLong,
          "version" -> r.finalVersion)
      case OptimizeSketch(table, key) =>
        // no-op when the NEWEST commit is already this table's
        // compaction (nothing appended since): a replayed OPTIMIZE must
        // not rewrite the store again. A compaction after new appends
        // sees a non-compact newest entry and commits under an id keyed
        // to the pre-compaction version — never a duplicate.
        val v0 = log.latestVersion(table)
        val alreadyCompact = v0 > 0 && log.readEntry(table, v0).txn_id
          .startsWith(s"sketch-compact-$table-")
        if (alreadyCompact) {
          val n = LakeTable.read(spark, log, table).count()
          status(spark, "table" -> table, "rows_before" -> n,
            "rows_after" -> n, "version" -> v0)
        } else {
          val (before, after) =
            graft.operators.QDigest.compactSketchStore(
              spark, log, table, key,
              txnId = s"sketch-compact-$table-$v0")
          status(spark, "table" -> table, "rows_before" -> before,
            "rows_after" -> after, "version" -> log.latestVersion(table))
        }
      case VacuumPolicies(table, retain) =>
        val keep = Option(retain).map(_.toInt).getOrElse(8)
        requireGovernanceKeep(keep)
        val masks = graft.lake.Masking.vacuumPolicyLog(log, table, keep)
        val filters = graft.lake.RowFilter.vacuumPolicyLog(log, table, keep)
        status(spark, "table" -> table, "masks_deleted" -> masks.toLong,
          "rowfilters_deleted" -> filters.toLong)
      case VacuumViews(retain) =>
        val keep = Option(retain).map(_.toInt).getOrElse(8)
        requireGovernanceKeep(keep)
        val n = graft.lake.Views.vacuumCatalog(log, keep)
        status(spark, "deleted" -> n.toLong,
          "catalog_version" -> graft.lake.Views.catalogVersion(log))
      case Vacuum(table, retain) =>
        val r = LakeTable.vacuum(log, table,
          retainVersions = Option(retain).map(_.toInt).getOrElse(1),
          tmpRetainMs = 0L)
        status(spark, "table" -> table, "deleted" -> r.deleted.toLong,
          "kept_live" -> r.keptLive.toLong)
      case Restore(table, v) =>
        val r = LakeTable.restore(log, table, v.toLong)
        status(spark, "table" -> table, "restored_to" -> v.toLong,
          "version" -> r.version)
      case RestoreTs(table, ts) =>
        val v = log.versionAtTimestamp(table, parseTsMs(ts))
        val r = LakeTable.restore(log, table, v)
        status(spark, "table" -> table, "restored_to" -> v,
          "version" -> r.version)
      case Update(table, setSpec, pred) =>
        val r = LakeTable.updateWhere(spark, log, table, pred.trim,
          splitAssignments(setSpec))
        status(spark, "table" -> table,
          "rows_updated" -> r.rowsUpdated,
          "files_rewritten" -> r.filesRewritten.toLong,
          "version" -> r.version)
      case History(table) => LakeTable.history(spark, log, table)
      case Detail(table) => LakeTable.filesTable(spark, log, table)
      case CreateTag(table, name, v) =>
        val r = graft.lake.Refs.createTag(log, table, name, v.toLong)
        status(spark, "table" -> table, "tag" -> name,
          "version" -> r.version)
      case CreateBranch(table, name, v) =>
        val r = graft.lake.Refs.createBranch(log, table, name, v.toLong)
        status(spark, "table" -> table, "branch" -> name,
          "version" -> r.version)
      case MoveBranch(table, name, v) =>
        val r = graft.lake.Refs.moveBranch(log, table, name, v.toLong)
        status(spark, "table" -> table, "branch" -> name,
          "version" -> r.version)
      case DropTag(table, name) =>
        graft.lake.Refs.drop(log, table, name)
        status(spark, "table" -> table, "ref" -> name, "dropped" -> true)
      case DescRefs(table) =>
        val refs = graft.lake.Refs.list(log, table)
        val st = StructType(Seq(StructField("name", StringType),
          StructField("kind", StringType),
          StructField("version", LongType)))
        spark.createDataFrame(
          java.util.List.of[Row](refs.map(r =>
            Row(r.name, r.kind, r.version)): _*), st)
      case CreateView(orRepl, name, select) =>
        graft.lake.Views.create(spark, log, name, select.trim,
          orReplace = orRepl != null)
        status(spark, "view" -> name, "created" -> true,
          "catalog_version" -> graft.lake.Views.catalogVersion(log))
      case DropView(name) =>
        graft.lake.Views.drop(spark, log, name)
        status(spark, "view" -> name, "dropped" -> true,
          "catalog_version" -> graft.lake.Views.catalogVersion(log))
      case DescViews() =>
        val vs = graft.lake.Views.catalog(log).views
        val st = StructType(Seq(StructField("name", StringType),
          StructField("sql", StringType)))
        spark.createDataFrame(
          java.util.List.of[Row](vs.map(v => Row(v.name, v.sql)): _*), st)
      case TxnBlock(id, body, endVerb) =>
        import graft.lake.MultiTxn
        // top-level split only: a semicolon inside a string literal of an
        // INSERT ... SELECT is part of the statement, not a boundary
        val stmts = splitTopSemis(body)
        // fingerprint of the statement list: rides in the decision/done
        // record so a REUSED txn id with a DIFFERENT body is refused
        // instead of silently no-opping onto the old versions
        val bodyHash = sha256Hex(stmts.mkString("\n"))
        // replayed block (crash after decide, retried script): the txn
        // is already decided — return the recorded snapshot instead of
        // re-staging (stage() would rightly refuse). Only an IDENTICAL
        // body replays; a different one under the same id is a caller
        // bug the short-circuit must not paper over.
        MultiTxn.done(log, id) match {
          case Some(rec) if endVerb.equalsIgnoreCase("COMMIT") =>
            if (rec.body_hash.exists(_ != bodyHash))
              throw new graft.lake.LakeValidationException(
                s"txn '$id' already committed with a DIFFERENT statement " +
                  "body — refusing the no-op replay (reused txn id?)")
            return status(spark, "txn" -> id, "committed" -> true,
              "tables" -> rec.versionMap.toSeq.sorted
                .map { case (t, v) => s"$t@$v" }.mkString(","))
          case _ => ()
        }
        // stage every INSERT (the only stageable verb — WAP has no
        // pre-image machinery for deletes/updates); any staging failure
        // aborts the whole transaction before a decision can exist
        val tables = scala.collection.mutable.ArrayBuffer.empty[String]
        try stmts.foreach {
          case InsertInto(table, select) =>
            MultiTxn.stage(spark, log, id, table,
              SqlApi.queryLake(spark, log, select))
            tables += table
          case bad => throw new graft.lake.LakeValidationException(
            s"only INSERT INTO ... SELECT is allowed inside BEGIN " +
              s"TRANSACTION (got: ${bad.take(60)})")
        } catch {
          case e: Throwable =>
            if (tables.nonEmpty) MultiTxn.abort(log, id, tables.toSeq)
            throw e
        }
        if (endVerb.equalsIgnoreCase("ROLLBACK")) {
          MultiTxn.abort(log, id, tables.toSeq)
          status(spark, "txn" -> id, "committed" -> false,
            "tables" -> tables.mkString(","))
        } else {
          val versions = MultiTxn.commit(spark, log, id, tables.toSeq,
            bodyHash = Some(bodyHash))
          status(spark, "txn" -> id, "committed" -> true,
            "tables" -> versions.toSeq.sorted
              .map { case (t, v) => s"$t@$v" }.mkString(","))
        }
      case rawOther =>
        // TABLE_CHANGES('t', from[, to]) — Delta's CDC table-valued
        // function: each occurrence registers the change feed for
        // (from, to] (to omitted = latest) as a temp view and the call
        // text is substituted, so the surrounding SELECT stays full
        // Catalyst SQL (joins, aggregates, filters over _change_type).
        // Non-expressible windows (CoW rewrites without pre-images)
        // refuse loudly inside changeFeed — never a silent partial feed.
        val tcRefs = matchesOutsideLiterals(rawOther, TableChangesRef).map(m =>
          (m.group(1), m.group(2).toLong,
            Option(m.group(3)).map(_.toLong).getOrElse(0L)))
          .distinct
        tcRefs.foreach { case (t, from, to) =>
          if (!log.tableExists(t))
            throw new graft.lake.LakeValidationException(
              s"TABLE_CHANGES: '$t' is not a lake table")
          LakeTable.changeFeed(spark, log, t, from, to)
            .createOrReplaceTempView(s"__changes_${t}_${from}_$to")
        }
        val withTc =
          if (tcRefs.isEmpty) rawOther
          else replaceOutsideLiterals(rawOther, TableChangesRef)(m =>
            s"__changes_${m.group(1)}_${m.group(2)}_${
              Option(m.group(3)).getOrElse("0")}")
        // TABLE_DIFF('t', from, to, 'key[,key2]') — the keyed
        // insert/delete/update classifier ([[LakeTable.diff]]): valid on
        // ANY window including CoW rewrites, priced O(changed files)
        // by the version-set file pruning inside diff
        val tdRefs = matchesOutsideLiterals(withTc, TableDiffRef).map(m =>
          (m.group(1), m.group(2).toLong, m.group(3).toLong,
            m.group(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq))
          .distinct
        tdRefs.zipWithIndex.foreach { case ((t, from, to, keys), i) =>
          if (!log.tableExists(t))
            throw new graft.lake.LakeValidationException(
              s"TABLE_DIFF: '$t' is not a lake table")
          LakeTable.diff(spark, log, t, from, to, keys)
            .createOrReplaceTempView(s"__diff_${t}_${from}_${to}_$i")
        }
        val other =
          if (tdRefs.isEmpty) withTc
          else replaceOutsideLiterals(withTc, TableDiffRef)(m => {
            val key = (m.group(1), m.group(2).toLong, m.group(3).toLong,
              m.group(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            s"__diff_${m.group(1)}_${m.group(2)}_${m.group(3)}_${
              tdRefs.indexOf(key)}"
          })
        // TIMESTAMP AS OF resolves to a concrete version first (failing
        // loudly on non-tables / pre-history timestamps), then shares
        // VERSION AS OF's validation and routing
        val tsRefs = matchesOutsideLiterals(other, TimestampRef)
          .map(m => m.group(1) -> m.group(2))
        tsRefs.foreach { case (t, _) =>
          if (!log.listTables().contains(t))
            throw new graft.lake.LakeValidationException(
              s"TIMESTAMP AS OF must directly follow a lake table name; " +
                s"'$t' is not a table (alias it after the clause)")
        }
        val resolved = tsRefs.map { case (t, ts) =>
          t -> log.versionAtTimestamp(t, parseTsMs(ts))
        }
        val stripped0 =
          if (tsRefs.isEmpty) other
          else replaceOutsideLiterals(other, TimestampRef)(
            m => s"${m.group(1)} VERSION AS OF ${
              resolved.find(_._1 == m.group(1)).get._2}")
        // quoted VERSION AS OF = a tag name: resolve through the
        // table's refs (loudly — an unknown tag must never fall back to
        // a latest read), then route as the pinned numeric version
        val tagRefs = matchesOutsideLiterals(stripped0, TagRef)
          .map(m => m.group(1) -> m.group(2))
        tagRefs.foreach { case (t, _) =>
          if (!log.listTables().contains(t))
            throw new graft.lake.LakeValidationException(
              s"VERSION AS OF must directly follow a lake table name; " +
                s"'$t' is not a table (alias it after the clause)")
        }
        val stripped =
          if (tagRefs.isEmpty) stripped0
          else replaceOutsideLiterals(stripped0, TagRef)(m =>
            s"${m.group(1)} VERSION AS OF ${
              graft.lake.Refs.resolveOrThrow(log, m.group(1),
                m.group(2)).version}")
        val refs = matchesOutsideLiterals(stripped, VersionRef)
          .map(m => m.group(1) -> m.group(2).toLong)
        if (refs.isEmpty) SqlApi.queryLake(spark, log, stripped)
        else {
          // fail loudly on every silent-wrong-answer shape: the captured
          // word must be a lake table (an alias would register nothing
          // and read latest), versions must not conflict per table, and
          // 0 is unaddressable (the snapshot resolver's latest-sentinel)
          val tables = log.listTables().toSet
          refs.foreach { case (t, v) =>
            if (!tables.contains(t))
              throw new graft.lake.LakeValidationException(
                s"VERSION AS OF must directly follow a lake table name; " +
                  s"'$t' is not a table (alias it after the clause)")
            if (v == 0)
              throw new graft.lake.LakeValidationException(
                s"VERSION AS OF 0 is not addressable (0 means latest to " +
                  s"the snapshot resolver); DESCRIBE HISTORY $t and pick " +
                  "a version >= 1")
          }
          refs.groupBy(_._1).foreach { case (t, vs) =>
            if (vs.map(_._2).distinct.size > 1)
              throw new graft.lake.LakeValidationException(
                s"conflicting VERSION AS OF values for table $t: " +
                  vs.map(_._2).distinct.sorted.mkString(", "))
          }
          SqlApi.queryLake(spark, log,
            replaceOutsideLiterals(stripped, VersionRef)(m => m.group(1)),
            refs.toMap)
        }
    }
}
