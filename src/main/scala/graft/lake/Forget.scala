package graft.lake

import org.apache.spark.sql.SparkSession

/** Right-to-be-forgotten across the lake — the GDPR/CCPA erasure a
  * data platform must run when a subject requests deletion: one key
  * value erased from EVERY table that carries it, transactionally per
  * table, with a per-table evidence report (a compliance team files the
  * report, not a boolean).
  *
  * Each table gets its own [[LakeTable.deleteWhereMor]] (merge-on-read:
  * deletion vectors, no data-file rewrite at request time — erasure
  * requests arrive continuously and must not each rewrite terabytes;
  * the physical purge happens at the next compaction/VACUUM horizon,
  * which is the documented two-phase model deletion-vector lakes use).
  * Idempotent per (request, table): the txn id derives from the request
  * id, so re-running a half-completed request skips tables already
  * done — crash-safe without a cross-table transaction (which a
  * per-table OCC log cannot offer; the report makes partial progress
  * visible instead of hiding it).
  */
object Forget {

  final case class TableReport(table: String, rowsDeleted: Long,
                               filesTouched: Long, version: Long)

  /** Erase `keyCol = value` (3-token predicate grammar) from every
    * listed table. `requestId` keys idempotency: the same request
    * replayed never double-deletes or diverges. */
  def forgetKey(spark: SparkSession, log: LakeLog, tables: Seq[String],
                keyCol: String, value: String,
                requestId: String): Seq[TableReport] = {
    require(tables.nonEmpty)
    tables.map { t =>
      val r = LakeTable.deleteWhereMor(spark, log, t,
        s"$keyCol = $value", txnId = s"forget-$requestId-$t")
      TableReport(t, r.rowsDeleted,
        (r.filesWithDv + r.filesRemoved).toLong, r.version)
    }
  }
}
