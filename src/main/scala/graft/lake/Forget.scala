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
  *
  * STAGED write-audit-publish batches ([[Wap]]) are part of the
  * erasure surface: a staged batch carrying the subject would
  * re-surface the data at its later publish. Any staged batch
  * containing the key is ABORTED (reported per table) — the
  * conservative compliance move; the pipeline re-stages the batch
  * minus the subject.
  */
object Forget {

  final case class TableReport(table: String, rowsDeleted: Long,
                               filesTouched: Long, version: Long,
                               stagedAborted: Long = 0L)

  /** Erase `keyCol = value` from every listed table. `requestId` keys
    * idempotency: the same request replayed never double-deletes or
    * diverges.
    *
    * The predicate literal is rendered from the key column's DECLARED
    * type in each table's schema — string keys are quoted (embedded
    * quotes doubled, the grammar's escape), numeric/boolean keys must
    * parse and are emitted canonically. An erasure API must never let
    * a value like `O'Brien` fall through to the SQL-expression parser
    * as a column reference, or a string key `"07"` silently
    * integer-cast into matching `7`. */
  def forgetKey(spark: SparkSession, log: LakeLog, tables: Seq[String],
                keyCol: String, value: String,
                requestId: String): Seq[TableReport] = {
    require(tables.nonEmpty)
    tables.map { t =>
      val sch = log.snapshot(t).schema.getOrElse(
        throw new LakeValidationException(s"table $t has no schema"))
      val field = sch.fields.find(_.name == keyCol).getOrElse(
        throw new LakeValidationException(
          s"forget: table $t has no column $keyCol"))
      def invalid(kind: String) = throw new LakeValidationException(
        s"forget: value '$value' is not a valid $kind for $t.$keyCol")
      val litTok = field.`type` match {
        case "string" | "date" | "timestamp" =>
          "'" + value.replace("'", "''") + "'"
        case "int32" | "int64" =>
          value.trim.toLongOption.getOrElse(invalid("integer")).toString
        case "float32" | "float64" =>
          value.trim.toDoubleOption.getOrElse(invalid("number")).toString
        case "boolean" =>
          value.trim.toBooleanOption.getOrElse(invalid("boolean")).toString
        case other => throw new LakeValidationException(
          s"forget: unsupported key type $other for $t.$keyCol")
      }
      // STAGED write-audit-publish batches are part of the erasure
      // surface: a staged batch carrying the subject would re-surface
      // the data at its later publish, silently undoing the request.
      // The conservative compliance move is to ABORT any staged batch
      // containing the key (the pipeline re-stages the batch minus the
      // subject); batches without the key are untouched.
      //
      // EXCEPT a participant of a DECIDED cross-table transaction
      // (wap id = txn id, intent/done record in _txns): MultiTxn
      // guarantees decided txns always roll forward, and aborting one
      // participant would wedge recovery and tear cross-table atomicity
      // (a sibling may already be published). Those roll FORWARD here
      // instead — the rows land in the main line, where the
      // deleteWhereMor below erases them in the same request.
      val pred = graft.operators.QueryEngine
        .parsePredicate(s"$keyCol = $litTok")
      val aborted = Wap.listStaged(log, t).count { b =>
        val hit = Wap.readBatch(spark, log, t, b.wap_id)
          .filter(pred).limit(1).count() > 0
        if (hit) {
          val decided = MultiTxn.intent(log, b.wap_id).isDefined ||
            MultiTxn.done(log, b.wap_id).isDefined
          if (decided) MultiTxn.rollForward(spark, log, b.wap_id)
          else Wap.abort(log, t, b.wap_id)
        }
        hit // counted either way: the staged copy no longer survives
      }
      val r = LakeTable.deleteWhereMor(spark, log, t,
        s"$keyCol = $litTok", txnId = s"forget-$requestId-$t")
      TableReport(t, r.rowsDeleted,
        (r.filesWithDv + r.filesRemoved).toLong, r.version,
        stagedAborted = aborted.toLong)
    }
  }
}
