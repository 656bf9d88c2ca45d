package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Property/fuzz coverage for the 2PC decision path the way
  * MvRewriteFuzzSpec covers the rewrite rule: seeded random interleavings
  * of stage / abort / decide / crash-mid-roll-forward / replay / recover
  * across 2-3 tables and 1-3 concurrent txns, with the expected end-state
  * tracked BY CONSTRUCTION (every staged row id is unique to its
  * (txn, table), so visibility is checkable as a set of ids — no
  * re-implemented protocol to agree-by-accident with). The scripted
  * scenarios stay in MultiTxnSpec; this pins the presumed-abort
  * invariants over interleavings nobody thought to script:
  *
  *  1. All-or-nothing visibility: after recovery, a txn's rows are on
  *     ALL its participants or NONE — never a torn subset.
  *  2. DECIDED rolls forward: any txn whose intent record was written
  *     ends done with a complete version map, whatever prefix of
  *     publishes the simulated crash left behind (zero included).
  *  3. UNDECIDED stages stay invisible; recover() never touches them
  *     (they may belong to a live coordinator) and they abort cleanly.
  *  4. Idempotent replay: commit / rollForward / recover re-runs return
  *     the recorded versions and change nothing.
  *  5. readAt covers exactly the participant set.
  */
class MultiTxnFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  /** One txn's generated plan: participants and its fate. */
  private final case class Plan(txnId: String, tables: Seq[String],
                                fate: Int, crashPrefix: Int)
  private val Abort = 0; private val Commit = 1
  private val CrashAfterDecide = 2; private val LeaveUndecided = 3

  private def rowId(txn: Int, table: Int): Long = 1000L * (txn + 1) + table

  test("seeded stage/decide/crash/replay interleavings keep the " +
      "presumed-abort invariants") {
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val log = new LakeLog(tmpDir(s"mtxnfuzz$seed"))
      val nTables = 2 + rnd.nextInt(2)
      val tables = (0 until nTables).map(i => s"t$i")
      tables.foreach { t =>
        LakeTable.createTable(log, t, schema)
        LakeTable.insert(spark, log, t, Seq((0L, "base")).toDF("id", "v"))
      }
      // expected visible ids per table, tracked by construction
      val expected = scala.collection.mutable.Map(
        tables.map(_ -> Set(0L)): _*)

      val plans = (0 until 1 + rnd.nextInt(3)).map { j =>
        val parts = rnd.shuffle(tables).take(1 + rnd.nextInt(nTables))
        Plan(s"x$j", parts.sorted, rnd.nextInt(4),
          rnd.nextInt(parts.size + 1))
      }
      // interleave the PREPARE phase across txns: all (txn, table) stage
      // ops in one shuffled order — staging is the phase where concurrent
      // coordinators genuinely overlap
      val stageOps = rnd.shuffle(plans.flatMap(p =>
        p.tables.map(t => (p, t))))
      stageOps.foreach { case (p, t) =>
        val j = p.txnId.drop(1).toInt
        MultiTxn.stage(spark, log, p.txnId, t,
          Seq((rowId(j, t.drop(1).toInt), p.txnId)).toDF("id", "v"))
      }
      // nothing is visible before any decision
      tables.foreach(t =>
        assert(LakeTable.read(spark, log, t).count() === 1L,
          s"seed $seed: staged rows leaked into $t pre-decision"))

      // DECIDE phase, txn order shuffled
      rnd.shuffle(plans).foreach { p =>
        val j = p.txnId.drop(1).toInt
        p.fate match {
          case Abort =>
            MultiTxn.abort(log, p.txnId, p.tables)
          case Commit =>
            val v = MultiTxn.commit(spark, log, p.txnId, p.tables)
            assert(v.keySet === p.tables.toSet, s"seed $seed ${p.txnId}")
            // replayed commit is idempotent
            assert(MultiTxn.commit(spark, log, p.txnId, p.tables) === v,
              s"seed $seed: ${p.txnId} replay diverged")
            p.tables.foreach(t => expected(t) +=
              rowId(j, t.drop(1).toInt))
          case CrashAfterDecide =>
            // the coordinator dies between the decision record and a
            // random prefix of the publishes — written exactly as
            // commit writes it (sorted participant list)
            val txns = log.root.resolve("_txns")
            Files.createDirectories(txns)
            Files.writeString(txns.resolve(s"${p.txnId}.json"),
              s"""{"txn_id":"${p.txnId}","tables":[""" +
                p.tables.map("\"" + _ + "\"").mkString(",") +
                s"""],"created_ms":$seed}""")
            p.tables.take(p.crashPrefix).foreach(t =>
              Wap.publish(spark, log, t, p.txnId))
            // a decided txn refuses abort, torn or not
            intercept[LakeValidationException] {
              MultiTxn.abort(log, p.txnId, p.tables)
            }
            p.tables.foreach(t => expected(t) +=
              rowId(j, t.drop(1).toInt))
          case LeaveUndecided => () // a live coordinator still owns it
        }
      }

      // recovery: decided txns (crashed ones included) roll forward;
      // undecided stages are not touched
      val recovered = MultiTxn.recover(spark, log)
      val crashed = plans.filter(_.fate == CrashAfterDecide).map(_.txnId)
      assert(recovered.sorted === crashed.sorted, s"seed $seed")
      assert(MultiTxn.recover(spark, log).isEmpty,
        s"seed $seed: recover is not idempotent")

      plans.foreach { p =>
        val j = p.txnId.drop(1).toInt
        p.fate match {
          case Commit | CrashAfterDecide =>
            val rec = MultiTxn.done(log, p.txnId)
            assert(rec.isDefined && rec.get.versionMap.keySet ===
              p.tables.toSet, s"seed $seed: ${p.txnId} not fully done")
            // replayed roll-forward returns the recorded versions
            assert(MultiTxn.rollForward(spark, log, p.txnId) ===
              rec.get.versionMap, s"seed $seed: ${p.txnId} rollForward " +
                "replay diverged")
            // readAt covers exactly the participant set
            assert(MultiTxn.readAt(spark, log, p.txnId).keySet ===
              p.tables.toSet, s"seed $seed")
          case LeaveUndecided =>
            assert(MultiTxn.done(log, p.txnId).isEmpty &&
              MultiTxn.intent(log, p.txnId).isEmpty, s"seed $seed")
            p.tables.foreach(t => assert(
              Wap.staged(log, t, p.txnId).isDefined,
              s"seed $seed: recover() touched undecided ${p.txnId} on $t"))
            // ... and it aborts cleanly afterwards
            MultiTxn.abort(log, p.txnId, p.tables)
            p.tables.foreach(t => assert(
              Wap.staged(log, t, p.txnId).isEmpty, s"seed $seed"))
          case Abort =>
            assert(MultiTxn.done(log, p.txnId).isEmpty, s"seed $seed")
        }
        // all-or-nothing: this txn's row ids are on every participant or
        // on none (checked against the constructed expectation below)
        val visible = p.tables.map { t =>
          val i = t.drop(1).toInt
          LakeTable.read(spark, log, t).filter(s"id = ${rowId(j, i)}")
            .count() === 1L
        }
        assert(visible.distinct.size === 1,
          s"seed $seed: ${p.txnId} is torn across ${p.tables}")
      }

      // final visibility equals the constructed expectation exactly
      tables.foreach { t =>
        val got = LakeTable.read(spark, log, t)
          .select("id").as[Long].collect().toSet
        assert(got === expected(t),
          s"seed $seed: $t visible ids $got != expected ${expected(t)}")
      }
    }
  }
}
