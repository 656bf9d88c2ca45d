package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation assembly for SFT/chat training data — the step that turns
  * raw interaction logs into chat-template transcripts: sessionize an
  * event stream per user, map event kinds to speaker roles, COALESCE
  * consecutive same-role events into turns (the part naive per-event
  * rendering gets wrong — real chat corpora merge consecutive messages
  * from one speaker into a single turn), and render each session as a
  * role-tagged transcript:
  *
  *   <|user|> click {"k": 3}; view {"k": 9}
  *   <|assistant|> purchase {"k": 2}
  *
  * Everything is deterministic string assembly over a declared total
  * order (ts, event_id) — no model in the loop — so an external engine
  * replays transcripts byte-for-byte; this is the *_fixed-style exact
  * face of template rendering (a production pipeline swaps the literal
  * tags for its tokenizer's chat template; the run-grouping, ordering
  * and session semantics are the operator).
  *
  * Scale shape: both windows (sessionization, turn-grouping) and both
  * aggregates (turn text, transcript) key by user — one hash exchange on
  * the user id, reused by all four operators; partitions carry
  * (ts, id, type, props) scalars; parallelism = #users. No global sort,
  * no driver-side assembly.
  */
object Dialog {

  /** Render events into per-session transcripts. `userTypes` lists the
    * event types spoken by the "user" role; everything else renders as
    * "assistant". Returns (user_id, session_id, n_turns, n_events,
    * transcript). */
  def assembleTranscripts(events: DataFrame, userTypes: Seq[String],
                          gapSec: Long = 1800L): DataFrame = {
    require(userTypes.nonEmpty)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessioned = events
      .withColumn("__prev", lag("ts", 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum("__new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("role",
        when(col("event_type").isin(userTypes: _*), lit("user"))
          .otherwise(lit("assistant")))
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    val turns = sessioned
      .withColumn("__st",
        coalesce((lag("role", 1).over(bySession) =!= col("role"))
          .cast("long"), lit(1L)))
      .withColumn("turn_id", sum("__st").over(
        bySession.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__msg",
        concat(col("event_type"), lit(" "), col("props")))
    val turnText = turns
      .groupBy("user_id", "session_id", "turn_id", "role")
      .agg(count(lit(1)).as("__ne"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts").as("o1"),
              col("event_id").as("o2"), col("__msg").as("p")))),
            x => x.getField("p")),
          "; ").as("__txt"))
    turnText.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_turns"), sum("__ne").as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_id").as("o"),
              concat(lit("<|"), col("role"), lit("|> "), col("__txt"))
                .as("p")))),
            x => x.getField("p")),
          "\n").as("transcript"))
  }
}
