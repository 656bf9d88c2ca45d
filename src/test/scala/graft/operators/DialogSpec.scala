package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class DialogSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  private def ev(rows: (Long, Long, Long, String, String)*) =
    rows.map { case (u, id, s, et, p) => (u, id, ts(s), et, p) }
      .toDF("user_id", "event_id", "ts", "event_type", "props")

  test("consecutive same-role events merge into one turn") {
    val df = ev(
      (1L, 1L, 0L, "click", "{a}"),
      (1L, 2L, 10L, "view", "{b}"),
      (1L, 3L, 20L, "purchase", "{c}"),
      (1L, 4L, 30L, "click", "{d}"))
    val r = Dialog.assembleTranscripts(df, Seq("click", "view")).head()
    assert(r.getAs[Long]("n_turns") == 3)
    assert(r.getAs[Long]("n_events") == 4)
    assert(r.getAs[String]("transcript") ==
      "<|user|> click {a}; view {b}\n<|assistant|> purchase {c}\n" +
        "<|user|> click {d}")
  }

  test("gap beyond threshold opens a new session with fresh turn ids") {
    val df = ev(
      (1L, 1L, 0L, "click", "{a}"),
      (1L, 2L, 5000L, "error", "{b}")) // > 1800s later
    val rows = Dialog.assembleTranscripts(df, Seq("click"))
      .orderBy("session_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("transcript") == "<|user|> click {a}")
    assert(rows(1).getAs[String]("transcript") == "<|assistant|> error {b}")
  }

  test("equal timestamps break ties by event_id") {
    val df = ev(
      (1L, 2L, 0L, "view", "{second}"),
      (1L, 1L, 0L, "view", "{first}"))
    val r = Dialog.assembleTranscripts(df, Seq("view")).head()
    assert(r.getAs[String]("transcript") ==
      "<|user|> view {first}; view {second}")
  }

  test("users are independent; deterministic under repartition") {
    val df = ev((0L until 60L).map(i =>
      (i % 5, i, i * 7 % 100, if (i % 3 == 0) "click" else "error",
        s"{$i}")): _*)
    val a = Dialog.assembleTranscripts(df, Seq("click"))
      .orderBy("user_id", "session_id").collect()
    val b = Dialog.assembleTranscripts(df.repartition(7), Seq("click"))
      .orderBy("user_id", "session_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getLong(0)).distinct.length == 5)
  }
}
