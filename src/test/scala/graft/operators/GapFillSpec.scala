package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("missing hours become explicit zeros on the GLOBAL spine") {
    val series = Seq(("a", ts(0), 5L), ("a", ts(3), 7L), ("b", ts(1), 2L))
      .toDF("g", "hour", "n")
    val out = GapFill.fillHourly(series, "g", "hour", "n")
      .orderBy("g", "hour").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getHours, r.getLong(2)))
    // span is 00..03 for EVERY group — b's dark edges show as zeros
    assert(out.toSeq == Seq(
      ("a", 0, 5L), ("a", 1, 0L), ("a", 2, 0L), ("a", 3, 7L),
      ("b", 0, 0L), ("b", 1, 2L), ("b", 2, 0L), ("b", 3, 0L)))
  }

  test("gap-free series is a fixed point") {
    val series = Seq(("x", ts(2), 1L), ("x", ts(3), 4L))
      .toDF("g", "hour", "n")
    val out = GapFill.fillHourly(series, "g", "hour", "n")
      .orderBy("hour").collect().map(r => (r.getTimestamp(1), r.getLong(2)))
    assert(out.toSeq == Seq((ts(2), 1L), (ts(3), 4L)))
  }

  test("composes with Anomaly: a filled gap flags as a negative spike") {
    // 9 busy hours then one dark hour; without the fill the dark hour
    // does not even exist as a row for the detector to flag
    val series = (0 until 10).filter(_ != 7).map(h => ("t", ts(h), 50L))
      .toDF("g", "hour", "n")
    val filled = GapFill.fillHourly(series, "g", "hour", "n")
    val flagged = Anomaly.countSpikes(filled, "g", "hour", "n", k = 2)
      .collect()
    assert(flagged.map(_.getTimestamp(1)).toSeq == Seq(ts(7)))
    assert(Anomaly.countSpikes(series, "g", "hour", "n", k = 2).isEmpty)
  }
}
