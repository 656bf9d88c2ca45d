package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ChangepointSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  private def series(vs: Seq[Long], key: String = "a") =
    vs.zipWithIndex.map { case (v, i) => (key, ts(i), v) }
      .toDF("k", "t", "v")

  // baseline 2: bs = 2+2 = 4; T_i = 2*v - 4 - slackB
  private def run(vs: Seq[Long], slackB: Long, hB: Long) =
    Changepoint.cusum(series(vs), "k", "t", "v",
      baseline = 2, slackTimesB = slackB, thresholdTimesB = hB)
      .collect().head

  test("level shift alarms at the exact hand-computed slot") {
    // monitored: 2,2,5,5,5 → T = 2v-4-0: 0,0,+6,+6,+6 → S: 0,0,6,12,18
    // threshold 10 → first exceed at the 4th monitored point (hour 5)
    val r = run(Seq(2, 2, 2, 2, 5, 5, 5), slackB = 0, hB = 10)
    assert(r.getLong(1) === 7L)       // n_points
    assert(r.getLong(2) === 4L)       // base_sum
    assert(r.getLong(3) === 18L)      // max_s
    assert(r.getTimestamp(4) === ts(5))
  }

  test("stationary series never alarms and S resets at zero") {
    // T alternates +2/-6; max(0,·) pins S at 0 after every dip
    val r = run(Seq(2, 2, 3, 1, 3, 1, 3), slackB = 0, hB = 10)
    assert(r.getLong(3) === 2L)
    assert(r.isNullAt(4))
  }

  test("slack absorbs a small persistent drift") {
    // v=3 forever: T = 2*3-4-2 = 0 with slackB=2 → S stays 0
    val r = run(Seq(2, 2, 3, 3, 3, 3, 3, 3), slackB = 2, hB = 4)
    assert(r.getLong(3) === 0L && r.isNullAt(4))
    // without slack the same drift alarms
    val r2 = run(Seq(2, 2, 3, 3, 3, 3, 3, 3), slackB = 0, hB = 4)
    assert(r2.getTimestamp(4) === ts(4))
  }

  test("series shorter than the baseline yields an empty monitor") {
    val r = run(Seq(5L), slackB = 0, hB = 1)
    assert(r.getLong(1) === 1L && r.getLong(2) === 5L &&
      r.getLong(3) === 0L && r.isNullAt(4))
  }

  test("keys fold independently") {
    val df = series(Seq(2, 2, 9, 9), "hot")
      .union(series(Seq(2, 2, 2, 2), "cold"))
    val out = Changepoint.cusum(df, "k", "t", "v", 2, 0L, 5L)
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(out === Map("hot" -> false, "cold" -> true))
  }
}
