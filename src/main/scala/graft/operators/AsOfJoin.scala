package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, the single right row with
  * the greatest `rightTime <= leftTime` within the same key — the join that
  * backs feature lookups, slowly-changing dimensions and market-data
  * alignment. The reference has no joins at all (SURVEY.md §2.3); Spark has
  * no native as-of either, and the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + per-left max) is a range join that
  * degenerates to broadcast-nested-loop + an extra aggregation.
  *
  * This is the scale-correct composition (builder-guidance preference (a):
  * compose existing ops): tag and UNION the two sides, then one window pass
  * per key ordered by time carries the latest right-side payload forward
  * (`last_value(..., ignoreNulls)` over unbounded-preceding). Cost: ONE
  * shuffle of (key, time, payload) — same as any groupBy — regardless of how
  * many right rows precede each left row. Ties (equal times) resolve to the
  * right row, matching `ASOF JOIN`'s `<=` semantics; right rows must be
  * unique per (key, time) — pre-aggregate otherwise.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (unique per (key, time))
    * @param keyCols    equi-join key column names (present in both)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightVals  right payload columns to carry (default: all but
    *                   key/time)
    * @return left rows + carried right payload columns (null when no right
    *         row precedes)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightVals: Seq[String] = Nil): DataFrame = {
    val payload =
      if (rightVals.nonEmpty) rightVals
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    val leftCols = left.columns.toSeq

    // one unioned relation: right rows carry payload, left rows carry their
    // own columns; __side orders right (0) before left (1) at equal times so
    // a right row AT the left timestamp is visible to it (<= semantics).
    // The payload travels as ONE struct so the whole matched right row wins
    // or loses atomically — carrying columns independently would mix values
    // from different right rows when a payload field is NULL.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(payload.map(col): _*).as("__r")) ++
        leftCols.diff(keyCols).map(c => lit(null).cast(
          left.schema(c).dataType).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(payloadType).as("__r")) ++
        leftCols.diff(keyCols).map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .select((keyCols.map(col) :+ col("__t") :+ col("__side")) ++
        leftCols.diff(keyCols).map(c => col(s"__l_$c")) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__c"): _*)

    carried.filter(col("__side") === 1)
      .select(leftCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else if (c == leftTime) col("__t").as(leftTime)
        else col(s"__l_$c").as(c)) ++
        payload.map(c => col("__c").getField(c).as(c)): _*)
  }
}
