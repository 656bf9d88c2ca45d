package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

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
  *
  * The full `merge_asof` surface rides the same single shuffle:
  *  - `direction = "backward"` (default): greatest rightTime <= leftTime;
  *  - `direction = "forward"`: smallest rightTime >= leftTime — the same
  *    window with time ordering reversed;
  *  - `direction = "nearest"`: closer of the two candidates (ties →
  *    backward). Both carries share one hash exchange — the second
  *    differently-ordered window adds a sort, never a shuffle;
  *  - `tolerance`: maximum |leftTime − rightTime| for a match, as a Column
  *    added to the time type (an INTERVAL literal for timestamps, a number
  *    for numerics). Matches beyond it become NULL, exactly like pandas.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (unique per (key, time))
    * @param keyCols    equi-join key column names (present in both)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightVals  right payload columns to carry (default: all but
    *                   key/time)
    * @param direction  "backward" | "forward" | "nearest"
    * @param tolerance  max time distance for a valid match (None = unbounded)
    * @return left rows + carried right payload columns (null when no right
    *         row matches under the direction/tolerance)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightVals: Seq[String] = Nil,
           direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"unknown direction: $direction")
    val payload =
      if (rightVals.nonEmpty) rightVals
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    val leftCols = left.columns.toSeq

    // one unioned relation: right rows carry payload, left rows carry their
    // own columns; __side orders right (0) before left (1) at equal times so
    // a right row AT the left timestamp is visible to it (<=/>= semantics
    // both include equality). The payload travels as ONE struct — including
    // the right time as __rt for tolerance/nearest arithmetic — so the whole
    // matched right row wins or loses atomically; carrying columns
    // independently would mix values from different right rows when a
    // payload field is NULL.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt",
          right.schema(rightTime).dataType))
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(payload.map(col) :+ col(rightTime).as("__rt"): _*).as("__r")) ++
        leftCols.diff(keyCols).map(c => lit(null).cast(
          left.schema(c).dataType).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(payloadType).as("__r")) ++
        leftCols.diff(keyCols).map(c => col(c).as(s"__l_$c")): _*)

    // backward scans time ascending; forward scans descending — both windows
    // hash-partition by the SAME keys, so "nearest" (which needs both) still
    // exchanges once and only re-sorts for the second pass
    def w(desc: Boolean): WindowSpec = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((if (desc) col("__t").desc else col("__t").asc), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = taggedRight.unionByName(taggedLeft)
    val baseCols = (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
      leftCols.diff(keyCols).map(c => col(s"__l_$c"))

    // candidate validity under tolerance: the carried right time must lie
    // within [__t - tol, __t] (backward) / [__t, __t + tol] (forward)
    def bounded(c: Column, forward: Boolean): Column = tolerance match {
      case None => c
      case Some(tol) =>
        val ok =
          if (forward) col("__t") + tol >= c.getField("__rt")
          else c.getField("__rt") + tol >= col("__t")
        when(ok, c) // else NULL: out-of-tolerance candidates drop atomically
    }

    val carried = direction match {
      case "backward" =>
        unioned.select(baseCols :+
          bounded(last(col("__r"), ignoreNulls = true).over(w(desc = false)),
            forward = false).as("__c"): _*)
      case "forward" =>
        unioned.select(baseCols :+
          bounded(last(col("__r"), ignoreNulls = true).over(w(desc = true)),
            forward = true).as("__c"): _*)
      case "nearest" =>
        val b = bounded(last(col("__r"), ignoreNulls = true)
          .over(w(desc = false)), forward = false)
        val f = bounded(last(col("__r"), ignoreNulls = true)
          .over(w(desc = true)), forward = true)
        unioned.select(baseCols :+ b.as("__b") :+ f.as("__f"): _*)
          .withColumn("__c",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              // equal distance → backward, matching pandas' tie rule
              .when(col("__t") - col("__b").getField("__rt") <=
                    col("__f").getField("__rt") - col("__t"), col("__b"))
              .otherwise(col("__f")))
          .drop("__b", "__f")
    }

    carried.filter(col("__side") === 1)
      .select(leftCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else if (c == leftTime) col("__t").as(leftTime)
        else col(s"__l_$c").as(c)) ++
        payload.map(c => col("__c").getField(c).as(c)): _*)
  }
}
