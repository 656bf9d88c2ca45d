package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage (Fellegi & Sunter JASA'69 shape,
  * deterministic-weights variant): find records that denote the same
  * real-world entity across dirty re-crawls — the curation step that
  * collapses "Customer#42", "CUSTOMER#42 (re-crawl)" and their shifted
  * attribute copies into one entity BEFORE counting, splitting or
  * training on them. Exact-match dedup misses these (bytes differ);
  * similarity dedup has no notion of typed fields.
  *
  * Three stages, each the standard published shape:
  *
  *  1. BLOCKING — candidate pairs come only from equi-joins on cheap
  *     block keys (multi-pass: several keys, union, distinct), never an
  *     all-pairs scan; per-key fan-out is bounded by block occupancy —
  *     the same envelope as an LSH band join.
  *  2. SCORING — integer agreement weights per field rule (equality or
  *     banded tolerance), summed; a pair matches at `threshold`. All
  *     integer, so both engines score identically.
  *  3. CLUSTERING — matched pairs feed [[Dedup.connectedComponents]];
  *     every record's entity id = min reachable record id (isolated
  *     records are their own entity).
  */
object EntityResolution {

  /** Candidate pairs from multi-pass blocking: for each block expr,
    * records sharing the key pair up (a_id < b_id); passes union and
    * de-duplicate. Every non-id column comes back twice as `<c>_a` /
    * `<c>_b` for the scoring stage. */
  def candidatePairs(records: DataFrame, idCol: String,
                     blockExprs: Seq[String]): DataFrame = {
    require(blockExprs.nonEmpty, "blocking needs at least one pass")
    val dataCols = records.columns.filterNot(_ == idCol).toSeq
    def side(suffix: String, key: String) = records.select(
      (expr(key).as("__bk") +: col(idCol).as(s"${idCol}_$suffix") +:
        dataCols.map(c => col(c).as(s"${c}_$suffix"))): _*)
    blockExprs.map { bk =>
      side("a", bk).join(side("b", bk), "__bk")
        .where(col(s"${idCol}_a") < col(s"${idCol}_b"))
        .drop("__bk")
    }.reduce(_ unionAll _).distinct()
  }

  /** Matched pairs: Σ weight over satisfied rules ≥ threshold. Rules
    * are boolean SQL over the `_a`/`_b` suffixed columns. */
  def matchPairs(records: DataFrame, idCol: String,
                 blockExprs: Seq[String], rules: Seq[(String, Long)],
                 threshold: Long): DataFrame = {
    val scored = candidatePairs(records, idCol, blockExprs)
      .withColumn("score", rules.map { case (r, w) =>
        when(expr(r), lit(w)).otherwise(lit(0L)) }.reduce(_ + _))
    scored.where(col("score") >= threshold)
      .select(col(s"${idCol}_a").as("a_id"), col(s"${idCol}_b").as("b_id"),
        col("score"))
  }

  /** Every record → its entity id (min reachable record id through the
    * match graph; singletons map to themselves). */
  def entities(records: DataFrame, idCol: String,
               matches: DataFrame): DataFrame = {
    val comp = Dedup.connectedComponents(
      matches.select("a_id", "b_id"))
    records.select(col(idCol).cast("long").as("record_id"))
      .join(comp.withColumnRenamed("id", "record_id"),
        Seq("record_id"), "left")
      .select(col("record_id"),
        coalesce(col("component"), col("record_id")).as("entity"))
  }
}
