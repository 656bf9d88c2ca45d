package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked DBSCAN (Ester et al., KDD'96) over integer 2-D points —
  * the density-based cluster extractor for embedding-space exploration:
  * after PCA/UMAP-style projection, dense regions are semantic families
  * worth capping/inspecting and isolated points are outliers worth
  * review; unlike k-means, cluster count is discovered, not declared,
  * and noise is an explicit verdict rather than a forced assignment.
  *
  * Exactness: coordinates are INTEGERS (a projection quantizes before
  * clustering — [[Quantize]]'s trick), so distances, the eps gate, core
  * counts, and min-label flooding are all integer arithmetic that
  * replays bit-for-bit in the DuckDB oracle. Cluster ids are the MIN
  * point id of each cluster's core graph after a FIXED number of
  * flooding rounds (same fixed-round replay device as
  * [[LinkGraph.labelPropagation]]); border points adopt the smallest
  * adjacent core's label (plain DBSCAN leaves border assignment
  * order-dependent — the min rule makes it a pure function of the data),
  * noise is labeled -1.
  *
  * Scale shape: the all-pairs trap is gated by GRID BLOCKING — cells of
  * width eps, so any eps-neighbor pair lands in adjacent cells; the
  * candidate join is an EQUI-join on cell ids (each point probes its 9
  * neighbor cells), never a cross join, and its fan-out is bounded by
  * local density (what DBSCAN assumes anyway). All exchanges carry
  * (id, x, y) longs; the flood loop is edge-sized joins over the core
  * subgraph with localCheckpoint per round.
  */
object Dbscan {

  /** Planted integer point layout over the embeddings table, replayable
    * in SQL: 8 dense square blobs on a 4×2 grid of 1000-unit spacing
    * (side 81, so blob diameter ≈ 114), with every 17th id scattered
    * uniformly over the bounding box as background noise. Offsets come
    * from the portable 60-bit md5 hash — the same rendering DuckDB uses.
    */
  def synthesizePoints(embs: DataFrame, idCol: String = "vec_id")
      : DataFrame = {
    def h(tag: String): Column =
      conv(substring(md5(concat(lit(tag + ":"), col("id").cast("string"))),
        1, 15), 16, 10).cast("long")
    embs.select(col(idCol).cast("long").as("id"))
      .select(col("id"),
        when(pmod(col("id"), lit(17)) === 0, pmod(h("dbnx"), lit(4100L)))
          .otherwise(pmod(col("id"), lit(8)) % 4 * 1000 +
            pmod(h("dbx"), lit(81L))).as("x"),
        when(pmod(col("id"), lit(17)) === 0, pmod(h("dbny"), lit(1100L)))
          .otherwise(expr("id % 8 div 4") * 1000 +
            pmod(h("dby"), lit(81L))).as("y"))
  }

  /** Run DBSCAN over (id, x, y) rows with NON-NEGATIVE integer
    * coordinates (shift before calling; floor-division cell ids disagree
    * across engines below zero). A point is CORE when ≥ `minPts` points
    * (itself included) lie within L2 distance `eps`; core clusters are
    * min-id flooded `rounds` times over the core-core eps graph; border
    * points take the smallest adjacent core's cluster; everything else
    * is noise (cluster -1). Returns (id, cluster, is_core).
    */
  def cluster(pts: DataFrame, eps: Long, minPts: Int, rounds: Int)
      : DataFrame = {
    require(eps >= 1 && minPts >= 2 && rounds >= 1)
    val cells = pts
      .select(col("id"), col("x"), col("y"),
        expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
      .localCheckpoint()
    val off = array((-1 to 1).map(i => lit(i)): _*)
    val probes = cells
      .select(col("id"), col("x"), col("y"), col("cx"), col("cy"),
        explode(off).as("dx"))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("dx")).as("pcx"), col("cy"), explode(off).as("dy"))
      .select(col("id"), col("x"), col("y"), col("pcx"),
        (col("cy") + col("dy")).as("pcy"))
    val right = cells.select(col("id").as("bi"), col("x").as("bx"),
      col("y").as("by"), col("cx").as("bcx"), col("cy").as("bcy"))
    // ordered neighbor pairs (each unordered pair appears exactly twice —
    // once per direction; the (dx,dy) probe matching b's cell is unique,
    // so no pair is double-counted within a direction)
    val pairs = probes
      .join(right, col("pcx") === col("bcx") && col("pcy") === col("bcy") &&
        col("id") =!= col("bi"))
      .withColumn("d2",
        (col("x") - col("bx")) * (col("x") - col("bx")) +
          (col("y") - col("by")) * (col("y") - col("by")))
      .filter(col("d2") <= eps * eps)
      .select(col("id").as("ai"), col("bi"))
      .localCheckpoint()
    val core = pairs.groupBy(col("ai").as("id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") + 1 >= minPts)
      .select("id")
      .localCheckpoint()
    val ce = pairs
      .join(core.withColumnRenamed("id", "ai"), Seq("ai"), "left_semi")
      .join(core.withColumnRenamed("id", "bi"), Seq("bi"), "left_semi")
      .select("ai", "bi")
      .localCheckpoint()
    var lbl = core.select(col("id"), col("id").as("lbl"))
    (1 to rounds).foreach { _ =>
      val nbrMin = ce
        .join(lbl.select(col("id").as("bi"), col("lbl").as("nl")), "bi")
        .groupBy(col("ai").as("id")).agg(min("nl").as("nm"))
      lbl = lbl.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nm"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    val border = pairs
      .join(core.withColumnRenamed("id", "ai"), Seq("ai"), "left_anti")
      .join(lbl.select(col("id").as("bi"), col("lbl").as("bl")), "bi")
      .groupBy(col("ai").as("id")).agg(min("bl").as("border_lbl"))
    pts.select(col("id"))
      .join(lbl, Seq("id"), "left")
      .join(border, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("lbl"), col("border_lbl"), lit(-1L)).as("cluster"),
        col("lbl").isNotNull.cast("int").as("is_core"))
  }
}
