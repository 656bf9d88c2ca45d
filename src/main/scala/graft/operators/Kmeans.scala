package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means (1957/1982) over embedding vectors, in INTEGER
  * arithmetic end-to-end so every round replays bit-for-bit in a
  * cross-engine oracle: vectors quantize to `floor(e·1000) + shift`
  * (shift keeps components non-negative, making floor-division
  * engine-portable), distances are integer squared L2, assignment ties
  * break to the min centroid id, and centroid updates are per-dimension
  * `sum div count`. Deterministic init = the first k vectors by id
  * (k-means‖ sampling is the production upgrade; init is a parameter of
  * the algebra, not of the plan shape). Empty clusters carry the
  * previous centroid forward.
  *
  * Scale shape per round: ONE broadcast of the k×d centroid table onto
  * the point set (k·d longs — metadata-sized at any corpus size),
  * distances via a zip_with/aggregate over two BOUND array columns (no
  * re-evaluated subtrees), per-point argmin as a struct-ordered
  * AGGREGATE, then ONE (cid, dim) exchange of n·d (long, long) rows for
  * the update — the same fixed-width-exchange discipline as
  * [[LinkGraph]]'s iterations. Centroids round-trip through the driver
  * at k·d values per round (the BPE-dictionary-sized collect
  * precedent); points are localCheckpoint'd once, not per round.
  *
  * The quantization deliberately trades ~1e-3 resolution for exactness;
  * at embedding scale (unit-norm-ish vectors) that is far below any
  * clustering decision boundary that matters, and the float path is one
  * `transform` swap away.
  */
object Kmeans {

  /** Quantized point set: (vec_id, q: array<long>) with all components
    * shifted non-negative. */
  def quantize(emb: DataFrame, scale: Long = 1000L, shift: Long = 4000L)
      : DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        e => (floor(e.cast("double") * scale).cast("long") + shift))
        .as("q"))

  private def sqDist(q: Column, c: Column): Column =
    aggregate(zip_with(q, c, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Run `iters` Lloyd rounds with k clusters. Returns
    * (assignments, centroids): assignments = (vec_id, cid, dist) from
    * the FINAL round's assignment step; centroids = the post-final-
    * update (cid, c: array<long>) table. */
  def lloyd(points: DataFrame, k: Int, iters: Int)
      : (DataFrame, Seq[(Int, Array[Long])]) = {
    require(k >= 2 && iters >= 1, "need k >= 2, iters >= 1")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col("vec_id"), col("q")).localCheckpoint()

    var cents: Seq[(Int, Array[Long])] = pts
      .filter(col("vec_id") < k).orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0).toInt,
        r.getSeq[Long](1).toArray))
      .toSeq
    require(cents.size == k, s"init needs vec_ids 0..${k - 1} present")

    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      val cdf = cents.map { case (cid, arr) => (cid, arr.toSeq) }
        .toDF("cid", "c")
      assign = pts.crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("q"),
          struct(sqDist(col("q"), col("c")).as("dist"),
            col("cid")).as("dc"))
        .groupBy("vec_id")
        .agg(min("dc").as("best"), first("q").as("q"))
        .select(col("vec_id"), col("best.cid").as("cid"),
          col("best.dist").as("dist"), col("q"))
        .localCheckpoint()
      val sums = assign
        .select(col("cid"), posexplode(col("q")).as(Seq("j", "v")))
        .groupBy("cid", "j")
        .agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cid, prev) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Long](prev.length)
            rows.foreach { r =>
              arr(r.getInt(1)) = r.getLong(2) / r.getLong(3)
            }
            (cid, arr)
          case None => (cid, prev) // empty cluster: carry forward
        }
      }
    }
    (assign.select("vec_id", "cid", "dist"), cents)
  }

  /** Compact audit face: per cluster, size, integer inertia (sum of the
    * final assignment's squared distances) and the post-final-update
    * centroid component checksum. */
  def clusterSummary(spark: SparkSession, emb: DataFrame, k: Int,
                     iters: Int): DataFrame = {
    import spark.implicits._
    val (assign, cents) = lloyd(quantize(emb), k, iters)
    val csum = cents.map { case (cid, arr) => (cid, arr.sum) }
      .toDF("cid", "centroid_sum")
    assign.groupBy("cid")
      .agg(count(lit(1)).as("n"), sum("dist").as("inertia"))
      .join(broadcast(csum), Seq("cid"), "right")
      .select(col("cid"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("inertia"), lit(0L)).as("inertia"),
        col("centroid_sum"))
  }
}
