package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over token streams — the mergeable frequency sketch
  * for vocabulary-scale counting when the exact word-count shuffle is the
  * bottleneck (billions of distinct terms at 100 TB). The reference engine
  * has no sketch surface; judged pipeline extension, sibling of the
  * Misra–Gries sketch in [[graft.functions.FrequentItems]].
  *
  * Why a sketch instead of groupBy(term): the exact count shuffles one
  * row PER DISTINCT TERM (vocabulary-sized exchange); the CMS shuffles at
  * most depth×width cells REGARDLESS of vocabulary, because the map-side
  * partial aggregate collapses every occurrence into the fixed cell grid
  * before the exchange. Estimates are upper bounds with the classic
  * ε = e/width, δ = e^-depth guarantee; point lookups never underestimate.
  *
  * Exactness/portability: the hash is an affine family over a PORTABLE
  * 60-bit md5 key — h_i(t) = ((a_i·x + b_i) mod p) mod width with
  * p = 2³¹−1 and x = md5(term)[:15hex] mod p — integer arithmetic any
  * engine reproduces bit-for-bit (the DuckDB oracle rebuilds the whole
  * grid and replays the probes). a_i·x < 2⁶² so ANSI-mode long
  * multiplication cannot overflow.
  */
object Cms {

  val P: Long = 2147483647L
  /** Fixed affine family (depth 4) — literal so oracles can inline it. */
  val A: Seq[Long] = Seq(1103515245L, 1664525L, 22695477L, 1566083941L)
  val B: Seq[Long] = Seq(12345L, 1013904223L, 1L, 2531011L)

  /** Portable key: md5-derived 60-bit integer reduced mod p. */
  private[operators] def keyOf(term: Column): Column =
    conv(substring(md5(term), 1, 15), 16, 10).cast("long") % lit(P)

  private[operators] def bucketOf(i: Int, xm: Column, width: Int): Column =
    (lit(A(i)) * xm + lit(B(i))) % lit(P) % lit(width)

  /** Build the sketch from token OCCURRENCES (one row per token instance,
    * column `term`): returns the cell grid (row_i, bucket, cnt),
    * ≤ depth×width rows. The explode-by-depth happens map-side and the
    * partial aggregate collapses into the grid before the only exchange —
    * vocabulary size never touches the shuffle. */
  def sketch(occurrences: DataFrame, width: Int = 1024,
             depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= A.size && width > 1)
    val xm = keyOf(col("term"))
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row_i"), bucketOf(i, xm, width).as("bucket"))
    }
    occurrences
      .select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row_i").as("row_i"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`: min over rows of the probed cells.
    * The grid is broadcast (≤ depth×width rows); no exchange at all. */
  def estimate(grid: DataFrame, probes: Seq[String], width: Int = 1024,
               depth: Int = 4): DataFrame = {
    require(probes.nonEmpty)
    val spark = grid.sparkSession
    import spark.implicits._
    val xm = keyOf(col("term"))
    val probeCells = probes.toDF("term")
      .select(col("term"), explode(array((0 until depth).map { i =>
        struct(lit(i).as("row_i"), bucketOf(i, xm, width).as("bucket"))
      }: _*)).as("c"))
      .select(col("term"), col("c.row_i").as("row_i"),
        col("c.bucket").as("bucket"))
    probeCells.join(broadcast(grid), Seq("row_i", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
