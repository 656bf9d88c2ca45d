package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional: run only the named queries (local iteration; the driver
    // always passes exactly two args and gets the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query watchdog: one wedged query must not consume the whole
    // correctness budget — cancel its job group and move on
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toInt
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val metrics = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    // the attempted-query manifest is written BEFORE the loop: if the
    // whole process dies mid-run, the checker must still see which
    // queries were supposed to produce output (writing it at the end
    // would reopen the round-4 silently-vanishing-queries window)
    val attempted = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      attempted.map(jstr).mkString("[", ",", "]"))
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val task = Future {
          spark.sparkContext.setJobGroup(name, name,
            interruptOnCancel = true)
          try {
            val t0 = System.nanoTime()
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            val durationSec = (System.nanoTime() - t0) / 1e9
            // rows from the written parquet's footer — no re-execution
            val rows = spark.read.parquet(s"$outDir/$name").count()
            metrics.synchronized { metrics += ((name, durationSec, rows)) }
          } finally spark.sparkContext.clearJobGroup()
        }
        Await.result(task, timeoutSec.seconds)
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[verify] $name failed: timeout after ${timeoutSec}s")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop this query's persisted intermediates before the next one —
      // the same per-query bound Bench applies: 273 queries' worth of
      // stale caches would otherwise ride executor memory all run
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query observability (duration + result rows), the Verify-side
    // slice of the reference's lakehouse_query_duration_seconds series
    // synchronized read: a timed-out query's Future may still be running
    // and appending concurrently with this final snapshot
    val metricsSnapshot = metrics.synchronized { metrics.sortBy(_._1).toSeq }
    Files.writeString(Paths.get(s"$outDir/metrics.json"),
      metricsSnapshot.map { case (n, d, r) =>
        s""""$n":{"duration_sec":$d,"rows":$r}""" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
