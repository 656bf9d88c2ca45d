package graft

import org.apache.spark.sql.SparkSession

/** Standalone control-plane server — boots a SparkSession, a lake log
  * and the REST transport, then blocks. The process `scripts/demo.sh`
  * (the reference's `demo/demo.sh` + `fault-tolerance-demo.sh`
  * walkthroughs re-expressed against this engine) drives end-to-end.
  *
  *   SPARK_GRAFT_PORT=8081 SPARK_GRAFT_LAKE_DIR=/tmp/graftlake \
  *     sbt -batch "runMain graft.Serve"
  *
  * Prints `graft-serve ready port=<p> lake=<dir>` once the listener is
  * bound (the demo script waits for /health anyway; the line is for
  * humans tailing the log). Port 0 binds an ephemeral port.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("SPARK_GRAFT_PORT", "8081").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val lakeDir = sys.env.get("SPARK_GRAFT_LAKE_DIR")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Files.createTempDirectory("graftserve"))
    java.nio.file.Files.createDirectories(lakeDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-serve")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new graft.lake.LakeLog(lakeDir)
    val resultRoot = java.nio.file.Files
      .createDirectories(lakeDir.resolve("_results")).toString
    val server = new graft.api.RestServer(spark, log, resultRoot, port)
      .start()
    println(s"graft-serve ready port=${server.boundPort} lake=$lakeDir")
    // block until killed; the shutdown hook closes the listener
    sys.addShutdownHook { server.stop(); spark.stop() }
    Thread.currentThread().join()
  }
}
