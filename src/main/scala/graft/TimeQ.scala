package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ad-hoc conf probes: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    args.drop(1).foreach { q =>
      SparkEntry.benchPhases.get(q) match {
        case Some(mk) => // Bench's build/probe split, timed apart
          val (build, probe) = mk(spark, dir)
          val b0 = System.nanoTime()
          build()
          val bSec = (System.nanoTime() - b0) / 1e9
          val t0 = System.nanoTime()
          val n = probe().count()
          println(f"TIMEQ $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2fs" +
            f" build=$bSec%.2fs")
        case None =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, dir).count()
          println(f"TIMEQ $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
