package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Phase-level profiler for one declared query: registers a listener that
  * prints every Spark job's wall time + its first stage's name AND the
  * driver-side gap since the previous job ended, so a multi-action
  * lifecycle query (lake DML, streaming harness) can be attributed job by
  * job without the UI (disabled in bench runs). Large gaps = driver work
  * (planning, codegen, log I/O, footer reads) between actions.
  * Measurement-only tooling — never invoked by Bench/Verify.
  *
  * Usage: sbt "runMain graft.ProfileQ /root/testdata/sf0.1 q_lake_mv"
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // (jobId, startNs, endNs, desc)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name.take(90)))
          .getOrElse("?")
        jobStart.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(je.jobId)).foreach { case (t0, desc) =>
          events.add((je.jobId, t0, System.nanoTime(), desc))
        }
      }
    })
    args.drop(1).foreach { q =>
      // one warm pass unprofiled mirrors Bench's min-of-3 (JIT/codegen paid)
      val reps = sys.env.getOrElse("PROFILE_REPS", "2").toInt
      (1 until reps).foreach(_ => SparkEntry.queries(q)(spark, dir).count())
      events.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      val tEnd = System.nanoTime()
      val sec = (tEnd - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(s"=== $q rows=$n total=${f"$sec%.2f"}s ===")
      import scala.jdk.CollectionConverters._
      val evs = events.asScala.toSeq.sortBy(_._2)
      var prevEnd = t0
      var jobMs = 0.0
      var gapMs = 0.0
      evs.foreach { case (id, s, e, desc) =>
        val gap = (s - prevEnd) / 1e6
        val dur = (e - s) / 1e6
        jobMs += dur; gapMs += math.max(0, gap)
        if (dur >= 5 || gap >= 15)
          println(f"JOB $id%4d gap=$gap%7.1f job=$dur%7.1f ms  $desc")
        prevEnd = math.max(prevEnd, e)
      }
      gapMs += math.max(0, (tEnd - prevEnd) / 1e6)
      println(f"SUMMARY jobs=${evs.size} jobMs=$jobMs%.0f driverGapMs=$gapMs%.0f")
    }
    spark.stop()
  }
}
