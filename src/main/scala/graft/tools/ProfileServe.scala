package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf scratchpad for the s28 serve-path latency flag: splits each
  * invocation into plan-build (routing collects happen here) vs
  * execute (the count), so the flagged ~1 s can be attributed before
  * it is optimized. Not part of the gate or bench surface. */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHE_AQE", "true")) // match Sessions.scaleDefensive
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobT = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobT.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobT.remove(j.jobId)
        println(f"    job ${j.jobId}: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      // GRAFT_PROFILE_STAGES=1: per-stage wall + summed task run time +
      // the first line of the stage's callsite — maps jobs to operators
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sys.env.get("GRAFT_PROFILE_STAGES").contains("1")) {
          val i = s.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          val run = i.taskMetrics.executorRunTime / 1e3
          val cpu = i.taskMetrics.executorCpuTime / 1e9
          val des = i.taskMetrics.executorDeserializeTime / 1e3
          val gc = i.taskMetrics.jvmGCTime / 1e3
          val sw = i.taskMetrics.shuffleWriteMetrics.bytesWritten
          val sr = i.taskMetrics.shuffleReadMetrics.totalBytesRead
          println(f"      stage ${i.stageId}%4d tasks=${i.numTasks}%3d wall=$wall%6.3f " +
            f"run=$run%6.3f cpu=$cpu%6.3f gc=$gc%5.3f deser=$des%6.3f swB=$sw srB=$sr  ${i.name.takeWhile(_ != '\n')}")
        }
    })
    // GRAFT_PROFILE_Q picks any registry query; default is the
    // original s28 latency flag this scratchpad was written for
    val fn = graft.SparkEntry.queries(
      sys.env.getOrElse("GRAFT_PROFILE_Q", "s28_serve_only"))
    fn(spark, d).count() // warmup: lazy index build + codegen
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"run $i: build ${(t1 - t0) / 1e9}%.3f s  plan ${(t2 - t1) / 1e9}%.3f s  exec ${(t3 - t2) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
