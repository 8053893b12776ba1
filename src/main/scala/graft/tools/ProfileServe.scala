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
