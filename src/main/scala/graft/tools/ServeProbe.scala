package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off latency breakdown of the s28 serve path (local iteration
  * tool, not part of the gate): times each serve sub-stage
  * separately so bench regressions have a named cause. */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val q = graft.SparkEntry.queries("s28_serve_only")
    t("run1 (build+serve)")(q(spark, sfDir).count())
    (1 to 4).foreach(i => t(s"run${i + 1} (serve)")(q(spark, sfDir).count()))
    // stage splits on the last run
    val fn = () => q(spark, sfDir)
    val df = t("plan build")(fn())
    t("explain/analyze")(df.queryExecution.executedPlan)
    t("count")(df.count())
    spark.stop()
  }
}
