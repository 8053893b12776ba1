package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print `explain("formatted")` for registered
  * queries. `runMain graft.Explain <sfDir> [queryId ...]` (no ids →
  * all). Used to keep the plans honest: pushed filters visible in
  * scans, broadcast on dim joins, partial aggregation below
  * exchanges, no cartesian products.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val ids = if (args.length > 1) args.tail.toSeq else SparkEntry.registry.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ids.foreach { id =>
      println(s"\n===== $id =====")
      try SparkEntry.registry(id).fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
