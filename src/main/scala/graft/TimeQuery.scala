package graft

import org.apache.spark.sql.SparkSession

/** Time one registered query with the bench methodology (untimed
  * warmup, median of 3) — for profiling queries outside the headline
  * bench set: `sbt "runMain graft.TimeQuery d06_simhash_pairs [sfDir]"`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(s"""{"query":"$name","median_sec":${times(1)},"runs":[${times.mkString(",")}]}""")
    spark.stop()
  }
}
