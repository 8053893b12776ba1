package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary experiment harness (not registered anywhere; deleted
// before commit)
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Similarity.scratchRecall(spark, sfDir)
    spark.stop()
  }
}
