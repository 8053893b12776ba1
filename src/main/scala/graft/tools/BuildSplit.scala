package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf scratchpad: per bench query, the min-of-3 split of a steady-
  * state invocation into fn-construction (parse + eager analysis +
  * any eager kernel jobs) vs consume (count) — decides where
  * prepared-plan reuse would pay. Not part of the gate or bench. */
object BuildSplit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("GRAFT_SPLIT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    graft.SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try graft.CacheScope.scoped {
          fn(spark, d).count() // warmup
          val splits = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            val df = fn(spark, d)
            val t1 = System.nanoTime()
            df.count()
            val t2 = System.nanoTime()
            ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
          }
          val b = splits.map(_._1).min
          val e = splits.map(_._2).min
          println(f"[split] $name%-28s build $b%6.3f  consume $e%6.3f")
        } catch {
          case ex: Throwable => println(s"[split] $name FAILED: ${ex.getMessage}")
        }
      }
    spark.stop()
  }
}
