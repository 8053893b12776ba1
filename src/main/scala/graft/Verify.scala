package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to named queries (local iteration;
    // the driver always passes exactly two args = full run)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // CacheScope releases the query's own persisted intermediates at
      // consumption; clearCache stays as the backstop for anything
      // persisted outside the scope discipline
      System.err.println(s"[verify] start $name")
      try CacheScope.scoped {
        // repartition(1), NOT coalesce(1): coalesce merges partitions
        // WITHOUT an exchange, which collapses a map-only query's
        // entire scan+compute into one task — measured at sf10, the
        // dump crawled at minutes per query. repartition keeps the
        // compute wide and only the file write is single-task; the
        // checker sorts rows, so output order is irrelevant.
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      // SPARK_GRAFT_VERIFY_GC=1: force a GC after each query so the
      // ContextCleaner reclaims that query's now-unreferenced shuffle
      // files immediately — same lesson as Bench's SPARK_GRAFT_BENCH_GC
      // (r16 sf100: No-space-left with >40 GB of dead shuffle under a
      // heap that never collected). A big-SF sharded Verify sweep hits
      // the identical accumulation; gate-scale runs don't need it.
      if (sys.env.get("SPARK_GRAFT_VERIFY_GC").contains("1")) {
        System.gc()
        Thread.sleep(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
