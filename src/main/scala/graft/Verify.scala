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
    // SPARK_GRAFT_SHUFFLE_METRICS=1: per-query shuffle totals on
    // stderr — the measured answer to "did that plan change cut the
    // exchange" (g02's bloom prefilter at sf10 is the motivating
    // case; .explain shows WHERE the filter sits, only task metrics
    // show HOW MANY bytes/rows crossed).
    val shuffleMetrics =
      if (sys.env.get("SPARK_GRAFT_SHUFFLE_METRICS").contains("1")) {
        val m = new ShuffleTotalsListener
        spark.sparkContext.addSparkListener(m)
        Some(m)
      } else None
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // CacheScope releases the query's own persisted intermediates at
      // consumption; clearCache stays as the backstop for anything
      // persisted outside the scope discipline
      System.err.println(s"[verify] start $name")
      val t0 = System.nanoTime()
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
      // per-query dump wall time: the cheap whole-registry perf signal
      // (the bench covers 28 queries; this line covers all 275)
      System.err.println(f"[verify] done $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      shuffleMetrics.foreach { m =>
        // The listener bus is asynchronous: task-end events from the
        // query just finished can still be in flight when we drain.
        // Barrier = run a trivial zero-shuffle action (its events are
        // enqueued BEHIND the query's — the bus is FIFO) then yield
        // briefly; totals remain approximate under extreme bus lag,
        // but in practice this closes the misattribution window.
        spark.sparkContext.parallelize(Seq(1), 1).count()
        Thread.sleep(200)
        System.err.println(s"[verify] shuffle $name ${m.drain()}")
      }
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
    shuffleMetrics.foreach(m => spark.sparkContext.removeSparkListener(m))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

/** Accumulates task-level shuffle totals between [[drain]] calls —
  * the per-query exchange cost a plan audit can't read off
  * `.explain`. Thread-safe the way SparkListeners need to be (the
  * listener bus is single-threaded, but drain() races with it). */
private[graft] class ShuffleTotalsListener
    extends org.apache.spark.scheduler.SparkListener {
  private val writeB = new java.util.concurrent.atomic.AtomicLong
  private val writeR = new java.util.concurrent.atomic.AtomicLong
  private val readB = new java.util.concurrent.atomic.AtomicLong
  private val readR = new java.util.concurrent.atomic.AtomicLong
  private val spillB = new java.util.concurrent.atomic.AtomicLong
  override def onTaskEnd(
      t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      writeB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      writeR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      readB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      readR.addAndGet(m.shuffleReadMetrics.recordsRead)
      spillB.addAndGet(m.diskBytesSpilled)
    }
  }
  /** Snapshot-and-reset; returns one human-parsable key=value line. */
  def drain(): String = {
    val s = s"write_bytes=${writeB.get} write_records=${writeR.get} " +
      s"read_bytes=${readB.get} read_records=${readR.get} " +
      s"disk_spill_bytes=${spillB.get}"
    writeB.set(0); writeR.set(0); readB.set(0); readR.set(0); spillB.set(0)
    s
  }
}
