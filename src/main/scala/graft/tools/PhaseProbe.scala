package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf scratchpad: splits one dwca conversion invocation into its
  * driver-side phases (fixture check, meta discovery, layer scans,
  * write action, read-back) so the non-job driver gap the stage
  * profiler shows can be attributed. Not part of the gate or bench. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val staged = !sys.env.get("GRAFT_PHASE_ZIPSCAN").contains("1")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"    phase $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warmup
    graft.dwca.BulkFixture.ensure()
    locally {
      val df = graft.dwca.DwcaConvert.convert(spark, graft.dwca.BulkFixture.zipPath,
        graft.dwca.DwcaConvert.GeomWktString, zipScan = !staged, staged = staged)
      graft.sinks.Sinks.writeZstd(df, graft.dwca.BulkFixture.outParquetStaged)
      spark.read.parquet(graft.dwca.BulkFixture.outParquetStaged).count()
    }

    // sub-step timing of ONE core-layer scan (the staged path)
    if (staged) for (i <- 1 to 2) {
      val meta = graft.dwca.DwcaMeta.fromZip(graft.dwca.BulkFixture.zipPath)
      val lines = t("stagedLines (ensure+open)")(
        graft.sources.ZipSource.stagedLines(spark, graft.dwca.BulkFixture.zipPath,
          meta.core.location, meta.core.encoding))
      val typed = t("readLines (classify+type)")(
        graft.sources.SnifferCsv.readLines(spark, lines, meta.core.sepLiteral,
          coreSampleCheck = true, headers = Some(meta.core.headers)))
      println(s"  scan sub-steps round $i done (${typed.columns.length} cols)")
    }

    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      t("BulkFixture.ensure")(graft.dwca.BulkFixture.ensure())
      t("GeoFunctions.register")(graft.functions.GeoFunctions.register(spark))
      val meta = t("DwcaMeta.fromZip")(graft.dwca.DwcaMeta.fromZip(graft.dwca.BulkFixture.zipPath))
      val df = t("convert (scans+plan)") {
        graft.dwca.DwcaConvert.convert(spark, graft.dwca.BulkFixture.zipPath,
          graft.dwca.DwcaConvert.GeomWktString, zipScan = !staged, staged = staged)
      }
      t("analyze+optimize+plan")(df.queryExecution.executedPlan)
      t("writeZstd")(graft.sinks.Sinks.writeZstd(df, graft.dwca.BulkFixture.outParquetStaged))
      val rb = t("read-back open")(spark.read.parquet(graft.dwca.BulkFixture.outParquetStaged))
      t("read-back count")(rb.count())
      println(f"  run $i total ${(System.nanoTime() - t0) / 1e9}%.3f s  (layers=${meta.layers.size})")
    }
    spark.stop()
  }
}
