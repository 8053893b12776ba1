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
    // Pseudo-ids for the conversion queries whose registry fn runs the
    // conversion EAGERLY and returns only the read-back (dwca08/13):
    // these explain the conversion plan itself — the thing the star
    // join / broadcast-gate changes actually shape.
    val pseudo: Map[String, SparkSession => org.apache.spark.sql.DataFrame] = Map(
      "dwca08_conversion_plan" -> { sp =>
        graft.dwca.BulkFixture.ensure()
        graft.dwca.DwcaConvert.convert(sp, graft.dwca.BulkFixture.zipPath,
          graft.dwca.DwcaConvert.GeomWktString, zipScan = true)
      },
      "dwca13_conversion_plan" -> { sp =>
        graft.dwca.BulkFixture.ensure()
        graft.dwca.DwcaConvert.convert(sp, graft.dwca.BulkFixture.zipPath,
          graft.dwca.DwcaConvert.GeomWktString, staged = true)
      },
      // the sniffer CLASSIFY pass over the bulk core member — an eager
      // kernel job the conversion explains can't show (it runs before
      // the conversion plan exists); this pins its shape (posexplode +
      // groupBy(pos, mask), r20's reformulation) as committed evidence
      "dwca_classify_plan" -> { sp =>
        graft.dwca.BulkFixture.ensure()
        val meta = graft.dwca.DwcaMeta.fromZip(graft.dwca.BulkFixture.zipPath)
        val lines = graft.sources.ZipSource.stagedLines(sp,
          graft.dwca.BulkFixture.zipPath, meta.core.location, meta.core.encoding)
        val schema = org.apache.spark.sql.types.StructType(meta.core.headers.map(h =>
          org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
        val raw = sp.read.option("header", "false").option("sep", meta.core.sepLiteral)
          .option("escape", "\"").schema(schema)
          .csv(sp.createDataset(lines.rdd.mapPartitionsWithIndex(
            (i, it) => if (i == 0) it.drop(1) else it))(
            org.apache.spark.sql.Encoders.STRING))
        graft.sources.SnifferCsv.maskGroups(raw, withPrefix = true)
      })
    ids.foreach { id =>
      println(s"\n===== $id =====")
      try pseudo.get(id) match {
        case Some(f) => f(spark).explain("formatted")
        case None => SparkEntry.registry(id).fn(spark, sfDir).explain("formatted")
      }
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
