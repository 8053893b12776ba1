package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: does the bulk conversion's written parquet read back with
  * EXACTLY df.schema (incl. nullability)? Decides whether the bench
  * read-backs can pass the writer's schema and skip re-inference. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder()).master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.dwca.BulkFixture.ensure()
    val df = graft.dwca.DwcaConvert.convert(spark, graft.dwca.BulkFixture.zipPath,
      graft.dwca.DwcaConvert.GeomWktString, zipScan = true)
    graft.sinks.Sinks.writeZstd(df, graft.dwca.BulkFixture.outParquet)
    val back = spark.read.parquet(graft.dwca.BulkFixture.outParquet).schema
    println(s"df.schema   = ${df.schema.map(f => (f.name, f.dataType.simpleString, f.nullable))}")
    println(s"back.schema = ${back.map(f => (f.name, f.dataType.simpleString, f.nullable))}")
    println(s"EQUAL: ${df.schema == back}")
    spark.stop()
  }
}
