package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.Charset
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.dwca.DwcaLayer

/** Distributed zip-member scan — the 100 TB-tier replacement for the
  * extract-to-scratch staging (SURVEY §2.1 S1 "scale path"). The
  * reference funnels every byte through one local download
  * (`/root/reference/src/dwca_parquet/libs/parquet.py:36-42`); here
  * each zip member is streamed directly from shared storage (any
  * Hadoop FileSystem: file://, s3a://, hdfs://) on an executor.
  *
  * Parallelism unit: one task per (archive, member). DEFLATE streams
  * are not internally splittable, so a single member is one stream —
  * the right granularity for the DwC-A fleet shape (thousands of
  * archives × a handful of members each). The text lines then feed
  * Spark's CSV parser (`DataFrameReader.csv(Dataset[String])`), so
  * inference/parsing matches the extracted path exactly.
  */
object ZipSource {

  /** Lines of one zip member, streamed on an executor. The Hadoop
    * conf's fs.* settings travel as a plain map (Configuration is not
    * serializable). */
  def memberLines(spark: SparkSession, zipPath: String, member: String,
      encoding: String = "UTF-8"): Dataset[String] = {
    import spark.implicits._
    val fsConf = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter(_._1.startsWith("fs.")).toMap
    val bc = spark.sparkContext.broadcast(fsConf)
    spark.createDataset(Seq(member)).repartition(1).mapPartitions { it =>
      it.flatMap { m =>
        val conf = new Configuration()
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        val p = new Path(zipPath)
        val in = p.getFileSystem(conf).open(p)
        val zin = new ZipInputStream(in)
        var entry = zin.getNextEntry
        while (entry != null && entry.getName != m) entry = zin.getNextEntry
        if (entry == null) {
          zin.close()
          throw new IllegalArgumentException(s"zip member $m missing in $zipPath")
        }
        val reader = new BufferedReader(
          new InputStreamReader(zin, Charset.forName(encoding)))
        // lazy line iterator; closes the stream on exhaustion
        new Iterator[String] {
          private var nextLine = reader.readLine()
          def hasNext: Boolean = nextLine != null
          def next(): String = {
            val l = nextLine
            nextLine = reader.readLine()
            if (nextLine == null) reader.close()
            l
          }
        }
      }
    }
  }

  /** CSV scan of a DwC-A layer straight out of the archive — same
    * DuckDB-parity typing as the extracted path
    * (see DwcaConvert.readLayer), no staging. */
  def readLayer(spark: SparkSession, zipPath: String, layer: DwcaLayer): DataFrame =
    SnifferCsv.readLines(spark,
      memberLines(spark, zipPath, layer.location, layer.encoding), layer.sepLiteral,
      coreSampleCheck = !layer.isExtension)
}
