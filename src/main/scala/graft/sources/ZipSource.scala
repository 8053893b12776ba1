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

  /** Default auto-staging threshold (uncompressed bytes): a DEFLATE
    * member bigger than this is worth one staging pass — past ~256 MiB
    * the single-stream decompression dominates a conversion's wall
    * clock, while the staged re-chunk costs the same one decompression
    * and then scans at full cluster width. STORED members never stage
    * (they split by byte range in place). */
  val AutoStageBytes: Long = 256L * 1024 * 1024

  /** Central-directory entry for one member — None when the archive
    * is exotic (zip64, malformed tail) or the member is absent; cost
    * is two bounded metadata reads, never the archive body. */
  def memberEntry(spark: SparkSession, zipPath: String,
      member: String): Option[ZipCentral.Entry] =
    ZipCentral.entries(spark.sparkContext.hadoopConfiguration, zipPath)
      .flatMap(_.find(_.name == member))

  /** True when scans of `member` should auto-route through
    * [[stagedMemberDir]]: compressed (no random access, so the member
    * is one stream) and uncompressed-bigger than `threshold`. Exotic
    * archives answer false — they keep streaming semantics. */
  def shouldAutoStage(spark: SparkSession, zipPath: String, member: String,
      threshold: Long = AutoStageBytes): Boolean =
    threshold > 0 && memberEntry(spark, zipPath, member)
      .exists(e => !e.stored && e.usize > threshold)

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
    // one explicit slice, NOT createDataset(Seq).repartition(1): the
    // repartition inserted a (tiny but real) round-robin Exchange +
    // extra stage into EVERY member scan's plan
    spark.createDataset(spark.sparkContext.parallelize(Seq(member), 1)).mapPartitions { it =>
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

  /** Staged re-chunking — the DEFLATE escape hatch made a real code
    * path (SURVEY §2.1 S1; the ceiling is documented on
    * [[ZipLinesSource]]): a DEFLATE stream has no random access, so a
    * huge compressed member is inherently ONE decompression stream.
    * This pays that single pass exactly once — re-writing the member
    * as plain uncompressed text on scratch storage — after which
    * every scan goes wide via ordinary Hadoop line-aligned splits
    * (`maxPartitionBytes`), and the expensive work (typing, parsing,
    * joins, geometry) runs at full cluster width. Staging is
    * fingerprint-keyed on the archive's (mtime, length) via
    * [[graft.Staged]]: a changed archive re-stages, an unchanged one
    * never pays the pass again, and a concurrent JVM sees either
    * nothing or the atomically-published artifact. The staged text is
    * UTF-8 regardless of the member's source encoding (memberLines
    * already decoded), so even non-ASCII-compatible members become
    * splittable — strictly better than the streaming fallback.
    *
    * Returns the directory of staged line files. */
  def stagedMemberDir(spark: SparkSession, zipPath: String, member: String,
      encoding: String = "UTF-8", scratchRoot: Option[String] = None): String = {
    def safe(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = scratchRoot.getOrElse(new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-zipstage").toString)
    val dir = new java.io.File(
      new java.io.File(root, safe(zipPath)), safe(member)).toString
    val p = new Path(zipPath)
    val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
    graft.Staged.ensure(dir, s"${st.getModificationTime}-${st.getLen}") {
      memberLines(spark, zipPath, member, encoding)
        .write.mode("overwrite").text(s"$dir/lines")
    }
    s"$dir/lines"
  }

  /** The staged member's lines as a WIDE dataset (Hadoop text splits;
    * partition 0 starts at byte 0, so header-first-line consumers —
    * RegexCsv, SnifferCsv — see the same line order as the stream). */
  def stagedLines(spark: SparkSession, zipPath: String, member: String,
      encoding: String = "UTF-8"): Dataset[String] =
    spark.read.textFile(stagedMemberDir(spark, zipPath, member, encoding))

  /** CSV scan of a DwC-A layer through the staged re-chunk — same
    * typing as [[readLayer]], wide parse. */
  def readLayerStaged(spark: SparkSession, zipPath: String, layer: DwcaLayer): DataFrame =
    SnifferCsv.readLines(spark,
      stagedLines(spark, zipPath, layer.location, layer.encoding), layer.sepLiteral,
      coreSampleCheck = !layer.isExtension, headers = Some(layer.headers))

  /** CSV scan of a DwC-A layer straight out of the archive — same
    * DuckDB-parity typing as the extracted path
    * (see DwcaConvert.readLayer), no staging. */
  def readLayer(spark: SparkSession, zipPath: String, layer: DwcaLayer): DataFrame =
    SnifferCsv.readLines(spark,
      memberLines(spark, zipPath, layer.location, layer.encoding), layer.sepLiteral,
      coreSampleCheck = !layer.isExtension, headers = Some(layer.headers))
}
