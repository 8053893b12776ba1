package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.Charset
import java.util
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 over the text members of a zip archive — the
  * polished form of the [[ZipSource]] scan (SURVEY §2.1 S1 scale
  * path):
  *
  * {{{
  * spark.read.format("graft.sources.ZipLinesSource")
  *   .option("path", "s3a://bucket/archive.zip")
  *   .option("encoding", "UTF-8")
  *   .load()                      // schema: member string, line string
  *   .where("member = 'occurrence.txt'")
  * }}}
  *
  * Planning lists the archive's entries on the driver and emits ONE
  * InputPartition PER MEMBER; an `member = '…'` equality filter is
  * pushed down and prunes partitions before they are scheduled, so a
  * single-member read schedules a single task. Executors stream their
  * entry straight from the Hadoop FileSystem (no extraction). DEFLATE
  * members are single streams — the parallelism unit is
  * (archive, member), the natural shape for DwC-A fleets.
  */
class ZipLinesSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipLinesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZipLinesTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("option 'path' (zip location) is required")),
      Option(properties.get("encoding")).getOrElse("UTF-8"))
}

object ZipLinesSource {
  val schema: StructType = StructType(Seq(
    StructField("member", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

private class ZipLinesTable(path: String, encoding: String) extends Table with SupportsRead {
  override def name(): String = s"zip:$path"
  override def schema(): StructType = ZipLinesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Capture the session's fs.* settings (s3a credentials/endpoint,
    // Fetch.configureS3a) here on the driver — Configuration itself is
    // not serializable, a String map is; planning and every reader
    // rebuild the configured filesystem from it (same pattern as
    // ZipSource.memberLines).
    val fsConf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter(_._1.startsWith("fs.")).toMap
    new ZipLinesScanBuilder(path, encoding, fsConf)
  }
}

private object ZipLinesSourceConf {
  def hadoopConf(fsConf: Map[String, String]): Configuration = {
    val conf = new Configuration()
    fsConf.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

private class ZipLinesScanBuilder(path: String, encoding: String, fsConf: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var memberEq: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("member", _: String) => true
      case _ => false
    }
    pushed = accepted
    memberEq = accepted.collectFirst { case EqualTo("member", v: String) => v }
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ZipLinesScan(path, encoding, memberEq, fsConf)
}

private case class ZipMemberPartition(member: String) extends InputPartition

private class ZipLinesScan(path: String, encoding: String, memberEq: Option[String],
    fsConf: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = ZipLinesSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ZipLines(path=$path${memberEq.map(m => s", member=$m").getOrElse("")})"

  /** Driver-side entry listing; partition pruning via the pushed
    * member filter happens HERE, before any task is scheduled. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = ZipLinesSourceConf.hadoopConf(fsConf)
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val zin = new ZipInputStream(in)
    val members = try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filterNot(_.isDirectory).map(_.getName).toArray
    } finally zin.close()
    members
      .filter(m => memberEq.forall(_ == m))
      .map(ZipMemberPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipLinesReaderFactory(path, encoding, fsConf)
}

private class ZipLinesReaderFactory(path: String, encoding: String, fsConf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val member = partition.asInstanceOf[ZipMemberPartition].member
    new ZipLinesReader(path, member, encoding, fsConf)
  }
}

private class ZipLinesReader(path: String, member: String, encoding: String,
    fsConf: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val reader: BufferedReader = {
    val p = new Path(path)
    val in = p.getFileSystem(ZipLinesSourceConf.hadoopConf(fsConf)).open(p)
    val zin = new ZipInputStream(in)
    var entry = zin.getNextEntry
    while (entry != null && entry.getName != member) entry = zin.getNextEntry
    if (entry == null) {
      zin.close()
      throw new IllegalArgumentException(s"zip member $member missing in $path")
    }
    new BufferedReader(new InputStreamReader(zin, Charset.forName(encoding)))
  }
  private val memberUtf8 = UTF8String.fromString(member)
  private var line: String = _

  override def next(): Boolean = {
    line = reader.readLine()
    line != null
  }

  override def get(): InternalRow =
    InternalRow(memberUtf8, UTF8String.fromString(line))

  override def close(): Unit = reader.close()
}
