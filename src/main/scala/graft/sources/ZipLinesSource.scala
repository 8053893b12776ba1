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
  * Planning lists the archive's central directory on the driver and
  * emits InputPartitions; a `member = '…'` equality filter is pushed
  * down and prunes partitions before they are scheduled. Executors
  * read their entry straight from the Hadoop FileSystem (no
  * extraction). Parallelism:
  *
  *  - STORED (uncompressed) members SPLIT BY BYTE RANGE: one
  *    partition per `storedSplitBytes` (option `stored.split.bytes`,
  *    default 32 MiB) with Hadoop text-split line alignment (a split
  *    with start > 0 discards its first partial line; lines are read
  *    while their start offset ≤ the split end) — a huge stored core
  *    member scans wide like any text file.
  *  - DEFLATE members stay ONE stream each — inherent to the
  *    format (no random access into a deflate stream); the
  *    parallelism unit is (archive, member). The escape hatch at
  *    100 TB is staged re-chunking: one pass re-writing the member
  *    as splittable storage, then wide scans.
  *  - Non-ASCII-compatible encodings (where '\n' is not the single
  *    byte 0x0A) and encrypted/descriptor-flagged entries fall back
  *    to the streaming reader.
  *
  * Integrity: the streaming (per-member) reader goes through
  * `ZipInputStream`, which verifies each entry's CRC32 at entry end —
  * a corrupt archive throws. Range partitions read STORED bytes raw
  * and CANNOT check the member CRC (it covers the whole member; no
  * single split sees all of it), so a corrupt stored member returns
  * wrong rows silently where the streaming path would throw. Set
  * `stored.verify.crc=true` to trade the parallelism back for the
  * check: stored members then stay unsplit on the CRC-validating
  * streaming path.
  */
class ZipLinesSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipLinesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZipLinesTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("option 'path' (zip location) is required")),
      Option(properties.get("encoding")).getOrElse("UTF-8"),
      Option(properties.get("stored.split.bytes")).map { s =>
        val v =
          try s.toLong
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"option 'stored.split.bytes' must be a positive integer, got '$s'")
          }
        if (v <= 0) throw new IllegalArgumentException(
          s"option 'stored.split.bytes' must be > 0, got $v")
        v
      }.getOrElse(32L * 1024 * 1024),
      Option(properties.get("stored.verify.crc")).exists {
        case s if s.equalsIgnoreCase("true")  => true
        case s if s.equalsIgnoreCase("false") => false
        case s => throw new IllegalArgumentException(
          s"option 'stored.verify.crc' must be true or false, got '$s'")
      })
}

object ZipLinesSource {
  val schema: StructType = StructType(Seq(
    StructField("member", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

private class ZipLinesTable(path: String, encoding: String, splitBytes: Long,
    verifyCrc: Boolean)
    extends Table with SupportsRead {
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
    new ZipLinesScanBuilder(path, encoding, splitBytes, verifyCrc, fsConf)
  }
}

private object ZipLinesSourceConf {
  def hadoopConf(fsConf: Map[String, String]): Configuration = {
    val conf = new Configuration()
    fsConf.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

private class ZipLinesScanBuilder(path: String, encoding: String, splitBytes: Long,
    verifyCrc: Boolean, fsConf: Map[String, String])
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

  override def build(): Scan =
    new ZipLinesScan(path, encoding, splitBytes, verifyCrc, memberEq, fsConf)
}

private case class ZipMemberPartition(member: String) extends InputPartition

/** A line-aligned byte range of a STORED member: `[start, end)` in
  * member-data space, Hadoop text-split semantics. `localOff` is the
  * member's local-header offset; the reader derives the data start
  * from the local header itself (its extra field can differ from the
  * central directory's). */
private case class ZipRangePartition(member: String, localOff: Long,
    start: Long, end: Long, usize: Long) extends InputPartition

private class ZipLinesScan(path: String, encoding: String, splitBytes: Long,
    verifyCrc: Boolean, memberEq: Option[String], fsConf: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = ZipLinesSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ZipLines(path=$path${memberEq.map(m => s", member=$m").getOrElse("")})"

  /** Central directory via the shared parser ([[ZipCentral]]); None
    * on anything exotic (zip64, malformed tail), in which case
    * planning falls back to the streaming one-partition-per-member
    * listing. */
  private def centralDirectory(): Option[Seq[ZipCentral.Entry]] =
    ZipCentral.entries(ZipLinesSourceConf.hadoopConf(fsConf), path)

  /** '\n' must be the single byte 0x0A for byte-offset line splits. */
  private def asciiCompatible: Boolean = {
    val bb = Charset.forName(encoding).encode("\n")
    bb.remaining() == 1 && bb.get() == 0x0A
  }

  /** Driver-side entry listing; partition pruning via the pushed
    * member filter happens HERE, before any task is scheduled.
    * STORED members larger than one split fan out into range
    * partitions; everything else is one streaming partition. */
  override def planInputPartitions(): Array[InputPartition] = {
    val splittable = asciiCompatible && !verifyCrc
    centralDirectory() match {
      case Some(entries) =>
        entries
          .filter(e => memberEq.forall(_ == e.name))
          .flatMap { e =>
            // method 0 = STORED; flag bit0 = encrypted, bit3 = sizes
            // deferred to a data descriptor — stream those
            if (splittable && e.method == 0 && (e.flags & 0x9) == 0 &&
                e.usize > splitBytes) {
              val n = ((e.usize + splitBytes - 1) / splitBytes).toInt
              (0 until n).map { k =>
                ZipRangePartition(e.name, e.localOff, k * splitBytes,
                  math.min((k + 1) * splitBytes, e.usize), e.usize)
              }
            } else Seq(ZipMemberPartition(e.name))
          }.toArray
      case None =>
        // streaming fallback: exotic archives keep the old shape
        val conf = ZipLinesSourceConf.hadoopConf(fsConf)
        val p = new Path(path)
        val zin = new ZipInputStream(p.getFileSystem(conf).open(p))
        val members = try {
          Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
            .filterNot(_.isDirectory).map(_.getName).toArray
        } finally zin.close()
        members
          .filter(m => memberEq.forall(_ == m))
          .map(ZipMemberPartition(_): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipLinesReaderFactory(path, encoding, fsConf)
}

private class ZipLinesReaderFactory(path: String, encoding: String, fsConf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ZipMemberPartition(member) =>
        new ZipLinesReader(path, member, encoding, fsConf)
      case r: ZipRangePartition =>
        new ZipRangeReader(path, r, encoding, fsConf)
    }
}

/** Range reader over a STORED member: seek to the local header,
  * derive the data start, then Hadoop text-split line alignment —
  * a split with start > 0 discards its first (possibly partial)
  * line, and lines are emitted while their START offset ≤ the split
  * end, so every line lands in exactly one split. */
private class ZipRangeReader(path: String, part: ZipRangePartition,
    encoding: String, fsConf: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val cs = Charset.forName(encoding)
  private val memberUtf8 = UTF8String.fromString(part.member)

  private val (raw, limitRemaining) = {
    val p = new Path(path)
    val in = p.getFileSystem(ZipLinesSourceConf.hadoopConf(fsConf)).open(p)
    val hdr = new Array[Byte](30)
    in.readFully(part.localOff, hdr)
    def u16(o: Int): Int = (hdr(o) & 0xFF) | ((hdr(o + 1) & 0xFF) << 8)
    require(u16(0) == 0x4B50 && u16(2) == 0x0403,
      s"bad local header for ${part.member} in $path")
    val dataStart = part.localOff + 30 + u16(26) + u16(28)
    in.seek(dataStart + part.start)
    (new java.io.BufferedInputStream(in, 128 * 1024), part.usize - part.start)
  }
  // absolute member-data offset of the next unread byte
  private var pos: Long = part.start
  private var remaining: Long = limitRemaining
  private var line: String = _

  private def readByte(): Int =
    if (remaining <= 0) -1
    else { val b = raw.read(); if (b >= 0) { pos += 1; remaining -= 1 }; b }

  /** Read one '\n'-terminated line (trailing '\r' stripped); null at
    * member end. */
  private def readLine(): String = {
    if (remaining <= 0) return null
    val buf = new java.io.ByteArrayOutputStream(256)
    var b = readByte()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = readByte() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, cs)
  }

  // a split that does not start the member discards its first line —
  // the previous split reads through the boundary
  if (part.start > 0) {
    var b = readByte()
    while (b >= 0 && b != '\n') b = readByte()
  }

  override def next(): Boolean = {
    if (pos > part.end) { line = null; return false } // next line starts past the split
    line = readLine()
    line != null
  }

  override def get(): InternalRow =
    InternalRow(memberUtf8, UTF8String.fromString(line))

  override def close(): Unit = raw.close()
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
