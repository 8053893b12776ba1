package graft.sources

import graft.SparkTestBase
import graft.dwca.DwcaQueries
import org.scalatest.funsuite.AnyFunSuite

class ZipLinesSourceSpec extends AnyFunSuite with SparkTestBase {

  private def zipDf = spark.read
    .format("graft.sources.ZipLinesSource")
    .option("path", DwcaQueries.fixtureZip)
    .load()

  test("reads every member's lines with one partition per member") {
    val df = zipDf
    assert(df.columns.toSeq === Seq("member", "line"))
    val members = df.select("member").distinct().collect().map(_.getString(0)).sorted
    assert(members === Array("measurementorfact.txt", "meta.xml", "multimedia.txt", "occurrence.txt"))
    // 4 members -> 4 partitions
    assert(df.rdd.getNumPartitions === 4)
    // line counts match the extracted files
    val occLines = df.where("member = 'occurrence.txt'").count()
    assert(occLines === 8) // header + 7 rows
  }

  test("member equality filter is pushed down and prunes partitions") {
    val df = zipDf.where("member = 'multimedia.txt'")
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === 8) // header + 7 rows
    // the pushed filter is visible in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZipLines"), plan)
  }

  test("STORED members split into line-aligned ranges; DEFLATE members stay single-stream") {
    import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-zipsplit")
    val zip = dir.resolve("mixed.zip")
    // varied line lengths so split boundaries land mid-line all over
    val lines = (1 to 5000).map(i => s"row$i," + ("x" * (i % 37)))
    val storedBytes = (lines.mkString("\n") + "\n").getBytes("UTF-8")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    val se = new ZipEntry("big.txt")
    se.setMethod(ZipEntry.STORED)
    se.setSize(storedBytes.length.toLong)
    se.setCompressedSize(storedBytes.length.toLong)
    val crc = new CRC32(); crc.update(storedBytes); se.setCrc(crc.getValue)
    zos.putNextEntry(se); zos.write(storedBytes); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("small.txt")) // default DEFLATED
    zos.write("a\nb\n".getBytes("UTF-8")); zos.closeEntry()
    zos.close()

    def read(splitBytes: Long) = spark.read
      .format("graft.sources.ZipLinesSource")
      .option("path", zip.toString)
      .option("stored.split.bytes", splitBytes.toString)
      .load()

    // ~167 KB stored member at 16 KiB splits -> >1 task
    val big = read(16384).where("member = 'big.txt'")
    assert(big.rdd.getNumPartitions > 1,
      s"stored member did not split: ${big.rdd.getNumPartitions} partition(s)")
    val got = big.select("line").collect().map(_.getString(0))
    // every line exactly once: no boundary loss, no boundary dup
    assert(got.length === 5000)
    assert(got.sorted.toSeq === lines.sorted)
    // the deflate member stays one stream
    assert(read(16384).where("member = 'small.txt'").rdd.getNumPartitions === 1)
    // an unsplit read of the same member agrees exactly
    val one = read(1L << 30).where("member = 'big.txt'")
    assert(one.rdd.getNumPartitions === 1)
    assert(one.select("line").collect().map(_.getString(0)).sorted.toSeq === got.sorted.toSeq)
  }

  test("stored.verify.crc routes stored members to the CRC-checking streaming reader") {
    import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-zipcrc")
    val zip = dir.resolve("stored.zip")
    val lines = (1 to 4000).map(i => s"r$i")
    val bytes = (lines.mkString("\n") + "\n").getBytes("UTF-8")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    val se = new ZipEntry("core.txt")
    se.setMethod(ZipEntry.STORED)
    se.setSize(bytes.length.toLong)
    se.setCompressedSize(bytes.length.toLong)
    val crc = new CRC32(); crc.update(bytes); se.setCrc(crc.getValue)
    zos.putNextEntry(se); zos.write(bytes); zos.closeEntry(); zos.close()

    def read(verify: Boolean) = spark.read
      .format("graft.sources.ZipLinesSource")
      .option("path", zip.toString)
      .option("stored.split.bytes", "4096")
      .option("stored.verify.crc", verify.toString)
      .load().where("member = 'core.txt'")

    assert(read(verify = false).rdd.getNumPartitions > 1) // splits by default
    val verified = read(verify = true)
    assert(verified.rdd.getNumPartitions === 1) // unsplit => CRC path
    assert(verified.count() === 4000)
  }

  test("stored.split.bytes rejects non-positive and non-numeric values by name") {
    def read(v: String) = spark.read
      .format("graft.sources.ZipLinesSource")
      .option("path", DwcaQueries.fixtureZip)
      .option("stored.split.bytes", v)
      .load().count()
    val zero = intercept[Exception](read("0"))
    assert(zero.getMessage.contains("stored.split.bytes"), zero.getMessage)
    val neg = intercept[Exception](read("-5"))
    assert(neg.getMessage.contains("stored.split.bytes"), neg.getMessage)
    val junk = intercept[Exception](read("lots"))
    assert(junk.getMessage.contains("stored.split.bytes"), junk.getMessage)
  }

  test("stored.verify.crc rejects non-boolean values by name") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.ZipLinesSource")
        .option("path", DwcaQueries.fixtureZip)
        .option("stored.verify.crc", "yes")
        .load().count()
    }
    assert(e.getMessage.contains("stored.verify.crc"), e.getMessage)
    // case-insensitive booleans stay accepted
    spark.read.format("graft.sources.ZipLinesSource")
      .option("path", DwcaQueries.fixtureZip)
      .option("stored.verify.crc", "False")
      .load().limit(1).count()
  }

  test("agrees with the mapPartitions zip scan") {
    val meta = graft.dwca.DwcaMeta.fromZip(DwcaQueries.fixtureZip)
    val viaDsv2 = zipDf.where(s"member = '${meta.core.location}'")
      .select("line").collect().map(_.getString(0)).toSeq
    val viaMapPartitions = ZipSource
      .memberLines(spark, DwcaQueries.fixtureZip, meta.core.location)
      .collect().toSeq
    assert(viaDsv2 === viaMapPartitions)
  }
}
