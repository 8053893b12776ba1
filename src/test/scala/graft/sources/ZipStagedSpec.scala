package graft.sources

import graft.SparkTestBase
import graft.dwca.{DwcaConvert, DwcaQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Staged re-chunking (ZipSource.stagedMemberDir) — the DEFLATE
  * escape hatch as a code path: one decompression pass re-writes a
  * compressed member as splittable text, after which scans go wide.
  * Pins (1) content equality with the streaming scan, (2) genuine
  * multi-task reads of a DEFLATE member's content, (3) stage-once
  * semantics (fingerprint hit skips the pass; archive change
  * re-stages), (4) conversion-result equality end to end.
  */
class ZipStagedSpec extends AnyFunSuite with SparkTestBase {

  test("staged lines equal the stream, scan wide, and stage exactly once per archive fingerprint") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-zipstaged")
    val zip = dir.resolve("deflate.zip")
    val lines = (1 to 5000).map(i => s"row$i," + ("y" * (i % 41)))
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new ZipEntry("big.txt")) // default DEFLATED
    zos.write((lines.mkString("\n") + "\n").getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val scratch = Some(dir.resolve("scratch").toString)

    val stagedDir = ZipSource.stagedMemberDir(spark, zip.toString, "big.txt",
      scratchRoot = scratch)
    val part = new java.io.File(stagedDir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val stamp1 = part.lastModified()

    // content: every line exactly once, header (first line) first
    val got = spark.read.textFile(stagedDir)
    assert(got.collect().toSeq.sorted === lines.sorted)
    assert(got.first() === lines.head)

    // a DEFLATE member's CONTENT scans wide once staged: force small
    // file splits and count tasks
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try {
      val wide = spark.read.textFile(
        ZipSource.stagedMemberDir(spark, zip.toString, "big.txt", scratchRoot = scratch))
      assert(wide.rdd.getNumPartitions > 1,
        s"staged deflate member did not split: ${wide.rdd.getNumPartitions} partition(s)")
      assert(wide.collect().toSeq.sorted === lines.sorted)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None    => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }

    // fingerprint hit: the second ensure ran no decompression pass
    assert(part.lastModified() === stamp1, "re-staged despite unchanged archive")

    // archive change (mtime moves) -> re-stage
    assert(zip.toFile.setLastModified(zip.toFile.lastModified() + 2000))
    val restagedDir = ZipSource.stagedMemberDir(spark, zip.toString, "big.txt",
      scratchRoot = scratch)
    val part2 = new java.io.File(restagedDir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    assert(part2.lastModified() > stamp1, "stale artifact served after archive change")
  }

  test("oversized DEFLATE members auto-route through staging on streamed paths") {
    graft.dwca.BulkFixture.ensure()
    val zipP = graft.dwca.BulkFixture.zipPath
    val meta = graft.dwca.DwcaMeta.fromZip(zipP)
    // the bulk core is DEFLATE and bigger than a toy threshold, but
    // far under the 256 MiB default — the default routes nothing
    // (the SMALL sample.zip's members are STORED: they split in
    // place and must never stage, at any threshold)
    assert(ZipSource.shouldAutoStage(spark, zipP, meta.core.location, threshold = 512))
    assert(!ZipSource.shouldAutoStage(spark, zipP, meta.core.location))
    val sampleMeta = graft.dwca.DwcaMeta.fromZip(DwcaQueries.fixtureZip)
    assert(!ZipSource.shouldAutoStage(spark, DwcaQueries.fixtureZip,
      sampleMeta.core.location, threshold = 1))
    val auto = DwcaConvert.convert(spark, zipP, DwcaConvert.GeomWktString,
      zipScan = true, autoStageBytes = 512)
    val viaStream = DwcaConvert.convert(spark, zipP, DwcaConvert.GeomWktString,
      zipScan = true, autoStageBytes = 0)
    assert(auto.collect().map(_.toString).sorted.toSeq ===
      viaStream.collect().map(_.toString).sorted.toSeq)
    // the router really took the staged path: the artifact exists and
    // its lines read at full width (Hadoop text splits)
    def safe(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")
    val art = new java.io.File(new java.io.File(new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-zipstage"), safe(zipP)),
      safe(meta.core.location))
    assert(new java.io.File(art, "lines").exists(), s"no staged artifact at $art")
  }

  test("staged conversion equals the zip-scan conversion") {
    val a = DwcaConvert.convert(spark, DwcaQueries.fixtureZip,
      DwcaConvert.GeomWktString, zipScan = true)
    val b = DwcaConvert.convert(spark, DwcaQueries.fixtureZip,
      DwcaConvert.GeomWktString, staged = true)
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(a.collect().map(_.toString).sorted.toSeq ===
      b.collect().map(_.toString).sorted.toSeq)
  }
}
