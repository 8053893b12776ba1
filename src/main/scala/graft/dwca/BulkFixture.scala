package graft.dwca

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic bulk DwC-A fixture for the conversion THROUGHPUT
  * bench (dwca08). The committed sample archive is 7 rows — timing it
  * tracks scheduling + inference + join-planning path cost, not the
  * scan/join/write throughput that actually regresses. This generates
  * a 150k-row archive (one core + one 1:1 extension, ~25 MB of
  * member text) once per machine under java.io.tmpdir, plus extracted
  * member copies for the DuckDB oracle's `read_csv`.
  *
  * Content is a pure function of the row index (names from a fixed
  * vocabulary, coordinates printed with fixed decimals, every 97th
  * row coordinate-less, every 13th carrying a footprint polygon), so
  * the gate hash is stable across machines and rounds. Generation is
  * driver-side scaffolding — the engine under test only ever sees the
  * zip, exactly like a fetched archive.
  */
object BulkFixture {

  val rows = 150000
  private val dir: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft-bulk-v1")
  def zipPath: String = dir.resolve("archive.zip").toString
  def extractedDir: String = dir.resolve("extracted").toString
  def outParquet: String = dir.resolve("out.parquet").toString
  def outParquetStaged: String = dir.resolve("out_staged.parquet").toString

  private val vocab =
    Array("Vulpes vulpes", "Lynx lynx", "Parus major", "Falco peregrinus", "Alces alces")

  private def occurrenceTxt: Array[Byte] = {
    val sb = new java.lang.StringBuilder(rows * 90)
    sb.append("id\toccurrenceID\tscientificName\tdecimalLatitude\tdecimalLongitude\tfootprintWKT\tindividualCount\n")
    var i = 1
    while (i <= rows) {
      val lat = if (i % 97 == 0) "" else f"${50 + (i % 9000) * 0.001}%.3f"
      val lon = if (i % 97 == 0) "" else f"${10 + (i % 7000) * 0.001}%.3f"
      val fp =
        if (i % 13 == 0) {
          val a = i % 30 + 10; val b = i % 40 + 50
          s"POLYGON (($a $b, ${a + 1} $b, ${a + 1} ${b + 1}, $a ${b + 1}, $a $b))"
        } else ""
      sb.append("occ").append(i).append('\t')
        .append("urn:occ:").append(i).append('\t')
        .append(vocab(i % 5)).append('\t')
        .append(lat).append('\t').append(lon).append('\t')
        .append(fp).append('\t')
        .append(i % 9 + 1).append('\n')
      i += 1
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def measurementTxt: Array[Byte] = {
    val sb = new java.lang.StringBuilder(rows * 30)
    sb.append("coreid\tmeasurementType\tmeasurementValue\n")
    var i = 1
    while (i <= rows) {
      sb.append("occ").append(i).append('\t')
        .append("mt").append(i % 11).append('\t')
        .append(f"${(i % 500) * 0.5}%.1f").append('\n')
      i += 1
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private val metaXml =
    """<?xml version="1.0" encoding="utf-8"?>
      |<archive xmlns="http://rs.tdwg.org/dwc/text/" metadata="eml.xml">
      |  <core encoding="UTF-8" fieldsTerminatedBy="\t" linesTerminatedBy="\n" fieldsEnclosedBy="" ignoreHeaderLines="1" rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
      |    <files><location>occurrence.txt</location></files>
      |    <id index="0" />
      |    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>
      |    <field index="2" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
      |    <field index="3" term="http://rs.tdwg.org/dwc/terms/decimalLatitude"/>
      |    <field index="4" term="http://rs.tdwg.org/dwc/terms/decimalLongitude"/>
      |    <field index="5" term="http://rs.tdwg.org/dwc/terms/footprintWKT"/>
      |    <field index="6" term="http://rs.tdwg.org/dwc/terms/individualCount"/>
      |  </core>
      |  <extension encoding="UTF-8" fieldsTerminatedBy="\t" linesTerminatedBy="\n" fieldsEnclosedBy="" ignoreHeaderLines="1" rowType="http://rs.tdwg.org/dwc/terms/MeasurementOrFact">
      |    <files><location>measurementorfact.txt</location></files>
      |    <coreid index="0" />
      |    <field index="1" term="http://rs.tdwg.org/dwc/terms/measurementType"/>
      |    <field index="2" term="http://rs.tdwg.org/dwc/terms/measurementValue"/>
      |  </extension>
      |</archive>
      |""".stripMargin.getBytes(StandardCharsets.UTF_8)

  /** Idempotent: generates the archive + extracted members once
    * (marker-gated); all later calls return immediately. */
  def ensure(): Unit = synchronized {
    val marker = dir.resolve("_READY")
    if (Files.exists(marker)) return
    val ex = dir.resolve("extracted")
    Files.createDirectories(ex)
    val members = Seq(
      "occurrence.txt" -> occurrenceTxt,
      "measurementorfact.txt" -> measurementTxt,
      "meta.xml" -> metaXml)
    members.foreach { case (name, bytes) => Files.write(ex.resolve(name), bytes) }
    val zos = new ZipOutputStream(Files.newOutputStream(dir.resolve("archive.zip")))
    try members.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    } finally zos.close()
    Files.createFile(marker)
  }
}
