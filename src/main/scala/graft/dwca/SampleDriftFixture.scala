package graft.dwca

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic fixture for the CORE-LAYER SAMPLING DIVERGENCE
  * (dwca10). The reference types the core with DuckDB's *default*
  * sampling and only extensions with `sample_size=-1`
  * (`/root/reference/src/dwca_parquet/templates/query.sql:2` vs `:4`);
  * this engine full-passes both. The two disagree exactly when the
  * core's types drift after the 20480-row sniff window — this archive
  * plants two such drifts past the window:
  *
  *   - `individualCount`: integers for the first 20480 rows, a word
  *     ("several") later → sampled BIGINT (reference then ERRORS
  *     mid-scan on the word), full-pass VARCHAR (correct)
  *   - `catalogNumber`: int64-range for the window, an overflowing
  *     9223372036854775808 later → sampled BIGINT (reference errors),
  *     full-pass DOUBLE (DuckDB's own overflow promotion under
  *     sample_size=-1, dwca07 family)
  *
  * The dwca10 gate pins the engine's full-pass answer against
  * DuckDB's `sample_size=-1` read of the same bytes — the divergence
  * is strictly in the safer direction (the engine converts archives
  * the reference refuses), and [[graft.sources.SnifferCsv]] WARNs
  * when it detects one (DwcaSpec pins the detection). Generated once
  * per machine under java.io.tmpdir, like [[BulkFixture]].
  */
object SampleDriftFixture {

  val rows = 20600
  /** First drifting row (1-based data row) — past the sniff window. */
  val driftRow = 20500

  private val dir: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft-sampledrift-v1")
  def zipPath: String = dir.resolve("archive.zip").toString
  def extractedDir: String = dir.resolve("extracted").toString

  private val vocab =
    Array("Vulpes vulpes", "Lynx lynx", "Parus major", "Falco peregrinus", "Alces alces")

  private def occurrenceTxt: Array[Byte] = {
    val sb = new java.lang.StringBuilder(rows * 40)
    sb.append("id\tscientificName\tindividualCount\tcatalogNumber\n")
    var i = 1
    while (i <= rows) {
      val count = if (i == driftRow) "several" else (i % 9 + 1).toString
      val size = if (i == driftRow + 20) "9223372036854775808" else (i * 37L % 100000).toString
      sb.append("occ").append(i).append('\t')
        .append(vocab(i % 5)).append('\t')
        .append(count).append('\t')
        .append(size).append('\n')
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
      |    <field index="1" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
      |    <field index="2" term="http://rs.tdwg.org/dwc/terms/individualCount"/>
      |    <field index="3" term="http://rs.tdwg.org/dwc/terms/catalogNumber"/>
      |  </core>
      |</archive>
      |""".stripMargin.getBytes(StandardCharsets.UTF_8)

  /** Idempotent: generates the archive + extracted member once
    * (marker-gated); all later calls return immediately. */
  def ensure(): Unit = synchronized {
    val marker = dir.resolve("_READY")
    if (Files.exists(marker)) return
    val ex = dir.resolve("extracted")
    Files.createDirectories(ex)
    val members = Seq("occurrence.txt" -> occurrenceTxt, "meta.xml" -> metaXml)
    members.foreach { case (name, bytes) => Files.write(ex.resolve(name), bytes) }
    val zos = new ZipOutputStream(Files.newOutputStream(dir.resolve("archive.zip")))
    try members.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    } finally zos.close()
    Files.createFile(marker)
  }
}
