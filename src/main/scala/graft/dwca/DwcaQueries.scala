package graft.dwca

import java.nio.file.{Files, Paths}

import graft.Q
import org.apache.spark.sql.functions._

/** Driver-gate queries for the DwC-A conversion tier. The input is the
  * committed fixture archive (core occurrence + 2 extensions,
  * `src/test/resources/dwca/` — both zipped and extracted forms, so
  * the DuckDB oracle can `read_csv` the same bytes the Spark side
  * scans out of the zip).
  */
object DwcaQueries {

  /** Fixture paths, robust to the working directory. */
  private def fixture(rel: String): String = {
    val local = Paths.get("src/test/resources/dwca", rel)
    if (Files.exists(local)) local.toAbsolutePath.toString
    else s"/root/repo/src/test/resources/dwca/$rel"
  }
  /** Path to the committed sample archive (also used by the sink tier). */
  def fixtureZip: String = fixture("sample.zip")
  private def zipPath: String = fixtureZip
  // the oracle runs in the driver's DuckDB with an unknown cwd
  private val oracleDir = "/root/repo/src/test/resources/dwca/extracted"

  /** DuckDB twin of the generated conversion query, shared by the
    * extracted-scan (dwca01) and zip-scan (dwca04) paths. */
  private val convertOracle =
    s"""SELECT occ.id AS id, occurrenceID, scientificName,
               decimalLatitude, decimalLongitude, footprintWKT, individualCount,
               measurementType, measurementValue, identifier, format,
               occ.id AS fid,
               coalesce(footprintWKT,
                 CASE WHEN decimalLatitude IS NULL OR decimalLongitude IS NULL THEN NULL
                      ELSE printf('POINT (%.6f %.6f)', decimalLatitude, decimalLongitude) END) AS geom_wkt
        FROM read_csv('$oracleDir/occurrence.txt') occ
        JOIN read_csv('$oracleDir/measurementorfact.txt', sample_size=-1) m ON m.coreid = occ.id
        JOIN read_csv('$oracleDir/multimedia.txt', sample_size=-1) mm ON mm.coreid = occ.id"""

  val all: Map[String, Q] = Map(
    // ── the reference's entire generated query, WKT-string geometry ──
    // (S1-S4, P1-P3, J1/J2, F1 in one end-to-end slice)
    "dwca01_convert" -> Q(
      (s, _) => DwcaConvert.convert(s, zipPath, DwcaConvert.GeomWktString),
      Some(convertOracle)),

    // ── meta.xml schema discovery, golden-checked (S3/S4/J2) ──
    "dwca02_meta" -> Q(
      (s, _) => {
        import s.implicits._
        DwcaMeta.fromZip(zipPath).layers
          .map(l => (l.name, l.location, l.encoding, l.sepRegex, l.idIndex, l.idCol,
            l.isExtension, l.headers.size))
          .toDF("layer", "location", "encoding", "sep_regex", "id_index", "id_col",
            "is_extension", "n_cols")
      },
      Some("""SELECT * FROM (VALUES
                ('occurrence', 'occurrence.txt', 'UTF-8', '\t', 0, 'id', false, 7),
                ('measurementorfact', 'measurementorfact.txt', 'UTF-8', '\t', 0, 'coreid', true, 3),
                ('multimedia', 'multimedia.txt', 'UTF-8', '\t', 0, 'coreid', true, 3))
              AS t(layer, location, encoding, sep_regex, id_index, id_col, is_extension, n_cols)""")),

    // ── same conversion through the distributed no-extraction zip
    // scan (ZipSource) — must reproduce dwca01's oracle exactly ──
    "dwca04_convert_zipscan" -> Q(
      (s, _) => DwcaConvert.convert(s, zipPath, DwcaConvert.GeomWktString, zipScan = true),
      Some(convertOracle)),

    // ── engine-faithful conversion: WKB geometry via native ST_* ──
    // No DuckDB oracle (spatial ext unavailable offline) → driver
    // records a rows-only check; WKB bytes are unit-tested against
    // golden vectors in GeoSpec.
    "dwca03_convert_wkb" -> Q(
      (s, _) => DwcaConvert.convert(s, zipPath, DwcaConvert.GeomWkb)
        .withColumn("geom_txt", expr("st_astext(geom)")),
      None)
  )
}
