package graft.dwca

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DwcaSpec extends AnyFunSuite with SparkTestBase {

  private val zip = DwcaQueries.fixtureZip

  test("meta.xml discovery: layers, separators, positional ids") {
    val meta = DwcaMeta.fromZip(zip)
    assert(meta.core.name === "occurrence")
    assert(meta.core.location === "occurrence.txt")
    assert(meta.core.encoding === "UTF-8")
    assert(meta.core.sepRegex === "\\t")
    assert(meta.core.sepLiteral === "\t")
    assert(meta.core.idIndex === 0)
    assert(meta.core.idCol === "id") // header at <id index=0>
    assert(meta.core.headers === Seq("id", "occurrenceID", "scientificName",
      "decimalLatitude", "decimalLongitude", "footprintWKT", "individualCount"))

    assert(meta.extensions.map(_.name) ===
      Seq("measurementorfact", "multimedia"))
    assert(meta.extensions.forall(_.idCol === "coreid")) // <coreid index=0>
    assert(meta.extensions.forall(_.isExtension))
  }

  test("field term declarations are parsed for schema pinning") {
    val meta = DwcaMeta.fromZip(zip)
    assert(meta.core.fieldTerms(2) === "http://rs.tdwg.org/dwc/terms/scientificName")
    assert(meta.core.termNames(3) === "decimalLatitude")
    assert(meta.extensions.head.termNames(1) === "measurementType")
  }

  test("columns is the union over ALL layers (reference bug fixed)") {
    val meta = DwcaMeta.fromZip(zip)
    // dwca.py:42 discards the union result; ours must include
    // extension-only columns like measurementType
    assert(meta.columns.contains("measurementType"))
    assert(meta.columns.contains("identifier"))
    assert(meta.columns.contains("footprintWKT"))
  }

  test("conversion: inner-join fan-out, fid, conditional geom") {
    val df = DwcaConvert.convert(spark, zip, DwcaConvert.GeomWktString)
    val rows = df.collect()
    // 7 core rows; occ6 has no extension rows -> dropped; occ1 2x1,
    // occ5 2x2 -> 10 result rows
    assert(rows.length === 10)
    assert(!rows.exists(_.getAs[String]("id") == "occ6"))
    assert(rows.count(_.getAs[String]("id") == "occ5") === 4)
    // fid mirrors the core id
    assert(rows.forall(r => r.getAs[String]("fid") == r.getAs[String]("id")))
    // WKT branch wins over the point branch when footprintWKT present
    val occ2 = rows.find(_.getAs[String]("id") == "occ2").get
    assert(occ2.getAs[String]("geom_wkt").startsWith("POLYGON"))
    // both coords null -> null geometry
    val occ3 = rows.find(_.getAs[String]("id") == "occ3").get
    assert(occ3.getAs[String]("geom_wkt") == null)
    // point branch keeps the reference's (lat, lon) axis order
    val occ1 = rows.find(_.getAs[String]("id") == "occ1").get
    assert(occ1.getAs[String]("geom_wkt") === "POINT (59.910000 10.750000)")
  }

  test("non-default separator and encoding: semicolon + latin-1, core-only") {
    val zipSemi = {
      val local = java.nio.file.Paths.get("src/test/resources/dwca/semicolon.zip")
      if (java.nio.file.Files.exists(local)) local.toAbsolutePath.toString
      else "/root/repo/src/test/resources/dwca/semicolon.zip"
    }
    val meta = DwcaMeta.fromZip(zipSemi)
    assert(meta.core.sepRegex === ";" && meta.core.sepLiteral === ";")
    assert(meta.core.encoding === "ISO-8859-1")
    assert(meta.core.headers === Seq("id", "scientificName", "decimalLatitude", "decimalLongitude"))
    assert(meta.extensions.isEmpty)
    val df = DwcaConvert.convert(spark, zipSemi, DwcaConvert.GeomWktString)
    val rows = df.collect().sortBy(_.getAs[String]("id"))
    assert(rows.length === 2) // no extensions -> core passes through
    // latin-1 text decoded correctly
    assert(rows(0).getAs[String]("scientificName") === "Rådyr (Capreolus capreolus)")
    assert(rows(1).getAs[String]("scientificName") === "Elg ælg")
    // no footprintWKT column -> point branch only
    assert(rows(0).getAs[String]("geom_wkt") === "POINT (59.500000 10.500000)")
  }

  test("genuine-regex separator: data rows split by the header's regex, types inferred") {
    val zipRe = {
      val local = java.nio.file.Paths.get("src/test/resources/dwca/regex_sep.zip")
      if (java.nio.file.Files.exists(local)) local.toAbsolutePath.toString
      else "/root/repo/src/test/resources/dwca/regex_sep.zip"
    }
    val meta = DwcaMeta.fromZip(zipRe)
    assert(meta.core.sepRegex === "\\s*\\|\\s*")
    assert(meta.core.sepLiteralOpt === None) // not expressible as a CSV sep
    assert(meta.core.headers === Seq("id", "scientificName", "decimalLatitude", "decimalLongitude"))
    val df = DwcaConvert.convert(spark, zipRe, DwcaConvert.GeomWktString)
    // full-sample inference typed the coordinates as double
    assert(df.schema("decimalLatitude").dataType.typeName === "double")
    val rows = df.collect().sortBy(_.getAs[String]("id"))
    assert(rows.length === 3)
    // padding around the separators is part of the regex, not the data
    assert(rows(1).getAs[String]("scientificName") === "Parus major")
    assert(rows(1).isNullAt(rows(1).fieldIndex("decimalLatitude")))
    assert(rows(2).getAs[Double]("decimalLongitude") === 11.25)
    assert(rows(0).getAs[String]("geom_wkt") === "POINT (59.910000 10.750000)")
  }

  test("single-char separators stay literal (even metachars), regex classes do not") {
    val l = DwcaMeta.fromZip(zip).core
    assert(l.copy(sepRegex = "\\t").sepLiteralOpt === Some("\t"))
    assert(l.copy(sepRegex = ",").sepLiteralOpt === Some(","))
    assert(l.copy(sepRegex = "\\|").sepLiteralOpt === Some("|"))
    // a bare "|" means a pipe separator — as a regex it would match
    // the empty string and shred every row character-by-character
    assert(l.copy(sepRegex = "|").sepLiteralOpt === Some("|"))
    assert(l.copy(sepRegex = ".").sepLiteralOpt === Some("."))
    assert(l.copy(sepRegex = "\\d").sepLiteralOpt === None) // class
    assert(l.copy(sepRegex = "; *").sepLiteralOpt === None) // multi-char
  }

  test("distributed zip scan is byte-equivalent to the extracted scan") {
    val meta = DwcaMeta.fromZip(zip)
    val dir = DwcaConvert.extract(zip)
    meta.layers.foreach { l =>
      val extracted = DwcaConvert.readLayer(spark, dir, l)
      val streamed = graft.sources.ZipSource.readLayer(spark, zip, l)
      assert(streamed.schema === extracted.schema, s"schema diverged for ${l.name}")
      assert(streamed.collect().map(_.toString).sorted ===
        extracted.collect().map(_.toString).sorted, s"rows diverged for ${l.name}")
    }
  }

  test("zip scan of a missing member fails loudly") {
    val bad = DwcaMeta.fromZip(zip).core.copy(location = "nope.txt")
    val e = intercept[Exception] {
      graft.sources.ZipSource.readLayer(spark, zip, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("WKB mode emits parseable geometry for every non-null row") {
    val df = DwcaConvert.convert(spark, zip, DwcaConvert.GeomWkb)
    val rows = df.collect()
    rows.foreach { r =>
      val g = r.getAs[Array[Byte]]("geom")
      if (g != null) {
        val wkt = graft.functions.Geo.wkbToWkt(g)
        assert(wkt.startsWith("POINT") || wkt.startsWith("POLYGON"))
      } else assert(r.getAs[String]("id") === "occ3")
    }
  }

  test("r9 core-layer sampling divergence is detected with the right type verdicts") {
    SampleDriftFixture.ensure()
    val raw = spark.read
      .option("header", "true").option("sep", "\t")
      .csv(s"${SampleDriftFixture.extractedDir}/occurrence.txt")
    val div = graft.sources.SnifferCsv.sampleDivergence(raw)
      .map { case (h, s, f) => h -> ((s, f)) }.toMap
    // both planted drifts surface, with the DuckDB-default verdicts
    assert(div.get("individualCount").contains(("BIGINT", "VARCHAR")), div)
    assert(div.get("catalogNumber").contains(("BIGINT", "DOUBLE")), div)
    // non-drifting columns are silent
    assert(!div.contains("id") && !div.contains("scientificName"), div)
    // and the engine's full-pass conversion of the archive SUCCEEDS
    // with the correct types where the reference's default-sampled
    // core read would error mid-scan (query.sql:2 semantics)
    val converted = DwcaConvert.convert(spark, SampleDriftFixture.zipPath,
      DwcaConvert.GeomWktString, zipScan = true)
    val types = converted.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("individualCount") === "string", types)
    assert(types("catalogNumber") === "double", types)
    assert(converted.count() === SampleDriftFixture.rows)
    // a sample-window-sized clean file reports no divergence
    assert(graft.sources.SnifferCsv.sampleDivergence(
      raw.where("individualCount != 'several' and catalogNumber != '9223372036854775808'")).isEmpty)
  }

  test("r20 star-join broadcast gate: staged core takes the hint, single-stream bulk core keeps its exchange") {
    BulkFixture.ensure()
    def staticPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // staged core scans wide -> the measured-small extension is
    // broadcast-hinted: star join is a BroadcastHashJoin with no
    // core-side Exchange in the STATIC plan
    val staged = DwcaConvert.convert(spark, BulkFixture.zipPath,
      DwcaConvert.GeomWktString, staged = true)
    assert(staticPlan(staged).contains("BroadcastHashJoin"), staticPlan(staged))
    // zipScan core is one DEFLATE stream above the tiny-core bar: the
    // hint must NOT fire (it would serialize join+write into the
    // single parse task — measured +13%); the static plan keeps the
    // exchange pair and AQE elects the broadcast from runtime sizes
    val bulkZip = DwcaConvert.convert(spark, BulkFixture.zipPath,
      DwcaConvert.GeomWktString, zipScan = true)
    assert(!staticPlan(bulkZip).contains("BroadcastHashJoin"), staticPlan(bulkZip))
    assert(staticPlan(bulkZip).contains("SortMergeJoin"), staticPlan(bulkZip))
    // tiny-core archives (the 7-row sample) qualify on the core side
    val tiny = DwcaConvert.convert(spark, zip, DwcaConvert.GeomWktString,
      zipScan = true)
    assert(staticPlan(tiny).contains("BroadcastHashJoin"), staticPlan(tiny))
  }
}
