package graft.meta

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP2/EP3 metadata pipelines over the committed IPT fixtures
  * (`src/test/resources/ipt/`): RSS catalog scan, EML → CSW catalogue
  * records (incl. the `//text()` full-text bag and bbox→WKT), and
  * EML → pygeoapi resource config (nested structs + JSON projection).
  *
  * All driver-side assembly of a handful of KB-sized rows — exactly
  * like the reference (`csw.py:41-104`, `geoapi.py:21-68` build Python
  * dict rows before handing them to the engine); the resulting
  * Datasets then flow through the distributed engine and sinks.
  */
object MetaQueries {

  // Placeholder deployment config (the reference reads these from its
  // settings; values here only feed fixture-checked URL templates).
  private val awsEndpoint = "https://s3.example"
  private val bucket = "bucket"
  private val resourcesPrefix = "/ipt/datasets/"
  private val iptPublic = "https://ipt.example"
  // csw.py:95-97 hardcodes the publishing institution
  private val institution = "Norsk institutt for naturforskning (NINA)"

  private def fixtureDatasets: Seq[(IptDataset, EmlMetadata)] =
    Ipt.datasets(Ipt.readFixture("rss.xml"), baseUrl = "").map { ds =>
      ds -> Eml.parse(Ipt.readFixture(s"eml_${ds.id}.xml"))
    }

  /** `json.dumps`-style links array (`csw.py:62-76,99`). */
  private def linksJson(id: String): String = {
    def link(name: String, desc: String, protocol: String, url: String) =
      s"""{"name": "$name", "description": "$desc", "protocol": "$protocol", "url": "$url"}"""
    "[" + Seq(
      link("Parquet", "The resource as (geo)parquet file", "FILE:GEO",
        s"$awsEndpoint/$bucket$resourcesPrefix$id.parquet"),
      link("DWCA", "The resource as Darwin Core Archive", "file",
        s"$iptPublic/archive.do?r=$id")).mkString(", ") + "]"
  }

  /** One CSW catalogue record (`csw.py:77-101`), 21 columns. */
  private def cswRow(ds: IptDataset, m: EmlMetadata) = {
    val xml = m.isoXml
    (m.identifier, "gmd:MD_Metadata", "http://www.isotc211.org/2005/gmd", "local",
      m.pubDate, ds.title, m.pubDate, "service", Option.empty[String],
      m.bbox.wkt, xml, xml,
      Eml.dedup(m.keywords).mkString(", "), "application/xml",
      Eml.anytext(xml), m.abstractText, m.pubDate,
      institution, institution,
      Eml.dedup(m.contacts.map(_._2)).mkString("; "),
      linksJson(ds.id))
  }

  /** CSW records frame over any catalog — the builder the service
    * tier ([[graft.service.ResourceServer]]) shares with the
    * fixture-checked gate, so live and gate records cannot drift. */
  private[graft] def cswRecords(s: SparkSession,
      data: Seq[(IptDataset, EmlMetadata)]): DataFrame = {
    import s.implicits._
    data.map { case (ds, m) => cswRow(ds, m) }
      .toDF("identifier", "typename", "schema", "mdsource", "insert_date", "title",
        "date_modified", "type", "format", "wkt_geometry", "metadata", "xml",
        "keywords", "metadata_type", "anytext", "abstract", "date",
        "creator", "publisher", "contributor", "links")
  }

  private def cswDf(s: SparkSession): DataFrame = cswRecords(s, fixtureDatasets)

  /** pygeoapi resource config (geoapi.py:40-65), nested structs built
    * with the DataFrame API ("default" is a Java keyword, so the
    * struct fields are aliased rather than encoder-derived). Shared
    * with the service tier like [[cswRecords]]. */
  private[graft] def geoapiResources(s: SparkSession,
      data: Seq[(IptDataset, EmlMetadata)]): DataFrame = {
    import s.implicits._
    val base = data.map { case (ds, m) =>
      (s"${iptPublic.replace("https://", "")}/${ds.id}", ds.title, m.bbox.seq,
        Eml.dedup(m.keywords), m.abstractText,
        s"/vsicurl/$awsEndpoint/$bucket$resourcesPrefix${ds.id}.parquet", ds.id)
    }.toDF("id", "title", "bbox", "keywords", "description", "source", "layer")
    base.select(
      col("id"), lit("collection").as("type"), lit("default").as("visibility"),
      col("title"),
      struct(struct(col("bbox"), lit(4326).as("crs")).as("spatial")).as("extents"),
      col("keywords"), col("description"),
      array(struct(
        lit("feature").as("type"), lit("OGR").as("name"), lit(true).as("default"),
        lit("fid").as("id_field"), lit(false).as("editable"),
        lit("http://www.opengis.net/def/crs/OGC/1.3/CRS84").as("storage_crs"),
        struct(lit("Parquet").as("source_type"), col("source").as("source")).as("data"),
        col("layer").as("layer"))).as("providers"))
  }

  val all: Map[String, Q] = Map(
    // ── S12: RSS catalog scan, golden-checked ──
    "meta01_rss" -> Q(
      (s, _) => {
        import s.implicits._
        Ipt.datasets(Ipt.readFixture("rss.xml"), baseUrl = "")
          .toDF("id", "title", "version", "guid", "url")
      },
      Some("""SELECT * FROM (VALUES
                ('birds-norway', 'Bird observations Norway', '7', 'd0a1b2c3/v7', 'resources/birds-norway'),
                ('mammals-svalbard', 'Mammal census Svalbard', '12', 'e4f5a6b7/v12', 'resources/mammals-svalbard'))
              AS t(id, title, version, guid, url)""")),

    // ── EP2: EML → CSW records (F7 anytext, F8 bbox WKT, F5 dedup-joins, F6 links JSON) ──
    // Golden oracle: expected literals handwritten from csw.py:77-101
    // semantics (dedup joins are first-occurrence order — the
    // deterministic stand-in for Python set order, Eml.dedup).
    "meta02_csw" -> Q(
      (s, _) => cswDf(s),
      Some {
        // Golden ISO19139 docs: INDEPENDENT literal expected output of
        // the pygeometa-shaped crosswalk (csw.py:47-48) over the two
        // committed EML fixtures — hand-checked strings, deliberately
        // NOT built by sharing Eml.isoXml's string assembly (a shared
        // builder would make the gate tautological: a structural
        // mistake made once would pass unnoticed).
        val birdsXml = """<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" xmlns:gco="http://www.isotc211.org/2005/gco"><gmd:fileIdentifier><gco:CharacterString>d0a1b2c3</gco:CharacterString></gmd:fileIdentifier><gmd:language><gco:CharacterString>eng</gco:CharacterString></gmd:language><gmd:hierarchyLevel><gmd:MD_ScopeCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#MD_ScopeCode" codeListValue="dataset">dataset</gmd:MD_ScopeCode></gmd:hierarchyLevel><gmd:contact><gmd:CI_ResponsibleParty><gmd:individualName><gco:CharacterString>Ola Nordmann</gco:CharacterString></gmd:individualName><gmd:role><gmd:CI_RoleCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#CI_RoleCode" codeListValue="creator">creator</gmd:CI_RoleCode></gmd:role></gmd:CI_ResponsibleParty></gmd:contact><gmd:contact><gmd:CI_ResponsibleParty><gmd:individualName><gco:CharacterString>Kari Nordmann</gco:CharacterString></gmd:individualName><gmd:role><gmd:CI_RoleCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#CI_RoleCode" codeListValue="metadataProvider">metadataProvider</gmd:CI_RoleCode></gmd:role></gmd:CI_ResponsibleParty></gmd:contact><gmd:dateStamp><gco:Date>2024-05-01</gco:Date></gmd:dateStamp><gmd:identificationInfo><gmd:MD_DataIdentification><gmd:citation><gmd:CI_Citation><gmd:title><gco:CharacterString>Bird observations Norway</gco:CharacterString></gmd:title><gmd:date><gmd:CI_Date><gmd:date><gco:Date>2024-05-01</gco:Date></gmd:date><gmd:dateType><gmd:CI_DateTypeCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#CI_DateTypeCode" codeListValue="publication">publication</gmd:CI_DateTypeCode></gmd:dateType></gmd:CI_Date></gmd:date></gmd:CI_Citation></gmd:citation><gmd:abstract><gco:CharacterString>Systematic bird counts along the Norwegian coast.</gco:CharacterString></gmd:abstract><gmd:descriptiveKeywords><gmd:MD_Keywords><gmd:keyword><gco:CharacterString>Occurrence</gco:CharacterString></gmd:keyword><gmd:keyword><gco:CharacterString>Birds</gco:CharacterString></gmd:keyword><gmd:keyword><gco:CharacterString>Occurrence</gco:CharacterString></gmd:keyword><gmd:keyword><gco:CharacterString>Coastal</gco:CharacterString></gmd:keyword></gmd:MD_Keywords></gmd:descriptiveKeywords><gmd:extent><gmd:EX_Extent><gmd:geographicElement><gmd:EX_GeographicBoundingBox><gmd:westBoundLongitude><gco:Decimal>4.0</gco:Decimal></gmd:westBoundLongitude><gmd:eastBoundLongitude><gco:Decimal>31.1</gco:Decimal></gmd:eastBoundLongitude><gmd:southBoundLatitude><gco:Decimal>57.9</gco:Decimal></gmd:southBoundLatitude><gmd:northBoundLatitude><gco:Decimal>71.2</gco:Decimal></gmd:northBoundLatitude></gmd:EX_GeographicBoundingBox></gmd:geographicElement></gmd:EX_Extent></gmd:extent></gmd:MD_DataIdentification></gmd:identificationInfo></gmd:MD_Metadata>"""
        val mammalsXml = """<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" xmlns:gco="http://www.isotc211.org/2005/gco"><gmd:fileIdentifier><gco:CharacterString>e4f5a6b7</gco:CharacterString></gmd:fileIdentifier><gmd:language><gco:CharacterString>eng</gco:CharacterString></gmd:language><gmd:hierarchyLevel><gmd:MD_ScopeCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#MD_ScopeCode" codeListValue="dataset">dataset</gmd:MD_ScopeCode></gmd:hierarchyLevel><gmd:contact><gmd:CI_ResponsibleParty><gmd:individualName><gco:CharacterString>Nils Berg</gco:CharacterString></gmd:individualName><gmd:role><gmd:CI_RoleCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#CI_RoleCode" codeListValue="creator">creator</gmd:CI_RoleCode></gmd:role></gmd:CI_ResponsibleParty></gmd:contact><gmd:contact><gmd:CI_ResponsibleParty><gmd:individualName><gco:CharacterString>Nils Berg</gco:CharacterString></gmd:individualName><gmd:role><gmd:CI_RoleCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#CI_RoleCode" codeListValue="metadataProvider">metadataProvider</gmd:CI_RoleCode></gmd:role></gmd:CI_ResponsibleParty></gmd:contact><gmd:dateStamp><gco:Date>2024-06-11</gco:Date></gmd:dateStamp><gmd:identificationInfo><gmd:MD_DataIdentification><gmd:citation><gmd:CI_Citation><gmd:title><gco:CharacterString>Mammal census Svalbard</gco:CharacterString></gmd:title><gmd:date><gmd:CI_Date><gmd:date><gco:Date>2024-06-11</gco:Date></gmd:date><gmd:dateType><gmd:CI_DateTypeCode codeList="http://standards.iso.org/iso/19139/resources/gmxCodelists.xml#CI_DateTypeCode" codeListValue="publication">publication</gmd:CI_DateTypeCode></gmd:dateType></gmd:CI_Date></gmd:date></gmd:CI_Citation></gmd:citation><gmd:abstract><gco:CharacterString>Annual census of marine and land mammals on Svalbard.</gco:CharacterString></gmd:abstract><gmd:descriptiveKeywords><gmd:MD_Keywords><gmd:keyword><gco:CharacterString>Occurrence</gco:CharacterString></gmd:keyword><gmd:keyword><gco:CharacterString>Mammals</gco:CharacterString></gmd:keyword></gmd:MD_Keywords></gmd:descriptiveKeywords><gmd:extent><gmd:EX_Extent><gmd:geographicElement><gmd:EX_GeographicBoundingBox><gmd:westBoundLongitude><gco:Decimal>9.5</gco:Decimal></gmd:westBoundLongitude><gmd:eastBoundLongitude><gco:Decimal>33.5</gco:Decimal></gmd:eastBoundLongitude><gmd:southBoundLatitude><gco:Decimal>76.4</gco:Decimal></gmd:southBoundLatitude><gmd:northBoundLatitude><gco:Decimal>80.8</gco:Decimal></gmd:northBoundLatitude></gmd:EX_GeographicBoundingBox></gmd:geographicElement></gmd:EX_Extent></gmd:extent></gmd:MD_DataIdentification></gmd:identificationInfo></gmd:MD_Metadata>"""
        val birdsLinks = """[{"name": "Parquet", "description": "The resource as (geo)parquet file", "protocol": "FILE:GEO", "url": "https://s3.example/bucket/ipt/datasets/birds-norway.parquet"}, {"name": "DWCA", "description": "The resource as Darwin Core Archive", "protocol": "file", "url": "https://ipt.example/archive.do?r=birds-norway"}]"""
        val mammalsLinks = """[{"name": "Parquet", "description": "The resource as (geo)parquet file", "protocol": "FILE:GEO", "url": "https://s3.example/bucket/ipt/datasets/mammals-svalbard.parquet"}, {"name": "DWCA", "description": "The resource as Darwin Core Archive", "protocol": "file", "url": "https://ipt.example/archive.do?r=mammals-svalbard"}]"""
        val nina = "Norsk institutt for naturforskning (NINA)"
        s"""SELECT * FROM (VALUES
              ('d0a1b2c3', 'gmd:MD_Metadata', 'http://www.isotc211.org/2005/gmd', 'local',
               '2024-05-01', 'Bird observations Norway', '2024-05-01', 'service', CAST(NULL AS VARCHAR),
               'POLYGON ((31.1 57.9, 31.1 71.2, 4 71.2, 4 57.9, 31.1 57.9))',
               '$birdsXml', '$birdsXml',
               'Occurrence, Birds, Coastal', 'application/xml',
               'd0a1b2c3 eng dataset Ola Nordmann creator Kari Nordmann metadataProvider 2024-05-01 Bird observations Norway 2024-05-01 publication Systematic bird counts along the Norwegian coast. Occurrence Birds Occurrence Coastal 4.0 31.1 57.9 71.2',
               'Systematic bird counts along the Norwegian coast.', '2024-05-01',
               '$nina', '$nina', 'Ola Nordmann; Kari Nordmann', '$birdsLinks'),
              ('e4f5a6b7', 'gmd:MD_Metadata', 'http://www.isotc211.org/2005/gmd', 'local',
               '2024-06-11', 'Mammal census Svalbard', '2024-06-11', 'service', CAST(NULL AS VARCHAR),
               'POLYGON ((33.5 76.4, 33.5 80.8, 9.5 80.8, 9.5 76.4, 33.5 76.4))',
               '$mammalsXml', '$mammalsXml',
               'Occurrence, Mammals', 'application/xml',
               'e4f5a6b7 eng dataset Nils Berg creator Nils Berg metadataProvider 2024-06-11 Mammal census Svalbard 2024-06-11 publication Annual census of marine and land mammals on Svalbard. Occurrence Mammals 9.5 33.5 76.4 80.8',
               'Annual census of marine and land mammals on Svalbard.', '2024-06-11',
               '$nina', '$nina', 'Nils Berg', '$mammalsLinks'))
            AS t(identifier, typename, "schema", mdsource, insert_date, title,
                 date_modified, type, format, wkt_geometry, metadata, xml,
                 keywords, metadata_type, anytext, abstract, date,
                 creator, publisher, contributor, links)"""
      }),

    // ── EP3: EML → pygeoapi resources; nested struct build + JSON array sink + flat projection ──
    "meta03_geoapi" -> Q(
      (s, _) => {
        val df = geoapiResources(s, fixtureDatasets)
        val out = graft.RunScratch.fresh("sinks/geoapi-config.json")
        graft.sinks.Sinks.writeJsonArray(s, df, out)
        // keywords joins to a string for the gate: the driver's pandas
        // fingerprint cannot hash array cells (r03 harness error)
        df.select(col("id"), col("type"), col("visibility"), col("title"),
          to_json(col("extents")).as("extents_json"),
          array_join(col("keywords"), ", ").as("keywords"),
          col("description"), to_json(col("providers")).as("providers_json"))
      },
      Some {
        def providers(id: String) =
          s"""[{"type":"feature","name":"OGR","default":true,"id_field":"fid","editable":false,"storage_crs":"http://www.opengis.net/def/crs/OGC/1.3/CRS84","data":{"source_type":"Parquet","source":"/vsicurl/https://s3.example/bucket/ipt/datasets/$id.parquet"},"layer":"$id"}]"""
        s"""SELECT * FROM (VALUES
              ('ipt.example/birds-norway', 'collection', 'default', 'Bird observations Norway',
               '{"spatial":{"bbox":[4.0,57.9,31.1,71.2],"crs":4326}}',
               'Occurrence, Birds, Coastal',
               'Systematic bird counts along the Norwegian coast.',
               '${providers("birds-norway")}'),
              ('ipt.example/mammals-svalbard', 'collection', 'default', 'Mammal census Svalbard',
               '{"spatial":{"bbox":[9.5,76.4,33.5,80.8],"crs":4326}}',
               'Occurrence, Mammals',
               'Annual census of marine and land mammals on Svalbard.',
               '${providers("mammals-svalbard")}'))
            AS t(id, type, visibility, title, extents_json, keywords, description, providers_json)"""
      })
  )
}
