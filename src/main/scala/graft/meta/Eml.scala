package graft.meta

import java.io.StringReader
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}
import org.xml.sax.InputSource

/** EML dataset metadata + the IPT RSS catalog — driver-side typed
  * models for the reference's metadata pipelines
  * (`/root/reference/src/dwca_parquet/libs/ipt.py:6-26`,
  * `csw.py:41-113`, `geoapi.py:21-75`).
  *
  * The reference delegates EML→dict to pygeometa's GBIF-EML schema and
  * dict→ISO19139 to its writer; we parse the same EML facts directly
  * (JDK DOM — a few KB per dataset, pure driver work) and emit a
  * minimal ISO-shaped document that carries the same text content for
  * the `//text()` full-text bag (`csw.py:25-38`).
  */
final case class EmlBBox(west: Double, south: Double, east: Double, north: Double) {

  private def fmt(d: Double): String =
    if (d == Math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString

  /** `shapely.box(*bbox).wkt` (`csw.py:88`): exterior starts at
    * (maxx, miny), counter-clockwise. */
  def wkt: String = {
    val (w, s, e, n) = (fmt(west), fmt(south), fmt(east), fmt(north))
    s"POLYGON (($e $s, $e $n, $w $n, $w $s, $e $s))"
  }

  def seq: Seq[Double] = Seq(west, south, east, north)
}

final case class EmlMetadata(
    identifier: String,
    title: String,
    abstractText: String,
    pubDate: String,
    bbox: EmlBBox,
    /** keywordSet groups, in document order (`idf["keywords"]`). */
    keywordGroups: Seq[Seq[String]],
    /** role → individual name, in document order (`metadata["contact"]`). */
    contacts: Seq[(String, String)]) {

  def keywords: Seq[String] = keywordGroups.flatten

  /** XML-escape text content: a `&` or `<` in a dataset title must not
    * produce an unparseable document (entities round-trip back to the
    * original characters in the `//text()` bag). */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** ISO-19139 metadata document, shaped like pygeometa's GBIF-EML →
    * ISO19139 crosswalk output (`csw.py:19-20,47-48`): proper gmd/gco
    * nesting — fileIdentifier, language, hierarchyLevel, one
    * CI_ResponsibleParty per contact with its role code,
    * dateStamp, CI_Citation with a typed publication date, abstract,
    * one MD_Keywords keyword element per keyword, and an
    * EX_GeographicBoundingBox with the four coordinate elements
    * (west/east/south/north, pygeometa's order). Every fact the
    * reference's `//text()` `anytext` bag collects appears as its own
    * text node. Single line so goldens embed in SQL literals. */
  def isoXml: String = {
    def cs(v: String) = s"<gco:CharacterString>${esc(v)}</gco:CharacterString>"
    val cl = "http://standards.iso.org/iso/19139/resources/gmxCodelists.xml"
    val contactXml = contacts.map { case (role, name) =>
      s"""<gmd:contact><gmd:CI_ResponsibleParty><gmd:individualName>${cs(name)}</gmd:individualName><gmd:role><gmd:CI_RoleCode codeList="$cl#CI_RoleCode" codeListValue="${esc(role)}">${esc(role)}</gmd:CI_RoleCode></gmd:role></gmd:CI_ResponsibleParty></gmd:contact>"""
    }.mkString
    val keywordXml = keywords.map(k => s"<gmd:keyword>${cs(k)}</gmd:keyword>").mkString
    val Seq(w, s_, e, n) = bbox.seq.map(_.toString)
    s"""<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" xmlns:gco="http://www.isotc211.org/2005/gco">""" +
      s"<gmd:fileIdentifier>${cs(identifier)}</gmd:fileIdentifier>" +
      s"<gmd:language>${cs("eng")}</gmd:language>" +
      s"""<gmd:hierarchyLevel><gmd:MD_ScopeCode codeList="$cl#MD_ScopeCode" codeListValue="dataset">dataset</gmd:MD_ScopeCode></gmd:hierarchyLevel>""" +
      contactXml +
      s"<gmd:dateStamp><gco:Date>${esc(pubDate)}</gco:Date></gmd:dateStamp>" +
      "<gmd:identificationInfo><gmd:MD_DataIdentification>" +
      "<gmd:citation><gmd:CI_Citation>" +
      s"<gmd:title>${cs(title)}</gmd:title>" +
      s"""<gmd:date><gmd:CI_Date><gmd:date><gco:Date>${esc(pubDate)}</gco:Date></gmd:date><gmd:dateType><gmd:CI_DateTypeCode codeList="$cl#CI_DateTypeCode" codeListValue="publication">publication</gmd:CI_DateTypeCode></gmd:dateType></gmd:CI_Date></gmd:date>""" +
      "</gmd:CI_Citation></gmd:citation>" +
      s"<gmd:abstract>${cs(abstractText)}</gmd:abstract>" +
      s"<gmd:descriptiveKeywords><gmd:MD_Keywords>$keywordXml</gmd:MD_Keywords></gmd:descriptiveKeywords>" +
      "<gmd:extent><gmd:EX_Extent><gmd:geographicElement><gmd:EX_GeographicBoundingBox>" +
      s"<gmd:westBoundLongitude><gco:Decimal>$w</gco:Decimal></gmd:westBoundLongitude>" +
      s"<gmd:eastBoundLongitude><gco:Decimal>$e</gco:Decimal></gmd:eastBoundLongitude>" +
      s"<gmd:southBoundLatitude><gco:Decimal>${s_}</gco:Decimal></gmd:southBoundLatitude>" +
      s"<gmd:northBoundLatitude><gco:Decimal>$n</gco:Decimal></gmd:northBoundLatitude>" +
      "</gmd:EX_GeographicBoundingBox></gmd:geographicElement></gmd:EX_Extent></gmd:extent>" +
      "</gmd:MD_DataIdentification></gmd:identificationInfo>" +
      "</gmd:MD_Metadata>"
  }
}

object Eml {

  private def dom(xml: String) = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    // entity resolution off — untrusted XML (mirrors csw.py:18's
    // resolve_entities=False lxml parser)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.newDocumentBuilder().parse(new InputSource(new StringReader(xml)))
  }

  private def firstText(e: Element, tag: String): String = {
    val nl = e.getElementsByTagName(tag)
    if (nl.getLength == 0) "" else nl.item(0).getTextContent.trim
  }

  def parse(xml: String): EmlMetadata = {
    val doc = dom(xml)
    val dataset = doc.getElementsByTagName("dataset").item(0).asInstanceOf[Element]

    def contactOf(role: String): Option[(String, String)] = {
      val nl = dataset.getElementsByTagName(role)
      if (nl.getLength == 0) None
      else {
        val e = nl.item(0).asInstanceOf[Element]
        val given = firstText(e, "givenName")
        val sur = firstText(e, "surName")
        val name = s"$given $sur".trim
        if (name.isEmpty) None else Some(role -> name)
      }
    }

    val kwSets = dataset.getElementsByTagName("keywordSet")
    val groups = (0 until kwSets.getLength).map { i =>
      val g = kwSets.item(i).asInstanceOf[Element].getElementsByTagName("keyword")
      (0 until g.getLength).map(g.item(_).getTextContent.trim)
    }

    val bc = dataset.getElementsByTagName("boundingCoordinates").item(0).asInstanceOf[Element]
    def coord(tag: String): Double = firstText(bc, tag).toDouble

    EmlMetadata(
      identifier = firstText(dataset, "alternateIdentifier"),
      title = firstText(dataset, "title"),
      abstractText = firstText(dataset, "para"),
      pubDate = firstText(dataset, "pubDate"),
      bbox = EmlBBox(
        coord("westBoundingCoordinate"), coord("southBoundingCoordinate"),
        coord("eastBoundingCoordinate"), coord("northBoundingCoordinate")),
      keywordGroups = groups,
      contacts = Seq("creator", "metadataProvider").flatMap(contactOf))
  }

  /** Version from the EML root's `packageId` attribute —
    * `meta["eml:eml"]["@packageId"].split("/")[1].replace("v", "")`
    * (`resources.py:56-58`): "d0a1b2c3/v7" → "7". */
  def packageVersion(xml: String): String = {
    val root = dom(xml).getDocumentElement
    root.getAttribute("packageId").split("/")(1).replace("v", "")
  }

  /** `get_anytext` (`csw.py:25-38`): every text node of the document,
    * stripped, space-joined. Real XML traversal, not string reuse. */
  def anytext(xml: String): String = {
    val buf = new ArrayBuffer[String]()
    def walk(n: Node): Unit = {
      if (n.getNodeType == Node.TEXT_NODE) {
        val t = n.getNodeValue.trim
        if (t.nonEmpty) buf += t
      }
      val kids = n.getChildNodes
      (0 until kids.getLength).foreach(i => walk(kids.item(i)))
    }
    walk(dom(xml))
    buf.mkString(" ")
  }

  /** Order-preserving dedup — the deterministic stand-in for the
    * reference's Python `set(...)` joins (`csw.py:91,98`), whose
    * iteration order is hash-seed dependent. */
  def dedup(xs: Seq[String]): Seq[String] = xs.distinct
}

/** IPT RSS catalog scan (`ipt.py:6-21`). */
final case class IptDataset(id: String, title: String, version: String, guid: String, url: String)

object Ipt {

  /** Fixture root, robust to cwd. */
  def fixture(rel: String): String = {
    val local = Paths.get("src/test/resources/ipt", rel)
    if (Files.exists(local)) local.toAbsolutePath.toString
    else s"/root/repo/src/test/resources/ipt/$rel"
  }

  def readFixture(rel: String): String =
    new String(Files.readAllBytes(Paths.get(fixture(rel))), java.nio.charset.StandardCharsets.UTF_8)

  /** Parse an RSS feed: id from `link` after '=', version from
    * `guid` segment 1 with its 'v' stripped (`ipt.py:14-19`). */
  def datasets(rssXml: String, baseUrl: String): Seq[IptDataset] = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    val doc = dbf.newDocumentBuilder().parse(
      new InputSource(new StringReader(rssXml)))
    val items = doc.getElementsByTagName("item")
    (0 until items.getLength).map { i =>
      val e = items.item(i).asInstanceOf[Element]
      def t(tag: String) = e.getElementsByTagName(tag).item(0).getTextContent.trim
      val link = t("link")
      val guid = t("guid")
      val id = link.split("=")(1)
      val version = guid.split("/")(1).replace("v", "")
      IptDataset(id, t("title"), version, guid, s"${baseUrl}resources/$id")
    }
  }
}
