package graft.meta

import org.scalatest.funsuite.AnyFunSuite

class EmlSpec extends AnyFunSuite {

  private val birds = Eml.parse(Ipt.readFixture("eml_birds-norway.xml"))

  test("EML parse extracts identification facts") {
    assert(birds.identifier === "d0a1b2c3")
    assert(birds.title === "Bird observations Norway")
    assert(birds.pubDate === "2024-05-01")
    assert(birds.bbox === EmlBBox(4.0, 57.9, 31.1, 71.2))
    assert(birds.keywordGroups === Seq(Seq("Occurrence", "Birds"), Seq("Occurrence", "Coastal")))
    assert(birds.contacts === Seq("creator" -> "Ola Nordmann",
      "metadataProvider" -> "Kari Nordmann"))
  }

  test("bbox wkt matches shapely box() ring order and number formatting") {
    // shapely starts at (maxx, miny), counter-clockwise; integral
    // coordinates lose their trailing .0 (csw.py:88)
    assert(birds.bbox.wkt ===
      "POLYGON ((31.1 57.9, 31.1 71.2, 4 71.2, 4 57.9, 31.1 57.9))")
  }

  test("anytext collects every text node of the XML (csw.py:25-38)") {
    val txt = Eml.anytext("<a>one<b> two </b><c><d>three</d></c></a>")
    assert(txt === "one two three")
    assert(Eml.anytext(birds.isoXml).contains("Bird observations Norway"))
  }

  test("isoXml escapes markup in text fields and round-trips through the anytext bag") {
    val meta = birds.copy(title = "Fish & Chips <Survey>",
      abstractText = "10 < 20 & true")
    // still a parseable document (dom() would throw on a bare &) ...
    val bag = Eml.anytext(meta.isoXml)
    // ... and the entities decode back to the original characters
    assert(bag.contains("Fish & Chips <Survey>"))
    assert(bag.contains("10 < 20 & true"))
  }

  test("dedup is order-preserving first occurrence") {
    assert(Eml.dedup(Seq("b", "a", "b", "c", "a")) === Seq("b", "a", "c"))
  }

  test("RSS catalog parse: id from link, version from guid (ipt.py:14-19)") {
    val ds = Ipt.datasets(Ipt.readFixture("rss.xml"), baseUrl = "https://api.example/")
    assert(ds.map(_.id) === Seq("birds-norway", "mammals-svalbard"))
    assert(ds.map(_.version) === Seq("7", "12"))
    assert(ds.head.url === "https://api.example/resources/birds-norway")
  }

  test("doctype declarations are rejected (entity-resolution off)") {
    assertThrows[Exception] {
      Eml.anytext("""<?xml version="1.0"?><!DOCTYPE x [<!ENTITY e "boom">]><x>&e;</x>""")
    }
  }
}
