package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite with SparkTestBase {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("pointWkb emits little-endian ISO WKB") {
    // 01 (LE) + 01000000 (point) + doubles 59.91, 10.75
    assert(hex(Geo.pointWkb(59.91, 10.75)) ===
      "010100000014ae47e17af44d400000000000802540")
    assert(hex(Geo.pointWkb(0.0, 0.0)) ===
      "010100000000000000000000000000000000000000")
  }

  test("wktToWkb golden vectors") {
    assert(hex(Geo.wktToWkb("POINT (1 2)")) ===
      "0101000000000000000000f03f0000000000000040")
    // 1-ring unit square polygon: type 3, 1 ring, 5 points
    val sq = Geo.wktToWkb("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(hex(sq).startsWith("010300000001000000" + "05000000"))
    assert(sq.length === 1 + 4 + 4 + 4 + 5 * 16)
    // multipolygon: 2 squares
    val mp = Geo.wktToWkb(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))")
    assert(hex(mp).startsWith("010600000002000000" + "0103000000"))
    // empty forms: POINT EMPTY = (NaN, NaN), canonical NaN bits LE
    assert(hex(Geo.wktToWkb("POINT EMPTY")) ===
      "0101000000" + "000000000000f87f" * 2)
    assert(hex(Geo.wktToWkb("POLYGON EMPTY")) === "010300000000000000")
  }

  test("wkt roundtrip through wkb") {
    val cases = Seq(
      "POINT (59.91 10.75)",
      "LINESTRING (0 0, 1 1, 2 0.5)",
      "POLYGON ((10 63, 11 63, 11 64, 10 64, 10 63))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 2), (3 4))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    cases.foreach { w => assert(Geo.wkbToWkt(Geo.wktToWkb(w)) === w) }
  }

  test("envelope extracts the coordinate extent") {
    assert(Geo.envelope(Geo.wktToWkb("POINT (3 4)")).toSeq === Seq(3.0, 4.0, 3.0, 4.0))
    assert(Geo.envelope(Geo.wktToWkb("POLYGON ((10 63, 11 63, 11 64, 10 64, 10 63))")).toSeq
      === Seq(10.0, 63.0, 11.0, 64.0))
    assert(Geo.envelope(Geo.wktToWkb(
      "GEOMETRYCOLLECTION (POINT (-5 2), LINESTRING (0 0, 7 1))")).toSeq
      === Seq(-5.0, 0.0, 7.0, 2.0))
    // empty point -> null envelope
    assert(Geo.envelope(Geo.wktToWkb("POINT EMPTY")) === null)
  }

  test("malformed WKT throws") {
    assertThrows[IllegalArgumentException](Geo.wktToWkb("POINT (1)"))
    assertThrows[IllegalArgumentException](Geo.wktToWkb("CIRCLE (1 2, 3)"))
    assertThrows[IllegalArgumentException](Geo.wktToWkb("POINT (1 2) trailing"))
  }

  test("ST_* expressions evaluate and codegen inside Spark plans") {
    GeoFunctions.register(spark)
    import spark.implicits._
    val df = Seq((59.91, 10.75, "POLYGON ((10 63, 11 63, 11 64, 10 64, 10 63))"),
      (1.0, 2.0, null)).toDF("lat", "lon", "wkt")
    val out = df.selectExpr(
      "st_point(lat, lon) as p",
      "st_geomfromtext(wkt) as g",
      "st_astext(coalesce(st_geomfromtext(wkt), st_point(lat, lon))) as t")
      .collect()
    assert(hex(out(0).getAs[Array[Byte]]("p")) ===
      "010100000014ae47e17af44d400000000000802540")
    assert(out(0).getAs[String]("t") === "POLYGON ((10 63, 11 63, 11 64, 10 64, 10 63))")
    assert(out(1).isNullAt(1)) // null wkt -> null geometry
    assert(out(1).getAs[String]("t") === "POINT (1 2)") // falls back to point
  }
}
