package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** WKT ⇄ WKB conversion used by the ST_* expressions.
  *
  * Static (object) methods so generated whole-stage code can call them
  * directly — see [[StPoint]]/[[StGeomFromText]] `doGenCode`.
  *
  * Emits standard little-endian ISO WKB (byte order 0x01, uint32 type
  * tag, IEEE-754 doubles), the same encoding the reference obtains
  * from DuckDB spatial's GEOMETRY → GeoParquet WKB output
  * (`/root/reference/templates/query.sql:1`,
  * `/root/reference/src/dwca_parquet/libs/parquet.py:48`). 2D only —
  * DwC footprintWKT is 2D.
  */
object Geo {

  private val POINT = 1
  private val LINESTRING = 2
  private val POLYGON = 3
  private val MULTIPOINT = 4
  private val MULTILINESTRING = 5
  private val MULTIPOLYGON = 6
  private val COLLECTION = 7

  /** WKB for POINT(x y). */
  def pointWkb(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1: Byte).putInt(POINT).putDouble(x).putDouble(y)
    b.array()
  }

  /** Parse WKT and emit WKB. Throws IllegalArgumentException on
    * malformed input (mirrors DuckDB's ST_GeomFromText conversion
    * error; null input is handled by the expression layer). */
  def wktToWkb(wkt: String): Array[Byte] = {
    val p = new WktParser(wkt)
    val out = p.geometry()
    p.expectEnd()
    out
  }

  /** Envelope [xmin, ymin, xmax, ymax] of a WKB geometry (NaN-safe:
    * empty points contribute nothing; fully-empty → null upstream). */
  def envelope(wkb: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(wkb)
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    def coord(): Unit = {
      val x = b.getDouble(); val y = b.getDouble()
      if (!x.isNaN && !y.isNaN) {
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
      }
    }
    def geom(): Unit = {
      val order = b.get()
      b.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b.getInt() match {
        case POINT => coord()
        case LINESTRING => val n = b.getInt(); (0 until n).foreach(_ => coord())
        case POLYGON =>
          val rings = b.getInt()
          (0 until rings).foreach { _ =>
            val n = b.getInt(); (0 until n).foreach(_ => coord())
          }
        case MULTIPOINT | MULTILINESTRING | MULTIPOLYGON | COLLECTION =>
          val n = b.getInt(); (0 until n).foreach(_ => geom())
        case other => throw new IllegalArgumentException(s"unknown WKB type $other")
      }
    }
    geom()
    if (xmin.isInfinite) null else Array(xmin, ymin, xmax, ymax)
  }

  /** Render WKB back to canonical WKT (for tests / st_astext). */
  def wkbToWkt(wkb: Array[Byte]): String = {
    val b = ByteBuffer.wrap(wkb)
    val sb = new StringBuilder
    readGeom(b, sb)
    sb.toString
  }

  // integral doubles render without the trailing ".0" (matches DuckDB
  // spatial's ST_AsText); the magnitude guard keeps huge integral
  // doubles (beyond exact-long range) in scientific notation instead
  // of overflowing toLong
  private def fmt(d: Double): String =
    if (d == Math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def readGeom(b: ByteBuffer, sb: StringBuilder): Unit = {
    val order = b.get()
    b.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val tpe = b.getInt()
    tpe match {
      case POINT =>
        val x = b.getDouble(); val y = b.getDouble()
        if (x.isNaN && y.isNaN) sb ++= "POINT EMPTY"
        else sb ++= s"POINT (${fmt(x)} ${fmt(y)})"
      case LINESTRING =>
        sb ++= "LINESTRING "; readRing(b, sb)
      case POLYGON =>
        val n = b.getInt()
        if (n == 0) sb ++= "POLYGON EMPTY"
        else {
          sb ++= "POLYGON ("
          for (i <- 0 until n) { if (i > 0) sb ++= ", "; readRing(b, sb) }
          sb ++= ")"
        }
      case MULTIPOINT | MULTILINESTRING | MULTIPOLYGON | COLLECTION =>
        val name = tpe match {
          case MULTIPOINT => "MULTIPOINT"; case MULTILINESTRING => "MULTILINESTRING"
          case MULTIPOLYGON => "MULTIPOLYGON"; case _ => "GEOMETRYCOLLECTION"
        }
        val n = b.getInt()
        if (n == 0) sb ++= s"$name EMPTY"
        else {
          sb ++= s"$name ("
          for (i <- 0 until n) {
            if (i > 0) sb ++= ", "
            if (tpe == COLLECTION) readGeom(b, sb)
            else {
              // child geometries carry their own byte-order + type header
              val start = sb.length
              readGeom(b, sb)
              // strip the child's "TYPE " prefix for MULTI* canonical form
              val child = sb.substring(start)
              val inner = child.substring(child.indexOf('(')) // keep parens
              sb.setLength(start); sb ++= inner
            }
          }
          sb ++= ")"
        }
      case other => throw new IllegalArgumentException(s"unknown WKB type $other")
    }
  }

  private def readRing(b: ByteBuffer, sb: StringBuilder): Unit = {
    val n = b.getInt()
    sb ++= "("
    for (i <- 0 until n) {
      if (i > 0) sb ++= ", "
      sb ++= fmt(b.getDouble()); sb += ' '; sb ++= fmt(b.getDouble())
    }
    sb ++= ")"
  }

  /** Minimal recursive-descent WKT parser (2D). */
  private final class WktParser(s: String) {
    private var i = 0

    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1

    private def word(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetter)) i += 1
      s.substring(start, i).toUpperCase
    }

    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i in: $s")
      i += 1
    }

    private def peek(): Char = { ws(); if (i < s.length) s.charAt(i) else '\u0000' }

    private def number(): Double = {
      ws()
      val start = i
      while (i < s.length && "+-.0123456789eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) throw new IllegalArgumentException(s"expected number at $i in: $s")
      java.lang.Double.parseDouble(s.substring(start, i))
    }

    def expectEnd(): Unit = {
      ws()
      if (i != s.length) throw new IllegalArgumentException(s"trailing input at $i in: $s")
    }

    private def isEmpty(): Boolean = {
      ws()
      if (s.regionMatches(true, i, "EMPTY", 0, 5)) { i += 5; true } else false
    }

    private def coord(b: ByteBuffer): Unit = { b.putDouble(number()); b.putDouble(number()) }

    private def ring(b: ByteBuffer): Unit = {
      expect('(')
      val lenPos = b.position()
      b.putInt(0)
      var n = 0
      coord(b); n += 1
      while (peek() == ',') { expect(','); coord(b); n += 1 }
      expect(')')
      b.putInt(lenPos, n)
    }

    private def header(b: ByteBuffer, tpe: Int): Unit = { b.put(1: Byte).putInt(tpe) }

    def geometry(): Array[Byte] = {
      val b = ByteBuffer.allocate(sizeBound).order(ByteOrder.LITTLE_ENDIAN)
      geom(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    // worst case: every char is a digit of a distinct coordinate
    private def sizeBound: Int = 64 + s.length * 16

    private def geom(b: ByteBuffer): Unit = word() match {
      case "POINT" =>
        header(b, POINT)
        if (isEmpty()) { b.putDouble(Double.NaN).putDouble(Double.NaN) }
        else { expect('('); coord(b); expect(')') }
      case "LINESTRING" =>
        header(b, LINESTRING)
        if (isEmpty()) b.putInt(0) else ring(b)
      case "POLYGON" =>
        header(b, POLYGON)
        if (isEmpty()) b.putInt(0) else nested(b)(ring)
      case "MULTIPOINT" =>
        header(b, MULTIPOINT)
        if (isEmpty()) b.putInt(0)
        else nested(b) { bb =>
          header(bb, POINT)
          // both "MULTIPOINT (1 2, 3 4)" and "MULTIPOINT ((1 2), (3 4))"
          if (peek() == '(') { expect('('); coord(bb); expect(')') } else coord(bb)
        }
      case "MULTILINESTRING" =>
        header(b, MULTILINESTRING)
        if (isEmpty()) b.putInt(0) else nested(b) { bb => header(bb, LINESTRING); ring(bb) }
      case "MULTIPOLYGON" =>
        header(b, MULTIPOLYGON)
        if (isEmpty()) b.putInt(0) else nested(b) { bb => header(bb, POLYGON); nested(bb)(ring) }
      case "GEOMETRYCOLLECTION" =>
        header(b, COLLECTION)
        if (isEmpty()) b.putInt(0) else nested(b)(geom)
      case other => throw new IllegalArgumentException(s"unsupported WKT type '$other' in: $s")
    }

    private def nested(b: ByteBuffer)(one: ByteBuffer => Unit): Unit = {
      expect('(')
      val lenPos = b.position()
      b.putInt(0)
      var n = 0
      one(b); n += 1
      while (peek() == ',') { expect(','); one(b); n += 1 }
      expect(')')
      b.putInt(lenPos, n)
    }
  }
}
