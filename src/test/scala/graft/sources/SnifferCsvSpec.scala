package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pins SnifferCsv's DuckDB-parity rules on the families the gate
  * fixture can't carry (NaN/Inf would flake the driver's pandas hash
  * compare) plus the rejection edge cases. Every expectation below
  * was probed against DuckDB 1.x `read_csv` — the golden values ARE
  * the reference behavior. */
class SnifferCsvSpec extends AnyFunSuite with SparkTestBase {

  private def csv(rows: String*): String = {
    val f = Files.createTempFile("graft-sniff", ".csv")
    Files.writeString(f, rows.mkString("", "\n", "\n"))
    f.toString
  }

  private def typeOf(rows: String*): String =
    SnifferCsv.read(spark, csv(rows: _*)).schema.head.dataType.typeName

  test("numeric acceptance matches DuckDB: padding, leading zeros, plus, dots") {
    // integers may be whitespace-padded ...
    assert(typeOf("c", "  5 ", "6") === "long")
    // ... but doubles may NOT
    assert(typeOf("c", " 2.5 ", "1e3") === "string")
    // leading zeros reject numeric typing (Spark would infer 7, 7.5)
    assert(typeOf("c", "007", "9") === "string")
    assert(typeOf("c", "07.5", "1.5") === "string")
    // a leading '+' rejects numeric typing
    assert(typeOf("c", "+5", "3") === "string")
    // bare and trailing dots are DOUBLE
    assert(typeOf("c", ".5", "1.5") === "double")
    assert(typeOf("c", "5.", "1.5") === "double")
    // int64 overflow promotes the column to DOUBLE, not decimal
    assert(typeOf("c", "9223372036854775808", "1") === "double")
  }

  test("nan/inf are DOUBLE with DuckDB spellings") {
    val vals = SnifferCsv.read(spark, csv("c", "1.5", "nan", "inf", "-inf"))
      .collect().map(_.getDouble(0))
    assert(vals(0) === 1.5)
    assert(vals(1).isNaN)
    assert(vals(2) === Double.PositiveInfinity)
    assert(vals(3) === Double.NegativeInfinity)
  }

  test("booleans are case-insensitive; dates are day-first; quoted empty is null") {
    assert(typeOf("c", "True", "FALSE", "true") === "boolean")
    val d = SnifferCsv.read(spark, csv("c", "03/04/2024", "15/04/2024"))
    assert(d.schema.head.dataType.typeName === "date")
    // day-first: 03/04 is April 3rd, pinned by the unambiguous 15/04
    assert(d.collect().map(_.getDate(0).toString).toSeq
      === Seq("2024-04-03", "2024-04-15"))
    val e = SnifferCsv.read(spark, csv("c;d", "\"\";1", "x;2"), sep = ";")
    assert(e.collect().map(r => Option(r.getString(0))).toSeq === Seq(None, Some("x")))
  }

  test("one value off-type demotes the whole column (full-sample, not prefix)") {
    // 999 longs then one alpha tail value: a prefix sampler would
    // commit to bigint and crash or null the tail at read time
    val rows = "c" +: (1 to 999).map(_.toString) :+ "x"
    assert(typeOf(rows: _*) === "string")
  }
}
