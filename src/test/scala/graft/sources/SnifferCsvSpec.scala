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

  test("per-file dateformat stack: slash format displaces ISO → TIMESTAMP") {
    // probed: (dmy, iso) → dmy DATE, iso TIMESTAMP at midnight
    val df = SnifferCsv.read(spark,
      csv("d,i", "15/04/2024,2024-04-15", "02/01/2023,2023-01-02"))
    assert(df.schema.map(_.dataType.typeName) === Seq("date", "timestamp"))
    assert(df.collect().map(r => (r.getDate(0).toString, r.getTimestamp(1).toString)).toSeq
      === Seq(("2024-04-15", "2024-04-15 00:00:00.0"), ("2023-01-02", "2023-01-02 00:00:00.0")))
    // probed: (mdy, iso) behaves the same way
    val mf = SnifferCsv.read(spark,
      csv("m,i", "04/15/2024,2024-04-15", "01/02/2023,2023-01-02"))
    assert(mf.schema.map(_.dataType.typeName) === Seq("date", "timestamp"))
    assert(mf.head().getDate(0).toString === "2024-04-15")
  }

  test("per-file dateformat stack: popped-past formats never come back") {
    // probed: (mdy, dmy) → d/M/yyyy was popped while resolving column
    // 1, so the day-first column stays VARCHAR (no error, no date)
    val df = SnifferCsv.read(spark,
      csv("m,d", "04/15/2024,15/04/2024", "01/02/2023,02/01/2023"))
    assert(df.schema.map(_.dataType.typeName) === Seq("date", "string"))
    assert(df.collect().map(r => (r.getDate(0).toString, r.getString(1))).toSeq
      === Seq(("2024-04-15", "15/04/2024"), ("2023-01-02", "02/01/2023")))
  }

  test("per-file dateformat stack: the final format reinterprets ambiguous columns") {
    // probed: (ambig, mdy) → the ambiguous column, day-first on its
    // own, is re-read month-first under the file's final format
    val df = SnifferCsv.read(spark,
      csv("a,m", "04/05/2024,04/15/2024", "01/02/2023,01/22/2023"))
    assert(df.schema.map(_.dataType.typeName) === Seq("date", "date"))
    assert(df.head().getDate(0).toString === "2024-04-05") // April 5, NOT May 4
    // ... and alone, the same column is day-first (stack top d/M first)
    val alone = SnifferCsv.read(spark, csv("a", "04/05/2024", "01/02/2023"))
    assert(alone.head().getDate(0).toString === "2024-05-04") // May 4
  }

  test("where DuckDB hard-errors (format invalidated after typing) we keep per-column formats") {
    // probed: (iso, dmy) and (dmy, mdy) make read_csv REJECT the
    // file — the deliberate divergence is typing each column under
    // its own format (WARN logged)
    val a = SnifferCsv.read(spark,
      csv("i,d", "2024-04-15,15/04/2024", "2023-01-02,02/01/2023"))
    assert(a.schema.map(_.dataType.typeName) === Seq("date", "date"))
    assert(a.head().getDate(0).toString === "2024-04-15")
    assert(a.head().getDate(1).toString === "2024-04-15")
    val b = SnifferCsv.read(spark,
      csv("d,m", "15/04/2024,04/15/2024", "02/01/2023,01/22/2023"))
    assert(b.schema.map(_.dataType.typeName) === Seq("date", "date"))
    assert(b.collect().map(_.getDate(1).toString).toSeq === Seq("2024-04-15", "2023-01-22"))
  }

  test("wide no-prefix files type identically through the group-by-mask pass") {
    // > 8 columns routes the no-prefix classification through the
    // posexplode/groupBy(pos, mask) formulation (the narrow-layer flat
    // aggregate is dispatched separately) — pin that both shapes give
    // the lattice answer, incl. nulls and a no-candidate column
    val header = (1 to 9).map(i => s"c$i").mkString(";")
    val r1 = (Seq("5", "1.5", "true", "2024-04-03", "03/04/2024",
      "2024-04-03 10:00:00", "x", "", "007")).mkString(";")
    val r2 = (Seq("6", "2", "FALSE", "2024-04-15", "15/04/2024",
      "2024-04-15 23:59:59", "", "y", "9")).mkString(";")
    val df = SnifferCsv.read(spark, csv(header, r1, r2), sep = ";")
    assert(df.schema.map(_.dataType.typeName).toSeq ===
      Seq("long", "double", "boolean", "date", "date",
        "timestamp", "string", "string", "string"))
    // null accounting flows through the mask-value groups: the empty
    // cells stay null after typing
    val rows = df.collect()
    assert(rows(0).isNullAt(7) && rows(1).isNullAt(6))
  }

  test("one value off-type demotes the whole column (full-sample, not prefix)") {
    // 999 longs then one alpha tail value: a prefix sampler would
    // commit to bigint and crash or null the tail at read time
    val rows = "c" +: (1 to 999).map(_.toString) :+ "x"
    assert(typeOf(rows: _*) === "string")
  }
}
