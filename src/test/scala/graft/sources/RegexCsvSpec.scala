package graft.sources

import graft.SparkTestBase
import graft.dwca.DwcaLayer
import org.scalatest.funsuite.AnyFunSuite

/** Full-sample inference of the regex-separated scan path: a column
  * gets the narrowest type every non-null value satisfies, and a
  * single offending value demotes it. */
class RegexCsvSpec extends AnyFunSuite with SparkTestBase {

  private def layer(headers: Seq[String]): DwcaLayer =
    DwcaLayer("t", "t.txt", "UTF-8", "\\s*;\\s*", 0, isExtension = false, headers)

  private def scan(lines: Seq[String], headers: Seq[String]) = {
    import spark.implicits._
    RegexCsv.scan(spark, lines.toDS(), layer(headers))
  }

  test("bigint, double, date, and string columns infer from full sample") {
    val df = scan(Seq(
      "i;f;d;s",
      "1; 2.5 ;2024-01-02;x",
      "-7;3;2024-12-31;1",
      "42; ;;"), Seq("i", "f", "d", "s"))
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types === Map("i" -> "long", "f" -> "double", "d" -> "date", "s" -> "string"))
    val rows = df.collect().sortBy(_.getLong(0)) // -7, 1, 42
    assert(rows(1).getLong(0) === 1L && rows(1).getDouble(1) === 2.5)
    assert(rows(1).getDate(2).toString === "2024-01-02")
    // empty fields are null in every type (the "42; ;;" row)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("one non-conforming value demotes the column (full sample, not a prefix)") {
    val df = scan(Seq("v", "1", "2", "3", "oops"), Seq("v"))
    assert(df.schema("v").dataType.typeName === "string")
  }

  test("short rows read missing trailing fields as null") {
    val df = scan(Seq("a;b;c", "1;x", "2;y;z"), Seq("a", "b", "c"))
    val r = df.collect().sortBy(_.getLong(0))
    assert(r(0).isNullAt(2) && r(1).getString(2) === "z")
  }

  test("int64-overflow values demote to double, not a wrong bigint") {
    // 19 digits exceeds the integer regex's 18-digit bound
    val df = scan(Seq("v", "1", "9999999999999999999"), Seq("v"))
    assert(df.schema("v").dataType.typeName === "double")
  }
}
