package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native kernel bit-for-bit against the regex + try-cast
  * SQL formulation it replaced (the executable spec of the DuckDB
  * sniffer rules), over an adversarial generated corpus. A divergence
  * on any value would silently change SnifferCsv's column typing. */
class DuckTypeMaskSpec extends AnyFunSuite with SparkTestBase {

  // the retired SQL predicates — kept HERE as the reference semantics
  private val intRe = "^-?(0|[1-9][0-9]*)$"
  private val dblRe = "^-?((0|[1-9][0-9]*)(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  private val isoDateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  private val dmyDateRe = "^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$"
  private val tsRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$"

  /** Deterministic adversarial corpus: every family plus hash-derived
    * mutations. Year 0000 is excluded — 'yyyy' (year-of-era) cannot
    * parse it while the kernel's proleptic validator can; DuckDB
    * accepts it, so the kernel is the more faithful side of that
    * (unreachable) edge. */
  private def corpus: Seq[String] = {
    val seeds = Seq(
      "0", "-0", "007", "08", "9", "  5 ", " 2.5 ", "+5", "-3", "12",
      "9223372036854775807", "9223372036854775808", "-9223372036854775808",
      "-9223372036854775809", "92233720368547758070", "0000000000000000001",
      ".5", "5.", "-.5", "0.5", "00.5", "0e3", "1e3", "2.5E-2", "-1E2",
      "1e", "e3", ".", "-", "--1", "1.2.3", "1 2", "nan", "NaN", "inf",
      "INF", "-inf", "-INF", "+inf", "infinity",
      "true", "FALSE", "True", "tRuE", "yes", "t", "f",
      "2024-05-01", "2024-13-01", "2024-02-30", "2024-02-29", "2023-02-29",
      "0001-01-01", "9999-12-31", "2024-5-1", "2024/05/01",
      "03/04/2024", "15/04/2024", "31/11/2024", "29/02/2024", "29/02/2023",
      "3/4/2024", "003/04/2024", "15/04/24",
      "04/15/2024", "01/22/2023", "02/29/2024", "02/29/2023", "13/13/2024",
      "2024-05-01 10:00:00", "2024-05-01 24:00:00", "2024-05-01 23:59:60",
      "2024-02-30 10:00:00", "2024-05-01T10:00:00", "2024-05-01 10:00",
      "", "x", "a b", "über", "１２３")
    val mutated = (0 until 400).map { i =>
      val h = Hashing.jvm32(s"dtm:$i")
      val base = seeds((h % seeds.length).toInt)
      (h / seeds.length) % 7 match {
        case 0 => " " + base
        case 1 => base + " "
        case 2 => "-" + base
        case 3 => base + "0"
        case 4 => "0" + base
        case 5 => base.toUpperCase
        case _ => base
      }
    }
    seeds ++ mutated
  }

  test("kernel mask equals the regex + try-cast reference on every adversarial value") {
    Hashing.register(spark)
    import spark.implicits._
    val df = corpus.filter(_.nonEmpty).toDF("s").select(
      col("s"),
      expr("duck_type_mask(s)").as("m"),
      lower(col("s")).isin("true", "false").as("r_bool"),
      (trim(col("s")).rlike(intRe) &&
        expr("try_cast(trim(s) as bigint)").isNotNull).as("r_big"),
      (col("s").rlike(dblRe) || lower(col("s")).isin("nan", "inf", "-inf")).as("r_dbl"),
      (col("s").rlike(isoDateRe) &&
        expr("try_to_date(s, 'yyyy-MM-dd')").isNotNull).as("r_iso"),
      (col("s").rlike(dmyDateRe) &&
        expr("try_to_date(s, 'd/M/yyyy')").isNotNull).as("r_dmy"),
      (col("s").rlike(tsRe) &&
        expr("try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss')").isNotNull).as("r_ts"),
      (col("s").rlike(dmyDateRe) &&
        expr("try_to_date(s, 'M/d/yyyy')").isNotNull).as("r_mdy"))
    val bad = df.collect().flatMap { r =>
      val (s, m) = (r.getString(0), r.getInt(1))
      def bit(b: Int) = (m & b) != 0
      val want = Seq(
        ("BOOL", r.getBoolean(2), bit(DuckTypeMask.BOOL)),
        ("BIGINT", r.getBoolean(3), bit(DuckTypeMask.BIGINT)),
        ("DOUBLE", r.getBoolean(4), bit(DuckTypeMask.DOUBLE)),
        ("DATE_ISO", r.getBoolean(5), bit(DuckTypeMask.DATE_ISO)),
        ("DATE_DMY", r.getBoolean(6), bit(DuckTypeMask.DATE_DMY)),
        ("TS", r.getBoolean(7), bit(DuckTypeMask.TS)),
        ("DATE_MDY", r.getBoolean(8), bit(DuckTypeMask.DATE_MDY)))
      want.collect { case (k, ref, got) if ref != got => s"'$s' $k: ref=$ref kernel=$got" }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
    assert(corpus.size > 400)
  }
}
