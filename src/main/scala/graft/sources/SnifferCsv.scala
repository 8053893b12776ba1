package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB-parity CSV type sniffing — types a delimited file the way
  * the reference's `read_csv` does (`/root/reference/src/dwca_parquet/
  * templates/query.sql:2` delegates ALL typing to DuckDB's sniffer),
  * where Spark's own `inferSchema` diverges. Rules replicated from
  * empirical probes of DuckDB 1.x on adversarial fixtures:
  *
  *   - lattice order BOOLEAN → BIGINT → DOUBLE → DATE → TIMESTAMP →
  *     VARCHAR; a column takes the first type EVERY non-null value
  *     satisfies (full-sample, not a prefix sample)
  *   - integers may carry surrounding whitespace ("  5 " → 5) but
  *     DOUBLES MAY NOT (" 2.5 " → VARCHAR)
  *   - leading zeros reject numeric typing ("007", "08", "07.5" →
  *     VARCHAR — Spark's inferSchema would read 7, 8, 7.5)
  *   - a leading '+' rejects numeric typing ("+5" → VARCHAR)
  *   - ".5" and "5." are DOUBLE; "nan"/"inf"/"-inf" are DOUBLE
  *   - int64 overflow promotes the whole column to DOUBLE
  *     ("9223372036854775808" — Spark would infer DECIMAL(19,0))
  *   - day-first slash dates are DATE ("15/04/2024" → 2024-04-15;
  *     Spark's inferSchema leaves them strings)
  *   - BOOLEAN is case-insensitive true/false
  *   - quoted empty strings are NULL (allow_quoted_nulls), like bare
  *     empty fields
  *
  * Known boundary (out of scope, verified empirically): DuckDB
  * resolves ONE dateformat per FILE — a file mixing day-first slash
  * dates with ISO dates types the ISO column TIMESTAMP, not DATE.
  * This sniffer types columns independently; the gate fixtures keep
  * one date family per file accordingly.
  *
  * Scale shape: one all-string scan + ONE partial-aggregated
  * classification pass (count per candidate type per column — the
  * same narrowest-type single-pass as [[RegexCsv]]), then a codegen'd
  * cast projection. The driver receives one row of counts.
  */
object SnifferCsv {

  private val intRe = "^-?(0|[1-9][0-9]*)$"
  // no padding, no leading zeros, no leading '+'; .5 / 5. / exponents ok
  private val dblRe = "^-?((0|[1-9][0-9]*)(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  private val isoDateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  private val dmyDateRe = "^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$"
  private val tsRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$"
  private val specialDbl = Seq("nan", "inf", "-inf")

  /** Read `path` with DuckDB-sniffer-parity types. */
  def read(spark: SparkSession, path: String, sep: String = ","): DataFrame = {
    val raw0 = spark.read
      .option("header", "true").option("sep", sep)
      .option("escape", "\"") // RFC4180 doubled quotes, as DuckDB reads them
      .csv(path)
    // quoted "" → NULL like bare empty (DuckDB allow_quoted_nulls)
    val raw = raw0.select(raw0.columns.map(h =>
      when(col(h) === "", lit(null)).otherwise(col(h)).as(h)): _*)

    val aggs: Seq[Column] = raw.columns.toSeq.flatMap { h =>
      val c = col(h)
      Seq(
        count(c),
        count(when(lower(c).isin("true", "false"), 1)),
        count(when(trim(c).rlike(intRe) &&
          expr(s"try_cast(trim(`$h`) as bigint)").isNotNull, 1)),
        count(when(c.rlike(dblRe) || lower(c).isin(specialDbl: _*), 1)),
        count(when(c.rlike(isoDateRe) &&
          expr(s"try_to_date(`$h`, 'yyyy-MM-dd')").isNotNull, 1)),
        count(when(c.rlike(dmyDateRe) &&
          expr(s"try_to_date(`$h`, 'd/M/yyyy')").isNotNull, 1)),
        count(when(c.rlike(tsRe) &&
          expr(s"try_to_timestamp(`$h`, 'yyyy-MM-dd HH:mm:ss')").isNotNull, 1)))
    }
    val r = raw.agg(aggs.head, aggs.tail: _*).head()

    val typed = raw.columns.toSeq.zipWithIndex.map { case (h, i) =>
      val Seq(n, bool, big, dbl, iso, dmy, ts) = (0 to 6).map(j => r.getLong(7 * i + j))
      val c = col(h)
      val out =
        if (n == 0) c.cast("string")
        else if (bool == n) c.cast("boolean")
        else if (big == n) trim(c).cast("bigint")
        else if (dbl == n)
          when(lower(c) === "nan", lit(Double.NaN))
            .when(lower(c) === "inf", lit(Double.PositiveInfinity))
            .when(lower(c) === "-inf", lit(Double.NegativeInfinity))
            .otherwise(c.cast("double"))
        else if (iso == n) to_date(c, "yyyy-MM-dd")
        else if (dmy == n) to_date(c, "d/M/yyyy")
        else if (ts == n) to_timestamp(c, "yyyy-MM-dd HH:mm:ss")
        else c
      out.as(h)
    }
    raw.select(typed: _*)
  }
}
