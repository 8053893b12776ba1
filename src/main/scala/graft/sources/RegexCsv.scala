package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.dwca.DwcaLayer

/** Regex-separated member scan — the input-fidelity path for archives
  * whose `fieldsTerminatedBy` is a genuine regular expression (e.g.
  * `\s*\|\s*`), which the reference compiles with `re.compile`
  * (`/root/reference/src/dwca_parquet/libs/dwca.py:19-20`) while
  * Spark's CSV reader only takes a literal separator. Data rows are
  * split by the SAME regex as the header, pinned to the header
  * schema, then typed by a full-sample inference pass (bigint →
  * double → date → string), mirroring the literal path's
  * `inferSchema` over the whole file.
  *
  * Scale shape: identical to [[ZipSource]] — one task per member
  * (DEFLATE streams are not splittable), split+cast are codegen'd
  * projections, and the inference aggregate is a partial-agg'd
  * single pass. The member is read twice (infer, project) exactly
  * like `inferSchema = true`.
  */
object RegexCsv {

  /** Scan `lines` (header line first) as the layer's table. */
  def scan(spark: SparkSession, lines: Dataset[String], layer: DwcaLayer): DataFrame = {
    val header = layer.headers
    // the header row is the first line of the first partition (member
    // streams are single-partition; text splits keep offset order)
    val body = spark.createDataset(
      lines.rdd.mapPartitionsWithIndex((i, it) => if (i == 0) it.drop(1) else it))(
      org.apache.spark.sql.Encoders.STRING)
    val strs = body.toDF("value")
      .select(split(col("value"), layer.sepRegex, -1).as("f"))
      .select(header.zipWithIndex.map { case (h, i) =>
        // empty field → null (CSV nullValue semantics); a short row's
        // missing trailing fields read as null via `get`, which
        // tolerates out-of-bounds (getItem THROWS under ANSI mode)
        val c = get(col("f"), lit(i))
        when(c === "", lit(null)).otherwise(c).as(h)
      }: _*)

    // full-sample inference: a column gets the narrowest type EVERY
    // non-null value satisfies (try_* so ANSI mode cannot throw)
    val aggs: Seq[Column] = header.flatMap { h =>
      val c = col(h)
      Seq(
        count(c),
        count(when(c.rlike("^[+-]?\\d{1,18}$"), 1)),
        count(when(expr(s"try_cast(`$h` as double)").isNotNull, 1)),
        count(when(expr(s"try_to_date(`$h`, 'yyyy-MM-dd')").isNotNull, 1)))
    }
    val r = strs.agg(aggs.head, aggs.tail: _*).head()
    val typed = header.zipWithIndex.map { case (h, i) =>
      val (n, lng, dbl, dt) =
        (r.getLong(4 * i), r.getLong(4 * i + 1), r.getLong(4 * i + 2), r.getLong(4 * i + 3))
      val t =
        if (n == 0) "string"
        else if (lng == n) "bigint"
        else if (dbl == n) "double"
        else if (dt == n) "date"
        else "string"
      col(h).cast(t).as(h)
    }
    strs.select(typed: _*)
  }
}
