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
  * Dateformat resolution is per FILE, not per column — replicated
  * from 14 empirical probes of DuckDB 1.0 (all pinned in
  * SnifferCsvSpec). DuckDB keeps ONE ordered candidate stack
  * (ISO yyyy-MM-dd tried first, then d/M/yyyy, then M/d/yyyy),
  * walks columns LEFT TO RIGHT popping forward when a column fails
  * the current candidate, and converts ALL date columns under the
  * FINAL surviving format:
  *   - (dmy, iso) → dmy DATE, iso TIMESTAMP (slash format displaced
  *     ISO; bare ISO dates still parse under the ISO timestamp
  *     format → midnight timestamps)
  *   - (mdy, dmy) → mdy DATE, dmy VARCHAR (d/M was already popped
  *     past while resolving column 1; nothing left matches)
  *   - (ambig, mdy) → BOTH DATE read month-first (the final format
  *     silently reinterprets the earlier ambiguous column)
  *   - (iso, dmy) and (dmy, mdy) → DuckDB HARD-ERRORS (the final
  *     format invalidates an already-typed DATE column). This
  *     sniffer deliberately diverges: it keeps each such column
  *     under its own format and logs a WARN naming the divergence —
  *     succeeding where the reference refuses the file (same policy
  *     as the meta.xml columns-union fix).
  * Remaining boundary (documented, not sniffed): 2-digit years and
  * dash/dot slash-family dates, and slash-format timestamps.
  *
  * Scale shape: one all-string scan + ONE partial-aggregated
  * classification pass (count per candidate type per column — the
  * same narrowest-type single-pass as [[RegexCsv]]), then a codegen'd
  * cast projection. The driver receives one row of counts.
  */
object SnifferCsv {

  import graft.functions.DuckTypeMask.{BIGINT, BOOL, DATE_DMY, DATE_ISO, DATE_MDY, DOUBLE, TS}

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The file-wide dateformat candidate stack, in DuckDB's pop order:
    * mask bit → Spark datetime pattern. */
  private val DateCandidates: IndexedSeq[(Int, String)] =
    IndexedSeq(DATE_ISO -> "yyyy-MM-dd", DATE_DMY -> "d/M/yyyy", DATE_MDY -> "M/d/yyyy")

  /** DuckDB's default `read_csv` sniff window in rows — the sample
    * the reference types the CORE layer with (`query.sql:2`;
    * extensions force `sample_size=-1`, `query.sql:4`). */
  val DuckSampleRows = 20480

  /** Read `path` with DuckDB-sniffer-parity types. `coreSampleCheck`
    * additionally detects (and WARNs on) core-layer sampling
    * divergence — see [[sampleDivergence]]. */
  def read(spark: SparkSession, path: String, sep: String = ",",
      encoding: String = "UTF-8", coreSampleCheck: Boolean = false,
      headers: Option[Seq[String]] = None): DataFrame = {
    val base = spark.read
      .option("header", "true").option("sep", sep)
      .option("encoding", encoding)
      .option("escape", "\"") // RFC4180 doubled quotes, as DuckDB reads them
    // known headers (DwC-A extract path): explicit all-string schema
    // skips the reader's header-naming pass; header=true still drops
    // the header line per file at parse time
    val withSchema = headers match {
      case Some(hs) if hs.distinct.size == hs.size =>
        base.schema(org.apache.spark.sql.types.StructType(hs.map(h =>
          org.apache.spark.sql.types.StructField(h,
            org.apache.spark.sql.types.StringType))))
      case _ => base
    }
    typeColumns(withSchema.csv(path), coreSampleCheck)
  }

  /** Same typing over an already-decoded line Dataset (the zip-member
    * no-extraction path — encoding was handled by the line source).
    *
    * `headers`, when the caller already knows the column names (DwC-A
    * layers: `meta.xml` discovery read the member's first line driver-
    * side), skips Spark's header pass: `csv(Dataset)` with
    * `header=true` runs a take(1) JOB per call just to name columns
    * and identify the line to drop — one job per layer per conversion.
    * Instead the header row is dropped positionally (first row of
    * partition 0 — both line sources put the member head there) and
    * the all-string schema is passed explicitly. Duplicate header
    * names fall back to the header pass (Spark's dedup policy applies
    * there; an explicit schema would make later by-name selects
    * ambiguous). */
  def readLines(spark: SparkSession, lines: org.apache.spark.sql.Dataset[String],
      sep: String, coreSampleCheck: Boolean = false,
      headers: Option[Seq[String]] = None): DataFrame = {
    val raw = headers match {
      case Some(hs) if hs.distinct.size == hs.size =>
        val schema = org.apache.spark.sql.types.StructType(hs.map(h =>
          org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
        val data = spark.createDataset(lines.rdd.mapPartitionsWithIndex(
          (i, it) => if (i == 0) it.drop(1) else it))(
          org.apache.spark.sql.Encoders.STRING)
        spark.read
          .option("header", "false").option("sep", sep)
          .option("escape", "\"")
          .schema(schema)
          .csv(data)
      case _ =>
        spark.read
          .option("header", "true").option("sep", sep)
          .option("escape", "\"")
          .csv(lines)
    }
    typeColumns(raw, coreSampleCheck)
  }

  /** Core-layer sampling divergence: the lattice type each column
    * takes under a DuckDB-default prefix sample vs the full pass,
    * for every column where they differ — exactly the files where
    * the reference's default-sampled `read_csv` types the core from
    * the first [[DuckSampleRows]] rows and then ERRORS mid-scan on a
    * later non-conforming value, while this engine's full-pass
    * typing is correct by construction. The divergence is strictly
    * in the safer direction (dwca10 pins the full-pass answer
    * against `sample_size=-1`); detection exists so an operator
    * comparing against a reference deployment knows WHY the
    * reference refused an archive the engine converted.
    *
    * Cost: files the sniff window covers entirely are FREE — the
    * exact row count rides the full counting pass and short-circuits
    * detection. Larger files pay ONE extra bounded job: a second
    * [[maskCounts]] over `limit(DuckSampleRows)` — 20480 rows
    * regardless of file size. The limit models DuckDB's prefix
    * sample: this engine's single-member text scans carry
    * offset-ordered splits, so the limit drains the file head first;
    * on a frame without that ordering guarantee the window would be
    * an arbitrary-but-valid sample, which can only under-report
    * divergence, never corrupt typing (the typed output always comes
    * from the full pass). */
  def sampleDivergence(raw0: DataFrame): Seq[(String, String, String)] = {
    val raw = nullifyEmpty(raw0)
    val (full, prefix, totalRows) = maskCounts(raw, withPrefix = true)
    if (totalRows <= DuckSampleRows) Seq.empty // prefix == file: no drift possible
    else divergence(raw.columns, full, prefix.get)
  }

  private def divergence(cols: Array[String], fullCounts: Array[IndexedSeq[Long]],
      sampledCounts: Array[IndexedSeq[Long]]): Seq[(String, String, String)] = {
    val sampled = sampledCounts.map(latticeName)
    val full = fullCounts.map(latticeName)
    cols.toSeq.zip(sampled.zip(full)).collect {
      case (h, (s, f)) if s != f => (h, s, f)
    }
  }

  /** The coarse lattice verdict for one column's mask counts (date
    * format subtleties collapse to DATE — good enough to NAME a
    * sampled-vs-full divergence; the typed output itself still goes
    * through the full per-format resolution). */
  private def latticeName(cs: IndexedSeq[Long]): String = {
    val Seq(n, bool, big, dbl, iso, dmy, mdy, ts) = cs
    if (n == 0) "VARCHAR"
    else if (bool == n) "BOOLEAN"
    else if (big == n) "BIGINT"
    else if (dbl == n) "DOUBLE"
    else if (iso == n || dmy == n || mdy == n) "DATE"
    else if (ts == n) "TIMESTAMP"
    else "VARCHAR"
  }

  /** quoted "" → NULL like bare empty (DuckDB allow_quoted_nulls). */
  private def nullifyEmpty(raw0: DataFrame): DataFrame =
    raw0.select(raw0.columns.map(h =>
      when(col(h) === "", lit(null)).otherwise(col(h)).as(h)): _*)

  /** The (n, bool, bigint, double, iso, dmy, mdy, ts) slot order the
    * classification consumers index by — bit value per slot 1..7. */
  private val BitOrder: IndexedSeq[Int] =
    IndexedSeq(BOOL, BIGINT, DOUBLE, DATE_ISO, DATE_DMY, DATE_MDY, TS)

  /** Per-column mask counts: (n, bool, bigint, double, iso, dmy, mdy,
    * ts) — ONE partial-agg'd pass, a bounded (≤ columns × 129 mask
    * values) group set to the driver — plus the exact row count
    * (rides the same pass; divergence detection uses it to skip files
    * the sniff window covers entirely).
    *
    * Formulation: one `duck_type_mask` array per row, posexplode,
    * `groupBy(pos, mask)` with two counts (total, head-window). The
    * previous shape — 8 (16 with the prefix window) `count(when)`
    * aggregates PER COLUMN — paid ~columns × 16 aggregate-buffer
    * updates per row and a 100+-expression aggregate to analyze per
    * invocation; grouping by the mask VALUE pays one hash probe per
    * column per row into a ≤ 129-groups-per-column map and expands to
    * per-bit counts driver-side. Measured on the 150k-row bulk core
    * (7 columns, prefix window on): 0.57 s → 0.30 s per pass.
    *
    * `withPrefix = true` additionally returns the same counts over the
    * DuckDB sniff window — the first [[DuckSampleRows]] rows of
    * partition 0 (exact for single-stream members; the head split for
    * staged/extracted files, an arbitrary-but-valid sample otherwise)
    * — via the head-window count IN THE SAME JOB.
    *
    * Dispatch: the group-by-mask shape wins when the per-row
    * aggregate-update count is large (the 16-per-column prefix window,
    * or a wide file); for a narrow no-prefix layer (extensions: 8
    * updates × few columns) the flat aggregate stays cheaper than
    * explode + hash probes — measured 0.23 s vs 0.29 s on the 3-column
    * bulk extension — so that shape keeps the old formulation. */
  private def maskCounts(raw: DataFrame, withPrefix: Boolean = false)
      : (Array[IndexedSeq[Long]], Option[Array[IndexedSeq[Long]]], Long) = {
    graft.functions.Hashing.register(raw.sparkSession)
    if (!withPrefix && raw.columns.length <= 8) return maskCountsFlat(raw)
    val groups = maskGroups(raw, withPrefix).collect()
    val full = Array.fill(raw.columns.length)(new Array[Long](8))
    val pref = Array.fill(raw.columns.length)(new Array[Long](8))
    var total = 0L
    groups.foreach { r =>
      val pos = r.getInt(0)
      val c = r.getLong(2)
      val ch = r.getLong(3)
      if (pos == 0) total += c // every row explodes one element per pos
      if (!r.isNullAt(1)) { // a null mask is a null value: not counted
        val mask = r.getInt(1)
        full(pos)(0) += c
        pref(pos)(0) += ch
        var j = 0
        while (j < BitOrder.length) {
          if ((mask & BitOrder(j)) != 0) {
            full(pos)(j + 1) += c
            pref(pos)(j + 1) += ch
          }
          j += 1
        }
      }
    }
    (full.map(_.toIndexedSeq),
      if (withPrefix) Some(pref.map(_.toIndexedSeq)) else None,
      total)
  }

  /** The classification pass' PLAN (pre-collect) — group-by-mask
    * shape. Exposed so the plan-audit tool ([[graft.Explain]] pseudo-
    * ids) can print the classify job's physical plan. */
  private[graft] def maskGroups(raw: DataFrame, withPrefix: Boolean): DataFrame = {
    graft.functions.Hashing.register(raw.sparkSession)
    val masks = array(raw.columns.map(h => expr(s"duck_type_mask(`$h`)")): _*)
    val base =
      if (withPrefix)
        // monotonically_increasing_id is partitionId<<33 | rowInPartition,
        // so `< DuckSampleRows` selects exactly partition 0's head rows.
        // Projected BEFORE the aggregate (nondeterministic expressions
        // may not appear inside aggregate functions). The fixed output
        // names cannot collide with CSV headers — the original columns
        // are projected away here.
        raw.select(masks.as("ms"),
          (monotonically_increasing_id() < DuckSampleRows).as("hd"))
      else raw.select(masks.as("ms"), lit(false).as("hd"))
    base
      .select(col("hd"), posexplode(col("ms")).as(Seq("pos", "mask")))
      .groupBy("pos", "mask")
      .agg(count(lit(1)).as("c"), count(when(col("hd"), 1)).as("ch"))
  }

  /** The flat-aggregate shape (8 `count(when)` per column, one row to
    * the driver) — the cheaper formulation for narrow no-prefix
    * layers; see the dispatch note on [[maskCounts]]. */
  private def maskCountsFlat(raw: DataFrame)
      : (Array[IndexedSeq[Long]], Option[Array[IndexedSeq[Long]]], Long) = {
    // mask projected once per column, aggregated 8 ways (inlining the
    // mask expression into each count would rely on codegen CSE)
    val masked = raw.select(raw.columns.map(h =>
      expr(s"duck_type_mask(`$h`)").as(h)): _*)
    val aggs: Seq[Column] = raw.columns.toSeq.flatMap { h =>
      val m = col(s"`$h`")
      count(m) +: BitOrder.map(b => count(when(m.bitwiseAND(lit(b)) =!= 0, 1)))
    } :+ count(lit(1))
    val r = masked.agg(aggs.head, aggs.tail: _*).head()
    val full = raw.columns.indices.map(i =>
      (0 until 8).map(j => r.getLong(8 * i + j))).toArray
    (full, None, r.getLong(8 * raw.columns.length))
  }

  /** The DuckDB-lattice classification + cast over an all-string
    * frame: ONE partial-agg'd counting pass (each value classified by
    * one [[graft.functions.DuckTypeMask]] kernel scan — the regex +
    * try-cast chain it replaced evaluated six patterns per value,
    * measurably slowing the bulk conversion bench), then a codegen'd
    * cast projection. */
  private def typeColumns(raw0: DataFrame, coreSampleCheck: Boolean = false): DataFrame = {
    val raw = nullifyEmpty(raw0)
    val (allCounts, prefixCounts, totalRows) = maskCounts(raw, withPrefix = coreSampleCheck)
    def counts(i: Int): IndexedSeq[Long] = allCounts(i)

    // Detection pays only on files LARGER than the sniff window (the
    // row count rides the typing pass for free; a covered file cannot
    // drift) — the window counts ride the SAME pass as guarded
    // aggregates, so detection no longer costs a second job.
    if (coreSampleCheck && totalRows > DuckSampleRows)
      divergence(raw.columns, allCounts, prefixCounts.get).foreach { case (h, s, f) =>
        log.warn(s"core-layer sampling divergence: DuckDB's default-sampled read_csv " +
          s"(reference core path, query.sql:2) types `$h` as $s from the first " +
          s"$DuckSampleRows rows and then errors on a later value; full-pass typing " +
          s"keeps $f (the dwca10-pinned answer)")
      }

    // ── pass 1, columns LEFT TO RIGHT: walk the file-wide dateformat
    // stack. A date column matches the first candidate (from the
    // current stack position on) that EVERY value satisfies; matching
    // advances the position. A date column matching nothing from the
    // position on falls through (ISO dates still land as timestamps,
    // slash dates as VARCHAR) — the pointer does not move.
    var pos = 0
    val provisional: Seq[Option[Int]] = raw.columns.indices.map { i =>
      val cs = counts(i)
      val n = cs(0)
      val isDateCol = n > 0 && cs(1) != n && cs(2) != n && cs(3) != n &&
        DateCandidates.exists { case (b, _) => cs(bitIdx(b)) == n }
      if (!isDateCol) None
      else (pos until DateCandidates.size)
        .find(j => cs(bitIdx(DateCandidates(j)._1)) == n) match {
          case Some(j) => pos = j; Some(j)
          case None => None
        }
    }
    val fileFmt = pos

    val typed = raw.columns.toSeq.zipWithIndex.map { case (h, i) =>
      val cs = counts(i)
      val Seq(n, bool, big, dbl, iso, dmy, mdy, ts) = cs
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
        else provisional(i) match {
          // ── pass 2: convert every date column under the FINAL
          // format, like DuckDB's read does (an ambiguous column typed
          // earlier is silently reinterpreted). If the final format
          // invalidates the column, DuckDB refuses the whole file;
          // we keep the column's own format and say so.
          case Some(j) =>
            val (finalBit, finalPat) = DateCandidates(fileFmt)
            if (cs(bitIdx(finalBit)) == n) to_date(c, finalPat)
            else {
              val (_, ownPat) = DateCandidates(j)
              log.warn(s"sniffer divergence: DuckDB read_csv would REJECT this file " +
                s"(column `$h` is dateformat '$ownPat' but the file resolved to " +
                s"'$finalPat'); keeping `$h` as DATE '$ownPat'")
              to_date(c, ownPat)
            }
          case None =>
            if (iso == n && fileFmt > 0)
              // ISO dates displaced by a slash file-format: DuckDB
              // parses them under the (still-ISO) TIMESTAMP format
              to_timestamp(c, "yyyy-MM-dd")
            else if ((dmy == n || mdy == n) && n > 0)
              c // slash dates with their format popped past: VARCHAR
            else if (ts == n) to_timestamp(c, "yyyy-MM-dd HH:mm:ss")
            else c
        }
      out.as(h)
    }
    raw.select(typed: _*)
  }

  private def bitIdx(bit: Int): Int = bit match {
    case BOOL => 1
    case BIGINT => 2
    case DOUBLE => 3
    case DATE_ISO => 4
    case DATE_DMY => 5
    case DATE_MDY => 6
    case TS => 7
  }
}
