package graft.sinks

import java.nio.file.Paths

import graft.{Q, Tables}
import graft.CacheScope.PersistScopedOps
import graft.dwca.DwcaConvert
import org.apache.spark.sql.functions._

/** Driver-gate queries for the sink tier. Each performs a real write
  * to a scratch directory, then RETURNS the read-back relation so the
  * DuckDB oracle validates the full write→read roundtrip, not just
  * that a write happened.
  */
object SinkQueries {

  // Per-JVM scratch (graft.RunScratch): deterministic re-run within a
  // JVM (prior outputs dropped so the idempotent-skip path is
  // exercised explicitly), disjoint across JVMs (closes the sink18
  // live-scratch oracle hazard, SURVEY §8.17).
  private[graft] def scratch(name: String): String =
    graft.RunScratch.fresh(s"sinks/$name")

  /** The same path scratch(name) returns, computed without cleaning —
    * for oracle SQL built at registry-init time and for specs reading
    * a query's output in-JVM. */
  private[graft] def scratchPath(name: String): String =
    graft.RunScratch.path(s"sinks/$name")

  val all: Map[String, Q] = Map(
    // ── S7+S11: zstd parquet, versioned+latest double-write, skip ──
    "sink01_versioned_roundtrip" -> Q(
      (s, d) => {
        val base = scratch("versioned")
        val df = DwcaConvert.convert(s, graft.dwca.DwcaQueries.fixtureZip, DwcaConvert.GeomWktString)
        val wrote = Sinks.writeVersioned(s, df, base, "res1", "7")
        val skipped = !Sinks.writeVersioned(s, df, base, "res1", "7")
        require(wrote && skipped, s"idempotent-skip broken: wrote=$wrote skipped=$skipped")
        s.read.parquet(s"$base/res1.parquet")
      },
      // the roundtrip must reproduce dwca01's oracle exactly
      graft.dwca.DwcaQueries.all("dwca01_convert").oracle),

    // ── S8: GeoParquet `geo` footer patch + readback ──
    "sink02_geoparquet_footer" -> Q(
      (s, d) => {
        import s.implicits._
        val out = scratch("geoparquet")
        val df = DwcaConvert.convert(s, graft.dwca.DwcaQueries.fixtureZip, DwcaConvert.GeomWkb)
        Sinks.writeZstd(df.coalesce(1), out)
        Sinks.patchGeoFooter(s, out, "geom")
        Sinks.readFooterKey(s, out, "geo").zipWithIndex
          .map { case ((_, json), ix) => (ix, json) }
          .toDF("part_ix", "geo_json")
      },
      // the bbox is the single part's own envelope (per-part stamping;
      // fixture extent over its points + footprint polygons)
      Some("""SELECT * FROM (VALUES (0,
                '{"version":"1.0.0","primary_column":"geom","columns":{"geom":{"encoding":"WKB","geometry_types":["Point","Polygon"],"crs":null,"bbox":[10.0,5.73,60.79,70.0]}}}'))
              AS t(part_ix, geo_json)""")),

    // ── sink21: GeoParquet 1.1 `covering` bbox column — the
    // read-side complement of sink02's per-part footer bbox: each
    // row carries its own (xmin, ymin, xmax, ymax) envelope struct,
    // declared by a 1.1.0 footer's `covering` key, so a 1.1 reader
    // prunes ROW GROUPS from the struct fields' parquet min/max
    // stats before touching any WKB. Version decision: 1.0.0 stays
    // the default footer everywhere (covering is the single 1.1
    // feature, opt-in per sink — 1.0-only consumers are unaffected).
    // The gate round-trips the written struct against the fixture
    // geometries' known envelopes; the footer shape is require()d in
    // the fn and byte-pinned in SinksSpec. ──
    "sink21_geoparquet_covering" -> Q(
      (s, d) => {
        val out = scratch("geocovering")
        val df = DwcaConvert.convert(s, graft.dwca.DwcaQueries.fixtureZip,
          DwcaConvert.GeomWkb)
        Sinks.writeZstd(Sinks.withBboxColumn(s, df, "geom").coalesce(1), out)
        Sinks.patchGeoFooter(s, out, "geom", covering = Some("bbox"))
        val footers = Sinks.readFooterKey(s, out, "geo")
        require(footers.nonEmpty && footers.forall { case (_, j) =>
          j.contains(""""version":"1.1.0"""") &&
            j.contains(""""covering":{"bbox":{"xmin":["bbox","xmin"]""")
        }, s"covering footer malformed: $footers")
        s.read.parquet(out)
          .selectExpr("id", "bbox.xmin as xmin", "bbox.ymin as ymin",
            "bbox.xmax as xmax", "bbox.ymax as ymax")
          .distinct()
      },
      // the fixture geometries' envelopes, coordinate order as stored
      // (x = latitude — the reference's ST_POINT(lat, lon) axis order)
      Some("""SELECT * FROM (VALUES
                ('occ1', 59.91, 10.75, 59.91, 10.75),
                ('occ2', 10.0, 63.0, 11.0, 64.0),
                ('occ3', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)),
                ('occ4', 60.79, 11.08, 60.79, 11.08),
                ('occ5', 18.0, 69.0, 19.0, 70.0),
                ('occ7', 58.97, 5.73, 58.97, 5.73))
              AS t(id, xmin, ymin, xmax, ymax)""")),

    // ── S9: JSON array file (ARRAY true semantics) + readback ──
    "sink03_json_array" -> Q(
      (s, d) => {
        val out = scratch("docs.json")
        val df = Tables(s, d, "documents").where("doc_id < 10")
          .select("doc_id", "lang", "source", "text")
        Sinks.writeJsonArray(s, df, out)
        // multiLine: the file is ONE JSON array, not NDJSON
        s.read.option("multiLine", "true").json(out)
      },
      Some("SELECT doc_id, lang, source, text FROM documents WHERE doc_id < 10")),

    // ── hive-partitioned zstd parquet + readback ──
    // The standard 100 TB output shape: partitionBy turns the column
    // into directory structure (lang=en/…), so downstream readers get
    // partition pruning for free; the readback restores the partition
    // column from the paths and must reproduce the source exactly.
    "sink04_partitioned" -> Q(
      (s, d) => {
        val out = scratch("partitioned")
        Tables(s, d, "documents").select("doc_id", "lang", "source", "text")
          .write.partitionBy("lang")
          .option("compression", "zstd").parquet(out)
        s.read.parquet(out).select("doc_id", "lang", "source", "text")
      },
      Some("SELECT doc_id, lang, source, text FROM documents")),

    // ── layout-for-data-skipping write: range-repartition + sort
    // WITHIN partitions by the dominant filter column before writing,
    // so every parquet row group carries a TIGHT min/max on that
    // column and a reader's range predicate prunes row groups instead
    // of scanning them (the layout knob that matters most at 100 TB —
    // SinksSpec asserts the written groups are actually disjoint and
    // that a range filter prunes). Content is byte-identical to the
    // unsorted write — which is exactly what the oracle asserts. ──
    "sink05_sorted_write" -> Q(
      (s, d) => {
        val out = scratch("sorted")
        Tables(s, d, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
          .repartitionByRange(4, org.apache.spark.sql.functions.col("o_orderdate"))
          .sortWithinPartitions("o_orderdate", "o_orderkey")
          .write.option("compression", "zstd").parquet(out)
        s.read.parquet(out).select("o_orderkey", "o_orderdate", "o_totalprice")
      },
      Some("SELECT o_orderkey, o_orderdate, o_totalprice FROM orders")),

    // ── small-file compaction — the table-maintenance pass every
    // long-lived 100 TB dataset needs (streaming sinks and
    // per-archive conversions accrete tiny parts; small files
    // multiply scan tasks and NameNode/liststatus pressure). A
    // deliberately fragmented 64-part copy is compacted to
    // ~target-sized files via the shuffle-free Sinks.compact;
    // the oracle asserts the rewrite lost and changed nothing. ──
    "sink06_compaction" -> Q(
      (s, d) => {
        val frag = scratch("fragmented")
        val out = scratch("compacted")
        Tables(s, d, "documents").select("doc_id", "lang", "source", "text")
          .repartition(64).write.option("compression", "zstd").parquet(frag)
        Sinks.compact(s, frag, out, targetBytes = 1L << 20)
        s.read.parquet(out).select("doc_id", "lang", "source", "text")
      },
      Some("SELECT doc_id, lang, source, text FROM documents")),

    // ── per-file statistics manifest + file-skipping scan — the
    // Iceberg/Delta metadata-pruning story in miniature. The table is
    // written range-partitioned on the dominant filter column (so
    // files carry disjoint value ranges, sink05's layout), then ONE
    // distributed pass builds a manifest of per-file
    // (min, max, row count) — itself a parquet artifact, O(files)
    // rows. A range query consults the MANIFEST first: only files
    // whose [min,max] intersects the predicate are handed to the
    // reader; the rest are never opened. The driver touches O(files)
    // manifest rows, never data. At 100 TB this is the difference
    // between listing 100k footers per query and reading one small
    // manifest table — and the manifest is incrementally maintainable
    // (append per-file rows on write, rewrite on compaction). The
    // oracle asserts the pruned scan equals the full-scan filter
    // exactly; the require proves skipping actually happened. ──
    "sink07_stats_manifest" -> Q(
      (s, d) => {
        val out = scratch("manifested")
        val man = scratch("manifest")
        Tables(s, d, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
          .repartitionByRange(4, col("o_orderdate"))
          .sortWithinPartitions("o_orderdate", "o_orderkey")
          .write.option("compression", "zstd").parquet(out)
        s.read.parquet(out)
          .groupBy(input_file_name().as("file"))
          .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"),
            count(lit(1)).as("n_rows"))
          .write.parquet(man)
        val (qlo, qhi) = ("1996-01-01", "1996-12-31 23:59:59")
        val manifest = s.read.parquet(man)
        val total = manifest.count()
        val surviving = manifest
          .where(col("hi") >= lit(qlo).cast("timestamp") &&
            col("lo") <= lit(qhi).cast("timestamp"))
          .select("file").collect().map(_.getString(0))
        require(surviving.nonEmpty && surviving.length < total,
          s"manifest pruned nothing: ${surviving.length} of $total files survive")
        s.read.parquet(surviving: _*)
          .where(col("o_orderdate") >= lit(qlo).cast("timestamp") &&
            col("o_orderdate") <= lit(qhi).cast("timestamp"))
          .select("o_orderkey", "o_orderdate", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'"""))
      ,

    // ── compressed NDJSON (.jsonl.gz) roundtrip — the exchange
    // format LLM training corpora actually ship in (one JSON object
    // per line, no array framing; contrast sink03's single-array
    // JSON, the reference's geoapi payload shape). Spark's json
    // writer IS ndjson. gzip members are not splittable, so
    // parallelism is PER SHARD — one task per .jsonl.gz part, which
    // is exactly how real corpora are laid out (many ~100 MB-class
    // shards; sink06's compaction keeps them that size). The
    // readback pins the schema: training shards are read with a
    // declared schema so doc_id's int64-ness survives the JSON
    // number roundtrip and no shard pays an inference pass. ──
    "sink09_jsonl" -> Q(
      (s, d) => {
        val out = scratch("docs-jsonl")
        val df = Tables(s, d, "documents").select("doc_id", "lang", "source", "text")
        df.write.option("compression", "gzip").json(out)
        s.read.schema(df.schema).json(out)
      },
      Some("SELECT doc_id, lang, source, text FROM documents")),

    // ── Z-order (Morton) layout: multi-column data skipping. sink05's
    // linear sort gives tight file ranges on ONE column; interleaving
    // the bits of (o_custkey, o_orderdate-days) orders the write along
    // a space-filling curve, so every file covers a LOCALIZED rectangle
    // of the 2-D key space and min/max pruning works on EITHER column
    // — the Databricks Z-ORDER / Iceberg sort-order technique. Each
    // dimension is min/max-normalized to 16 bits FIRST (broadcast
    // 1-row extent frame): with raw values the wider domain's high
    // bits dominate the interleave and the curve degenerates into a
    // single-column sort; equalized widths are what make every file a
    // localized rectangle (production systems rank-normalize against
    // skew; the curve downstream is identical). The Morton key is one
    // codegen'd map-side fold (16 interleave steps); the write is one
    // range exchange on z, identical cost to sink05. The key is
    // layout-only (dropped before write: narrow projection, order
    // preserved); the oracle pins that the curve rewrite loses and
    // changes nothing, and SinksSpec proves BOTH-column pruning. ──
    "sink08_zorder" -> Q(
      (s, d) => {
        val out = scratch("zorder")
        val morton =
          """aggregate(sequence(0, 15), 0L, (a, i) -> a
               | shiftleft(shiftright(xb, i) & 1, 2*i)
               | shiftleft(shiftright(yb, i) & 1, 2*i + 1))"""
        val ext = Tables(s, d, "orders").selectExpr(
          "min(o_custkey) as cklo", "max(o_custkey) as ckhi",
          "min(unix_date(cast(o_orderdate as date))) as dlo",
          "max(unix_date(cast(o_orderdate as date))) as dhi")
        Tables(s, d, "orders").crossJoin(broadcast(ext))
          .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
            "(o_custkey - cklo) * 65535L div greatest(ckhi - cklo, 1) as xb",
            """(unix_date(cast(o_orderdate as date)) - dlo) * 65535L
                 div greatest(dhi - dlo, 1) as yb""")
          .withColumn("z", expr(morton))
          .repartitionByRange(8, col("z"))
          .sortWithinPartitions("z")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
          .write.option("compression", "zstd").parquet(out)
        s.read.parquet(out)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      },
      Some("SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders")),

    // ── bucketed tables: the co-located-join layout (SURVEY §4). At
    // 100 TB a fact-fact equi-join's exchange IS the bottleneck;
    // pre-bucketing both sides on the join key (same bucket count)
    // lets the bucket-aware scan satisfy the join's distribution
    // requirement, so the sort-merge join — AND the downstream
    // groupBy on the same key — plan with ZERO exchanges: the shuffle
    // is paid once at write time and amortized over every subsequent
    // join. Spark honors bucket layout only through the catalog, so
    // this goes write.bucketBy(...).saveAsTable → table() reads. The
    // repartition on the bucket key before the write keeps file count
    // at one per bucket per side, not tasks × buckets (the bucketed-
    // write small-file trap). BucketingSpec asserts the no-Exchange
    // plan with broadcast disabled; the oracle pins that the layout
    // changes no answer. ──
    "sink10_bucketed_join" -> Q(
      (s, d) => {
        val out = scratch("bucketed")
        s.sql("DROP TABLE IF EXISTS g_orders_bk")
        s.sql("DROP TABLE IF EXISTS g_customer_bk")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .repartition(8, col("o_custkey"))
          .write.format("parquet").bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$out/orders_bk").saveAsTable("g_orders_bk")
        Tables(s, d, "customer")
          .select("c_custkey", "c_name", "c_mktsegment")
          .repartition(8, col("c_custkey"))
          .write.format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$out/customer_bk").saveAsTable("g_customer_bk")
        s.table("g_customer_bk")
          .join(s.table("g_orders_bk"), col("c_custkey") === col("o_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(count(lit(1)).as("n_orders"),
            graft.Det.dsum(col("o_totalprice")).as("total_spend"))
      },
      Some(s"""SELECT c_custkey, c_name, count(*) AS n_orders,
                      ${graft.Det.sqlSum("o_totalprice")} AS total_spend
               FROM customer JOIN orders ON o_custkey = c_custkey
               GROUP BY 1, 2""")),

    // ── CDC upsert (MERGE) on plain parquet, partition-pruned: the
    // Delta/Iceberg MERGE INTO shape without a table format. A
    // year-partitioned base takes a changelog (updates to ~1/37 of
    // keys + inserts of new keys); the merge reads ONLY the affected
    // partitions (the changelog's year set — a bounded collect
    // pushed as a partition filter), resolves key conflicts
    // changelog-wins via a left-anti + union, and writes back with
    // DYNAMIC partition overwrite, so untouched partitions' files
    // are never rewritten (SinksSpec pins their paths+mtimes frozen).
    // localCheckpoint breaks the plan's file lineage before the
    // self-overwrite — the gate-scale stand-in for the stage-and-swap
    // a 100 TB deployment does per partition; cost is
    // O(affected partitions + changelog), never a base rewrite. ──
    "sink11_upsert" -> Q(
      (s, d) => {
        val out = scratch("upsert")
        writeBasePartitioned(s, d, out)
        mergeInto(s, d, out)
        s.read.parquet(out)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "yr")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                                   year(o_orderdate) AS yr FROM orders),
              chg AS (SELECT o_orderkey, o_custkey, o_orderdate,
                             o_totalprice + 1000 AS o_totalprice, yr
                      FROM base WHERE o_orderkey % 37 = 0 AND yr >= 1996
                      UNION ALL
                      SELECT o_orderkey + 400000000000, o_custkey, o_orderdate,
                             o_totalprice, yr
                      FROM base WHERE o_orderkey % 97 = 0 AND yr >= 1996)
              SELECT * FROM base
              WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg)
              UNION ALL SELECT * FROM chg""")),

    // ── sink12: TIME TRAVEL over the manifest-snapshot table
    // ([[Sinks.writeManifest]]). The same changelog as sink11 is
    // merged COPY-ON-WRITE: affected partitions' merged rows are
    // APPENDED as new files (v1's files are never touched) and
    // manifest v2 = untouched partitions' v1 files + the new files.
    // The gate query then reads VERSION 1 — after v2 committed — and
    // its oracle is the plain pre-merge base: history remains exactly
    // readable once the table has moved on, which is the entire
    // snapshot-isolation contract (sink11's dynamic-partition
    // overwrite, by contrast, deletes the history it replaces).
    // SinksSpec pins the complementary claims: v2 equals sink11's
    // merged answer, and the two manifests differ exactly on the
    // affected partitions. ──
    "sink12_time_travel" -> Q(
      (s, d) => {
        val out = scratch("timetravel")
        writeBasePartitioned(s, d, out)
        Sinks.writeManifest(s, out, 1, Sinks.dataFiles(s, out))
        upsertCow(s, d, out)
        Sinks.readAtVersion(s, out, 1)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "yr")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                     year(o_orderdate) AS yr FROM orders""")),

    // ── sink13: CHANGE FEED between two manifest versions (the Delta
    // CDF idea): rows in v2-only files minus rows in v1-only files =
    // net adds, the reverse = net removes; copy-on-write copies of
    // unchanged rows appear in both reads and cancel in the
    // exceptAll. Only the CHANGED files are read — the incremental
    // consumer of a 100 TB table pays for the delta, not the table.
    // Oracle: adds are exactly the changelog, removes are exactly
    // the updated keys' pre-merge rows. ──
    "sink13_change_feed" -> Q(
      (s, d) => {
        val out = scratch("changefeed")
        writeBasePartitioned(s, d, out)
        Sinks.writeManifest(s, out, 1, Sinks.dataFiles(s, out))
        upsertCow(s, d, out)
        Sinks.changeFeed(s, out, 1, 2)
          .select("action", "o_orderkey", "o_custkey", "o_orderdate",
            "o_totalprice", "yr")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                                   year(o_orderdate) AS yr FROM orders),
              chg AS (SELECT o_orderkey, o_custkey, o_orderdate,
                             o_totalprice + 1000 AS o_totalprice, yr
                      FROM base WHERE o_orderkey % 37 = 0 AND yr >= 1996
                      UNION ALL
                      SELECT o_orderkey + 400000000000, o_custkey, o_orderdate,
                             o_totalprice, yr
                      FROM base WHERE o_orderkey % 97 = 0 AND yr >= 1996)
              SELECT 'add' AS action, * FROM chg
              UNION ALL
              SELECT 'remove' AS action, * FROM base
              WHERE o_orderkey % 37 = 0 AND yr >= 1996""")),

    // ── sink14: SCHEMA EVOLUTION on an appended parquet table — a
    // later ingest adds a column; the unified read widens the schema
    // and back-fills the pre-evolution rows with NULL (the
    // Delta/Iceberg add-column contract on plain parquet).
    // mergeSchema is a PER-READ opt-in deliberately: it reconciles
    // every part file's footer — O(files) metadata work a 100 TB
    // table pays only when the reader actually spans an evolution
    // boundary; steady-state readers keep the single-footer fast
    // path. The oracle rebuilds the widened table relationally
    // (old slice with NULL, new slice with values). ──
    "sink14_schema_evolution" -> Q(
      (s, d) => {
        val out = scratch("schemaevo")
        val o = Tables(s, d, "orders")
        o.where("year(o_orderdate) < 1996")
          .select("o_orderkey", "o_totalprice")
          .write.parquet(out)
        o.where("year(o_orderdate) >= 1996")
          .selectExpr("o_orderkey", "o_totalprice",
            "o_orderpriority as priority")
          .write.mode("append").parquet(out)
        s.read.option("mergeSchema", "true").parquet(out)
      },
      Some("""SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS priority
              FROM orders WHERE year(o_orderdate) < 1996
              UNION ALL
              SELECT o_orderkey, o_totalprice, o_orderpriority
              FROM orders WHERE year(o_orderdate) >= 1996""")),

    // ── sink15: row-level DELETE as a positional delete sidecar
    // (merge-on-read — the Iceberg positional-delete / Delta
    // deletion-vector contract), completing the mutation triangle:
    // sink11 rewrites affected partitions (copy-on-write, partition
    // grain), sink12 appends + re-manifests (copy-on-write, file
    // grain), sink15 rewrites NOTHING — the delete is a hidden
    // `_deletes/` sidecar of (file_path, row_index) pairs, O(deleted
    // rows), and readers subtract it with a broadcast anti-join on
    // the position key ([[Sinks.positionalDelete]] /
    // [[Sinks.readWithDeletes]]). This is the shape that makes
    // frequent small deletes (GDPR erasure, retraction feeds)
    // affordable on a 100 TB immutable table: delete cost is one
    // stats-prunable predicate scan + a tiny sidecar write, read
    // cost one anti-join, and compaction can fold DVs in whenever
    // it was going to rewrite anyway. SinksSpec pins the no-rewrite
    // claim (base paths + mtimes frozen through the delete) and
    // sidecar-equals-predicate. ──
    "sink15_deletion_vectors" -> Q(
      (s, d) => {
        val out = scratch("deletevec")
        writeBasePartitioned(s, d, out)
        Sinks.positionalDelete(s, out, "o_orderkey % 13 = 0")
        Sinks.readWithDeletes(s, out)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "yr")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                     year(o_orderdate) AS yr FROM orders
              WHERE o_orderkey % 13 != 0""")),

    // ── sink18: RFC-4180 CSV export roundtrip — the exchange-format
    // guarantee on the WRITE side (the reference's world reads CSV;
    // an engine that exports corpora must produce CSV other engines
    // parse identically): delimiters, embedded quotes (doubled, not
    // backslashed — Spark's default escape is backslash, which
    // DuckDB's RFC reader would mis-parse; the writer pins
    // escape = quote), embedded NEWLINES inside quoted fields, and
    // padded whitespace all survive byte-level export. The GATE
    // compare is the claim itself: Spark re-reads its own files
    // (multiLine for the quoted newlines) while the DuckDB oracle
    // parses THE SAME FILES independently — two parsers, one byte
    // stream, identical rows. Nasty rows are planted (the c08
    // pattern); the write is a plain distributed CSV sink, one file
    // per partition at any scale. ──
    "sink18_csv_roundtrip" -> Q(
      (s, d) => {
        import s.implicits._
        val out = scratch("csvround")
        Tables(s, d, "documents").where("doc_id < 20")
          .selectExpr("doc_id", "text as payload")
          .union(csvNastyRows.toDF("doc_id", "payload"))
          .repartition(2)
          .write.option("header", "true")
          .option("quote", "\"").option("escape", "\"")
          // the WRITER trims padding by default — disable both sides
          // so whitespace-significant payloads export verbatim
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(out)
        s.read.option("header", "true").option("multiLine", "true")
          .option("quote", "\"").option("escape", "\"")
          .schema("doc_id LONG, payload STRING")
          .csv(out)
      },
      Some {
        // same-JVM path as scratch("csvround") above: the oracle dumped
        // by THIS run's Verify reads THIS run's files
        val dir = scratchPath("csvround")
        s"""SELECT doc_id, payload
            FROM read_csv('$dir/*.csv', header = true, delim = ',', quote = '"',
                          escape = '"',
                          columns = {'doc_id': 'BIGINT', 'payload': 'VARCHAR'})"""
      }),

    // ── sink17: INCREMENTAL statistics maintenance — sink07's
    // file-skipping manifest kept fresh across appends WITHOUT
    // rescanning the table: the append's new files get their
    // (lo, hi, n_rows) stats from a scan of ONLY those files, and
    // the new manifest is prior-rows ∪ new-rows — the Delta/Iceberg
    // stats-collection contract (stats are computed at write time,
    // once per file, forever). At 100 TB the difference is a 100 TB
    // rescan per ingest vs a batch-sized one. The gate prunes a
    // date-window query spanning the append boundary with the
    // incrementally-maintained manifest (both old and new files must
    // be skippable) and answers against the plain relational oracle;
    // SinksSpec pins incremental ≡ full-rebuild row-for-row and that
    // prior files' stats rows pass through verbatim. ──
    "sink17_stats_incremental" -> Q(
      (s, d) => {
        val (out, man2) = statsIncrementalRun(s, d)
        val (qlo, qhi) = ("1995-07-01", "1996-06-30 23:59:59")
        val manifest = s.read.parquet(man2)
        val total = manifest.count()
        val surviving = manifest
          .where(col("hi") >= lit(qlo).cast("timestamp") &&
            col("lo") <= lit(qhi).cast("timestamp"))
          .select("file").collect().map(_.getString(0))
        require(surviving.nonEmpty && surviving.length < total,
          s"incremental manifest pruned nothing: ${surviving.length} of $total")
        s.read.parquet(surviving: _*)
          .where(col("o_orderdate") >= lit(qlo).cast("timestamp") &&
            col("o_orderdate") <= lit(qhi).cast("timestamp"))
          .select("o_orderkey", "o_orderdate", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-07-01'
                AND o_orderdate <= TIMESTAMP '1996-06-30 23:59:59'""")),

    // ── sink16: WRITE-AUDIT-PUBLISH on the manifest table — the
    // commit protocol that keeps a bad ingest out of every reader's
    // view (the Iceberg WAP / Delta "stage then swap" practice, and
    // what a training pipeline runs between "the crawler wrote
    // files" and "the corpus advanced a version"). A candidate batch
    // is STAGED — files appended + a staging manifest invisible to
    // version readers ([[Sinks.writeStaged]]) — audited against the
    // staged snapshot (here: no NULL keys, no duplicate keys), and
    // only on audit pass promoted by ONE manifest PUT
    // ([[Sinks.publishStaged]]). The gate run stages a POISONED
    // batch (NULL custkeys — rejected, published history left
    // byte-untouched, its orphans left to vacuum) and a good batch
    // (published as v2), then reads the latest published version;
    // the oracle rebuilds base + good batch relationally. Scale
    // shape: stage cost is the batch's own write + an O(live files)
    // manifest; the audit reads the staged snapshot (a delta-only
    // audit would read just the staged files — both are
    // partition-parallel scans); publish is one PUT, atomic at the
    // object store's rename grain. SinksSpec pins the reject path:
    // versions stay [1] until the good publish, rejected files are
    // referenced by no version, and vacuum removes exactly them. ──
    "sink16_wap" -> Q(
      (s, d) => {
        val out = wapRun(s, d)._1
        val latest = Sinks.manifestVersions(s, out).max
        Sinks.readAtVersion(s, out, latest)
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              UNION ALL
              SELECT o_orderkey + 300000000000, o_custkey, o_totalprice
              FROM orders WHERE o_orderkey % 89 = 0""")),

    // ── sink20: INCREMENTAL VIEW MAINTENANCE — the materialized
    // per-year aggregate maintained under sink11's CDC changelog
    // WITHOUT recomputing the base (what Delta/Materialize call IVM,
    // and what every 100 TB rollup table actually runs: the base
    // scan happened once, forever ago; each merge ships only its
    // DELTA into the aggregate). Updates contribute
    // f(after) − f(before) computed from the changelog's two row
    // images — the before/after pair every real CDC feed carries, and
    // the only delta that is EXACT: the tempting algebraic shortcut
    // "+1000.00 is +100000 cents" is false in IEEE doubles
    // (floor((p+1000)·100) ≠ floor(p·100)+100000 for some p — the
    // sf0.1 sweep caught the one cent in 3.3 billion that proves it).
    // Inserts contribute their cents and +1. The maintained result is agg0 + delta on the affected
    // years ONLY — untouched years' rows pass through bit-identical
    // (SinksSpec pins it) — while the oracle pays the full recompute
    // over the merged table, so the gate compare proves
    // maintain ≡ recompute. Cost shape: O(|changelog| + |groups|),
    // never O(base). ──
    "sink20_agg_maintain" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions.sum
        val delta = cdcDeltaRows(s, d).groupBy("yr")
          .agg(sum("dn").as("dn"), sum("dc").as("dc"))
        maintainedRollup(s, d, delta)
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderdate,
                                   o_totalprice, year(o_orderdate) AS yr
                            FROM orders),
              chg AS (SELECT o_orderkey, o_custkey, o_orderdate,
                             o_totalprice + 1000 AS o_totalprice, yr
                      FROM base WHERE o_orderkey % 37 = 0 AND yr >= 1996
                      UNION ALL
                      SELECT o_orderkey + 400000000000, o_custkey, o_orderdate,
                             o_totalprice, yr
                      FROM base WHERE o_orderkey % 97 = 0 AND yr >= 1996),
              merged AS (SELECT * FROM base
                         WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg)
                         UNION ALL SELECT * FROM chg)
              SELECT CAST(yr AS INTEGER) AS yr, count(*) AS n_orders,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
              FROM merged GROUP BY yr""")),

    // ── sink19: PARTITION-SPEC EVOLUTION (the Iceberg contract on
    // plain parquet): the table starts year-partitioned, then the
    // spec evolves to (year, month) for NEW data — old files are
    // NEVER rewritten (the entire point: a spec change on a 100 TB
    // table must cost zero data movement). Each layout lives under
    // its own spec root because hive-style discovery cannot mix
    // directory depths (that reconciliation is exactly what Iceberg
    // moves into per-file metadata); the unified read runs each spec
    // with its own partition schema and derives the missing `mo`
    // for spec-1 rows from the data column, so consumers see ONE
    // evolved schema. Pruning semantics (SinksSpec pins them): a
    // month-filtered read prunes spec-2 files by directory and must
    // scan spec-1 files and filter on the derived column — the safe
    // superset a spec boundary costs, paid only by readers that
    // cross it. ──
    "sink19_partition_evolution" -> Q(
      (s, d) => {
        val out = partitionEvolutionRun(s, d)
        val r1 = s.read.option("basePath", s"$out/spec1")
          .parquet(s"$out/spec1")
          .withColumn("mo", org.apache.spark.sql.functions
            .expr("month(o_orderdate)"))
        val r2 = s.read.option("basePath", s"$out/spec2")
          .parquet(s"$out/spec2")
        r1.unionByName(r2)
          .select("o_orderkey", "o_custkey", "o_totalprice", "yr", "mo")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                     CAST(year(o_orderdate) AS INTEGER) AS yr,
                     CAST(month(o_orderdate) AS INTEGER) AS mo
              FROM orders""")),

    // ── sink22: the FULL tri-clause MERGE (Delta/Iceberg `MERGE INTO`
    // with every clause sink11 lacks): WHEN MATCHED AND op='U' THEN
    // UPDATE, WHEN MATCHED AND op='D' THEN DELETE, WHEN NOT MATCHED
    // THEN INSERT, and WHEN NOT MATCHED BY SOURCE AND <cond> THEN
    // DELETE — the last clause is what sync-to-source replication
    // needs (rows that vanished upstream vanish downstream). One
    // FULL OUTER join per merge scoped to the source's partitions
    // resolves every clause in a single pass (matched, source-only,
    // target-only all present); only affected year partitions are
    // rewritten (dynamic partition overwrite — untouched years'
    // files stay byte-identical), and the by-source delete is
    // bounded to those partitions, exactly Delta's semantics when
    // the merge condition carries a partition predicate. Overlap
    // rule: a key that is both update- and delete-eligible takes
    // DELETE (clause order), pinned in both engines. ──
    "sink22_merge_full" -> Q(
      (s, d) => {
        val out = scratch("merge_full")
        writeBasePartitioned(s, d, out)
        mergeFull(s, d, out)
        s.read.parquet(out)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "yr")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                                   year(o_orderdate) AS yr FROM orders),
              src AS (SELECT o_orderkey AS k,
                             CASE WHEN o_orderkey % 41 = 0 THEN 'D' ELSE 'U' END AS op,
                             o_custkey AS s_custkey, o_orderdate AS s_orderdate,
                             o_totalprice + 1000 AS s_price, yr AS s_yr
                      FROM base
                      WHERE (o_orderkey % 41 = 0 OR o_orderkey % 37 = 0) AND yr >= 1996
                      UNION ALL
                      SELECT o_orderkey + 500000000000, 'I', o_custkey, o_orderdate,
                             o_totalprice, yr
                      FROM base WHERE o_orderkey % 97 = 0 AND yr >= 1996)
              SELECT b.o_orderkey, b.o_custkey, b.o_orderdate,
                     CASE WHEN coalesce(s.op, '') = 'U' THEN s.s_price
                          ELSE b.o_totalprice END AS o_totalprice,
                     b.yr
              FROM base b LEFT JOIN src s ON s.k = b.o_orderkey
              WHERE NOT (b.yr >= 1996
                         AND (coalesce(s.op, '') = 'D'
                              OR (s.k IS NULL AND b.o_orderkey % 53 = 0)))
              UNION ALL
              SELECT k, s_custkey, s_orderdate, s_price, s_yr
              FROM src WHERE op = 'I'""")),

    // ── sink23: DYNAMIC PARTITION PRUNING — the runtime scan-
    // avoidance mechanism a 100 TB partitioned fact lives by. The
    // fact (lineitem) is written hive-partitioned by ship-month; the
    // read joins it to a month-dimension FILTERED on year, and Spark
    // injects a DynamicPruningExpression subquery into the fact
    // scan's partition filters — only the ~12 matching month
    // directories are listed and read, decided at RUNTIME from the
    // dim filter (static pruning cannot do this: the predicate is on
    // the dim, not the fact). SinksSpec asserts the pruning
    // expression is present in the plan and that an unfiltered read
    // sees 7× the partitions. The oracle ignores layout entirely —
    // the result must equal the plain join on the unpartitioned
    // source, which is exactly the DPP contract (prune ≠ change). ──
    "sink23_dpp" -> Q(
      (s, d) => dppRead(s, d)._1,
      Some(dppOracle)),

    // ── sink23's BENCHED sibling: the same runtime-pruned join+agg
    // over a PRE-STAGED month-partitioned fact (Staged: built once
    // per corpus fingerprint, one file per month partition), so the
    // tracked number is the DPP READ alone — dim filter → runtime
    // subquery → ~12 of 84 month directories listed and scanned —
    // not the partitioned write. Plan shape asserted by SinksSpec's
    // DynamicPruningExpression check on the shared dppAgg. ──
    "sink24_dpp_read" -> Q(
      (s, d) =>
        // staged fact is fingerprint-immutable: reuse the resolved
        // frame (84 partition-dir listings + a schema read per
        // invocation otherwise); sink23's fresh-scratch write below
        // deliberately does NOT reuse
        dppAgg(s, graft.Tables.stagedParquet(s, dppStaged(s, d)), d),
      Some(dppOracle), bench = true),

    // ── sink25: RETENTION VACUUM ([[Sinks.vacuum]]) — the GC half of
    // the time-travel contract: a copy-on-write table only APPENDS
    // (sink12), so without retention GC a 100 TB table's history
    // grows without bound. The lifecycle: base + manifest v1, COW
    // merge commits v2, then vacuum(keep=1) deletes v1's replaced
    // files and v1's manifest (manifests first — at every
    // intermediate state a visible manifest names only live files).
    // The gate reads the HEAD after GC and its oracle is the plain
    // merged table: reclaiming history must be invisible to current
    // readers, which is the entire VACUUM contract. SinksSpec pins
    // the physical half: replaced files gone, expired manifest gone,
    // survivors byte-identical, and keep=2 reclaiming nothing. ──
    "sink25_vacuum" -> Q(
      (s, d) => {
        val out = scratch("vacuum")
        writeBasePartitioned(s, d, out)
        Sinks.writeManifest(s, out, 1, Sinks.dataFiles(s, out))
        upsertCow(s, d, out)
        Sinks.vacuum(s, out, keep = 1)
        Sinks.readAtVersion(s, out, 2)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "yr")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                                   year(o_orderdate) AS yr FROM orders),
              chg AS (SELECT o_orderkey, o_custkey, o_orderdate,
                             o_totalprice + 1000 AS o_totalprice, yr
                      FROM base WHERE o_orderkey % 37 = 0 AND yr >= 1996
                      UNION ALL
                      SELECT o_orderkey + 400000000000, o_custkey, o_orderdate,
                             o_totalprice, yr
                      FROM base WHERE o_orderkey % 97 = 0 AND yr >= 1996)
              SELECT * FROM base
              WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg)
              UNION ALL SELECT * FROM chg""")),

    // ── sink27: SCHEMA EVOLUTION on the versioned table — the
    // add-a-column lifecycle every long-lived 100 TB table goes
    // through: v1 commits three columns; v2 appends NEW files
    // carrying a fourth (o_priority) WITHOUT rewriting v1's files.
    // The mechanism is Delta's schema-in-the-log
    // ([[Sinks.writeManifestWithSchema]]): each commit records its
    // logical schema next to its file list, and [[Sinks.readAtVersion]]
    // pins the read to it — so (a) v1's files NULL-FILL the added
    // column under the v2 schema (the add-column contract), (b) time
    // travel to v1 still shows three columns even though v1's files
    // are live in v2, and (c) no mergeSchema footer sweep ever runs
    // (at 100 TB that sweep opens every file's metadata before the
    // first data byte). The gate reads HEAD; its oracle is the plain
    // union with CAST(NULL) for pre-evolution rows. SchemaEvoSpec
    // pins the v1 view and the no-rewrite claim. ──
    "sink27_schema_evolution" -> Q(
      (s, d) => {
        val out = scratch("schemaevo")
        val base = Tables(s, d, "orders")
          .selectExpr("o_orderkey", "o_custkey", "o_totalprice")
        base.write.option("compression", "zstd").parquet(out)
        val v1Files = Sinks.dataFiles(s, out)
        Sinks.writeManifestWithSchema(s, out, 1, v1Files, base.schema)
        val adds = Tables(s, d, "orders")
          .where("year(cast(o_orderdate as date)) >= 1996")
          .selectExpr("o_orderkey + 400000000000L as o_orderkey", "o_custkey",
            "o_totalprice", "o_orderkey % 5 as o_priority")
        adds.write.option("compression", "zstd").parquet(s"$out/c2")
        Sinks.writeManifestWithSchema(s, out, 2,
          Sinks.dataFiles(s, out), adds.schema)
        Sinks.readAtVersion(s, out, 2)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                     CAST(NULL AS BIGINT) AS o_priority
              FROM orders
              UNION ALL
              SELECT o_orderkey + 400000000000, o_custkey, o_totalprice,
                     o_orderkey % 5
              FROM orders
              WHERE year(CAST(o_orderdate AS DATE)) >= 1996""")),

    // ── sink26: Z-ORDER CLUSTERED WRITE — multi-dimensional file
    // skipping, the layout trick a 100 TB fact queried on MORE THAN
    // ONE column lives by (a table sorted on partkey prunes nothing
    // for a suppkey predicate; Morton-interleaving both keys' bucket
    // bits gives every file a tight bounding BOX in (pk, sk) space,
    // so 2-D range queries skip most files on footer min/max alone).
    // Kernel: bucket each dimension into 16 fixed-width cells
    // against its max (ONE construction-bounded scalar agg — the
    // deterministic stand-in for the sampled range boundaries a
    // production z-optimize uses; sampling is non-deterministic, so
    // the gate pins the closed-form variant), interleave the 4+4
    // bucket bits into an 8-bit Morton code (closed-form shifts, one
    // codegen'd map-side projection — no UDF, no sort), write
    // partitioned by the code. Cost shape at 100 TB: one projection
    // + one chunk-keyed exchange (≤256 partitions) for the write;
    // the stats read-back is a partial agg. More data ⇒ more BITS
    // and more DIMS, same kernel. The gate output is the per-chunk
    // bounding-box table plus `box_hit` — whether the fixed 2-D box
    // query (pk ∈ [100,300] ∧ sk ∈ [10,30]) can touch the chunk —
    // i.e. exactly the pruning decision a reader makes from footers;
    // ZorderSpec asserts the skip rate and the one-dir-per-chunk
    // layout. The oracle replays bucket + interleave arithmetic
    // bit-for-bit; layout must not change the stats. ──
    "sink26_zorder_cluster" -> Q(
      (s, d) => {
        val out = scratch("zorder")
        val li = Tables(s, d, "lineitem")
          .selectExpr("l_partkey as pk", "l_suppkey as sk")
        val mx = li.agg(max("pk").as("mpk"), max("sk").as("msk"))
        li.crossJoin(broadcast(mx))
          .selectExpr("pk", "sk",
            "pk * 16 div (mpk + 1) as pb", "sk * 16 div (msk + 1) as sb")
          .selectExpr("pk", "sk",
            """cast(shiftleft(pb & 1, 1) | shiftleft(pb & 2, 2)
                  | shiftleft(pb & 4, 3) | shiftleft(pb & 8, 4)
                  | (sb & 1) | shiftleft(sb & 2, 1)
                  | shiftleft(sb & 4, 2) | shiftleft(sb & 8, 3) as int) as chunk""")
          .repartition(col("chunk"))
          .write.partitionBy("chunk").option("compression", "zstd").parquet(out)
        s.read.parquet(out)
          .groupBy(col("chunk").cast("long").as("chunk"))
          .agg(count(lit(1)).as("n"),
            min("pk").as("pk_min"), max("pk").as("pk_max"),
            min("sk").as("sk_min"), max("sk").as("sk_max"))
          .selectExpr("chunk", "n", "pk_min", "pk_max", "sk_min", "sk_max",
            """cast(case when pk_min <= 300 and pk_max >= 100
                          and sk_min <= 30 and sk_max >= 10
                    then 1 else 0 end as bigint) as box_hit""")
      },
      Some("""WITH mx AS (SELECT max(l_partkey) AS mpk, max(l_suppkey) AS msk
                          FROM lineitem),
              bkt AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                             (l_partkey * 16) // (mpk + 1) AS pb,
                             (l_suppkey * 16) // (msk + 1) AS sb
                      FROM lineitem, mx),
              zc AS (SELECT pk, sk,
                            (((pb & 1) << 1) | ((pb & 2) << 2)
                             | ((pb & 4) << 3) | ((pb & 8) << 4)
                             | (sb & 1) | ((sb & 2) << 1)
                             | ((sb & 4) << 2) | ((sb & 8) << 3)) AS chunk
                     FROM bkt)
              SELECT chunk, count(*) AS n,
                     min(pk) AS pk_min, max(pk) AS pk_max,
                     min(sk) AS sk_min, max(sk) AS sk_max,
                     CAST(CASE WHEN min(pk) <= 300 AND max(pk) >= 100
                                AND min(sk) <= 30 AND max(sk) >= 10
                           THEN 1 ELSE 0 END AS BIGINT) AS box_hit
              FROM zc GROUP BY 1"""))
  )

  /** sink23/sink24's shared oracle: the plain join on the
    * unpartitioned source — prune must not change the result.
    * (lazy: referenced from `all` above its declaration). */
  private lazy val dppOracle =
    """WITH li AS (SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ym,
                          l_quantity, l_extendedprice
                   FROM lineitem),
       dim AS (SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
                               year(CAST(o_orderdate AS DATE)) AS yr
               FROM orders)
       SELECT li.ym, count(*) AS n,
              CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
       FROM li JOIN dim ON dim.ym = li.ym
       WHERE dim.yr = 1997
       GROUP BY 1"""

  /** sink23's body, shared with SinksSpec's plan assertions: writes
    * the month-partitioned fact once per scratch life, then returns
    * (the DPP-pruned aggregate, the fact path). Integer cents keep
    * the oracle compare exact. */
  private[sinks] def dppRead(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, String) = {
    val out = scratch("dpp")
    dppFact(s, d).write.partitionBy("ym")
      .option("compression", "zstd").parquet(out)
    (dppAgg(s, s.read.parquet(out), d), out)
  }

  private def dppFact(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "lineitem")
      .selectExpr("date_format(cast(l_shipdate as date), 'yyyy-MM') as ym",
        "cast(round(l_quantity * 100) as bigint) as qty_c",
        "cast(round(l_extendedprice * 100) as bigint) as price_c")

  /** sink24's pre-staged fact: built once per corpus fingerprint,
    * repartitioned on the partition column first so each month is ONE
    * file, not tasks × months slivers (the small-files lesson the ANN
    * index taught — a pruned read pays an open per file). */
  private[sinks] def dppStaged(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val root = Paths.get(System.getProperty("java.io.tmpdir"), "graft-dpp",
      d.replaceAll("[^A-Za-z0-9]", "_")).toString
    graft.Staged.ensure(root, graft.Staged.fingerprint(s"$d/lineitem.parquet")) {
      dppFact(s, d).repartition(col("ym"))
        .write.partitionBy("ym").option("compression", "zstd")
        .parquet(s"$root/fact")
    }
    s"$root/fact"
  }

  /** The runtime-pruned read: dim built from ORDERS, with yr a data
    * column (from o_orderdate, not an expression over the join key) —
    * a yr filter cannot be statically rewritten onto ym by constraint
    * inference, so the fact prune genuinely requires the RUNTIME
    * subquery (DynamicPruningExpression, asserted by SinksSpec). */
  private[sinks] def dppAgg(s: org.apache.spark.sql.SparkSession,
      fact: org.apache.spark.sql.DataFrame, d: String)
      : org.apache.spark.sql.DataFrame = {
    val dim = Tables(s, d, "orders")
      .selectExpr("date_format(cast(o_orderdate as date), 'yyyy-MM') as ym",
        "year(cast(o_orderdate as date)) as yr")
      .distinct()
    fact.join(dim.where("yr = 1997"), "ym")
      .groupBy("ym")
      .agg(count(lit(1)).as("n"), sum("qty_c").as("qty_c"),
        sum("price_c").as("price_c"))
      .select("ym", "n", "qty_c", "price_c")
  }

  /** sink11's base snapshot: orders, hive-partitioned by order year. */
  /** stream18's body: stage `orders` as 3 parquet files, replay them
    * as a 3-batch file stream, and commit ONE manifest snapshot per
    * micro-batch — version = batchId + 1, cumulative file set, so a
    * retried batch recommits the same version idempotently instead
    * of forking history (the exactly-once contract a transaction log
    * gives writeStream). Returns the table dir; the caller reads
    * whichever version it wants. */
  private[graft] def streamIngest(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import org.apache.spark.sql.{Dataset, Row}
    val stage = scratch("stream18-stage")
    val out = scratch("stream18-table")
    Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(3).write.parquet(stage)
    val stream = s.readStream.schema(s.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val sb = batch.sparkSession
        val before = Sinks.dataFiles(sb, out).toSet
        batch.write.mode("append").parquet(out)
        val appended = Sinks.dataFiles(sb, out).filterNot(before)
        val prev =
          if (id == 0) Nil else Sinks.readManifest(sb, out, id.toInt)
        Sinks.writeManifest(sb, out, id.toInt + 1, prev ++ appended)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException("stream18 did not drain within 300s")
    }
    out
  }

  /** stream19's body: stream18's manifest ingest with sink16's WAP
    * gate in the commit path — each micro-batch STAGES (append + a
    * staging manifest cut from the latest PUBLISHED head), AUDITS
    * the staged snapshot (no NULL keys, no duplicate keys), and
    * publishes version batchId+1 only on pass; a rejected batch's
    * files stay orphaned for vacuum and its version number is
    * skipped — an honest hole in the history, never a poisoned
    * snapshot. The poison rides IN the data (one staged file
    * carries NULL custkeys), so the reject is deterministic in
    * content, not arrival order, and later batches stage from the
    * last GOOD head. Returns the table dir. */
  private[graft] def auditedStreamIngest(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import org.apache.spark.sql.{Dataset, Row}
    val stage = scratch("stream19-stage")
    val out = scratch("stream19-table")
    val o = Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    o.where("o_orderkey % 4 != 0").repartition(3).write.parquet(stage)
    o.where("o_orderkey % 4 = 0")
      .selectExpr("o_orderkey", "cast(null as bigint) as o_custkey",
        "o_totalprice")
      .coalesce(1).write.mode("append").parquet(stage)
    val stream = s.readStream.schema(s.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val sb = batch.sparkSession
        val heads = Sinks.manifestVersions(sb, out)
        val published =
          if (heads.isEmpty) Nil else Sinks.readManifest(sb, out, heads.max)
        val before = Sinks.dataFiles(sb, out).toSet
        batch.write.mode("append").parquet(out)
        val appended = Sinks.dataFiles(sb, out).filterNot(before)
        val tag = s"b$id"
        Sinks.writeStaged(sb, out, tag, published ++ appended)
        val staged = Sinks.readAtStaged(sb, out, tag)
        val ok = staged.where("o_custkey is null").count() == 0L &&
          staged.groupBy("o_orderkey").count().where("count > 1").count() == 0L
        if (ok) Sinks.publishStaged(sb, out, tag, id.toInt + 1)
        else Sinks.abortStaged(sb, out, tag) // release: orphans fall to vacuum
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException("stream19 did not drain within 300s")
    }
    out
  }

  /** The deterministic CDC delta rows shared by sink20 (one-shot
    * maintenance), stream24 (streaming fold), and their specs — ONE
    * definition of the exact-delta discipline: updates ship
    * f(after) − f(before) computed from the changelog's two row
    * images (the only delta exact under IEEE doubles — see sink20's
    * entry comment); inserts ship their cents and +1. */
  private[graft] def cdcDeltaRows(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val o = Tables(s, d, "orders")
    o.where("o_orderkey % 37 = 0 and year(o_orderdate) >= 1996")
      .selectExpr("year(o_orderdate) as yr", "0L as dn",
        "cast(floor((o_totalprice + 1000) * 100) as bigint)" +
          " - cast(floor(o_totalprice * 100) as bigint) as dc")
      .unionByName(o
        .where("o_orderkey % 97 = 0 and year(o_orderdate) >= 1996")
        .selectExpr("year(o_orderdate) as yr", "1L as dn",
          "cast(floor(o_totalprice * 100) as bigint) as dc"))
  }

  /** base per-year aggregate + a (yr, dn, dc) delta frame → the
    * maintained rollup (sink20's join, shared with stream24). */
  private[graft] def maintainedRollup(s: org.apache.spark.sql.SparkSession,
      d: String,
      delta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
    Tables(s, d, "orders")
      .selectExpr("year(o_orderdate) as yr",
        "cast(floor(o_totalprice * 100) as bigint) as cents")
      .groupBy("yr")
      .agg(count(lit(1)).as("n0"), sum("cents").as("c0"))
      .join(delta, Seq("yr"), "left")
      .select(col("yr"),
        (col("n0") + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (col("c0") + coalesce(col("dc"), lit(0L))).as("total_cents"))
  }

  /** sink19's two-spec table: spec1 holds the pre-evolution slice
    * year-partitioned; spec2 holds the post-evolution slice
    * (year, month)-partitioned. Returns the table root. */
  private[graft] def partitionEvolutionRun(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val out = scratch("partevo")
    val o = Tables(s, d, "orders").selectExpr(
      "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
      "year(o_orderdate) as yr", "month(o_orderdate) as mo")
    o.where("o_orderkey % 3 != 0").drop("mo")
      .write.partitionBy("yr").parquet(s"$out/spec1")
    o.where("o_orderkey % 3 = 0")
      .write.partitionBy("yr", "mo").parquet(s"$out/spec2")
    out
  }

  private[graft] def writeBasePartitioned(s: org.apache.spark.sql.SparkSession,
      d: String, out: String): Unit =
    Tables(s, d, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "year(o_orderdate) as yr")
      .write.partitionBy("yr").parquet(out)

  /** sink11's MERGE: apply the deterministic changelog (updates to
    * ~1/37 of 1996+ keys, inserts of new 1996+ keys) to the
    * year-partitioned base at `out`, rewriting ONLY the affected
    * year partitions (dynamic partition overwrite; earlier years'
    * files must remain byte-identical — SinksSpec pins it). */
  /** The deterministic changelog shared by sink11 (in-place merge) and
    * sink12 (copy-on-write merge): updates to ~1/37 of 1996+ keys,
    * inserts of new 1996+ keys. */
  private def changelog(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables(s, d, "orders")
      .where("o_orderkey % 37 = 0 and year(o_orderdate) >= 1996")
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate",
        "o_totalprice + 1000 as o_totalprice", "year(o_orderdate) as yr")
      .unionByName(Tables(s, d, "orders")
        .where("o_orderkey % 97 = 0 and year(o_orderdate) >= 1996")
        .selectExpr("o_orderkey + 400000000000L as o_orderkey", "o_custkey",
          "o_orderdate", "o_totalprice", "year(o_orderdate) as yr"))

  private[graft] def mergeInto(s: org.apache.spark.sql.SparkSession,
      d: String, out: String): Unit = {
    import org.apache.spark.sql.functions.col
    val chg = changelog(s, d)
    val years = chg.select("yr").distinct().collect().map(_.getInt(0))
    val merged = s.read.parquet(out)
      .where(col("yr").isin(years.map(Integer.valueOf).toSeq: _*))
      .join(chg.select(col("o_orderkey").as("ck")),
        col("o_orderkey") === col("ck"), "left_anti")
      .unionByName(chg)
      .localCheckpointScoped()
    val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("yr").parquet(out)
    finally saved match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** sink22's FULL MERGE: updates (~1/37 of 1996+ keys), deletes
    * (~1/41, winning on overlap), inserts (new 1996+ keys), and a
    * by-source delete of unmatched %53 keys — all resolved by ONE
    * full-outer join over the affected year partitions, rewritten
    * with dynamic partition overwrite (earlier years untouched). */
  private[graft] def mergeFull(s: org.apache.spark.sql.SparkSession,
      d: String, out: String): Unit = {
    import org.apache.spark.sql.functions.col
    val base = Tables(s, d, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "year(o_orderdate) as yr")
    val src = base
      .where("(o_orderkey % 41 = 0 or o_orderkey % 37 = 0) and yr >= 1996")
      .selectExpr("o_orderkey as k",
        "case when o_orderkey % 41 = 0 then 'D' else 'U' end as op",
        "o_custkey as s_custkey", "o_orderdate as s_orderdate",
        "o_totalprice + 1000 as s_price", "yr as s_yr")
      .unionByName(base.where("o_orderkey % 97 = 0 and yr >= 1996")
        .selectExpr("o_orderkey + 500000000000L as k", "'I' as op",
          "o_custkey as s_custkey", "o_orderdate as s_orderdate",
          "o_totalprice as s_price", "yr as s_yr"))
    val years = src.select("s_yr").distinct().collect().map(_.getInt(0))
    val merged = s.read.parquet(out)
      .where(col("yr").isin(years.map(Integer.valueOf).toSeq: _*))
      .join(src, col("o_orderkey") === col("k"), "full_outer")
      // clause resolution: matched-D drops, target-only %53 drops
      // (not-matched-by-source), source-only keeps only inserts
      .where("""not (coalesce(op, '') = 'D'
                     or (k is null and o_orderkey % 53 = 0)
                     or (o_orderkey is null and op <> 'I'))""")
      .selectExpr("coalesce(o_orderkey, k) as o_orderkey",
        "coalesce(o_custkey, s_custkey) as o_custkey",
        "coalesce(o_orderdate, s_orderdate) as o_orderdate",
        "case when coalesce(op, '') in ('U', 'I') then s_price" +
          " else o_totalprice end as o_totalprice",
        "coalesce(yr, s_yr) as yr")
      .localCheckpointScoped()
    val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("yr").parquet(out)
    finally saved match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** sink12's MERGE, copy-on-write flavor: the same changelog as
    * sink11, but the merged affected partitions are APPENDED as new
    * files (v1's files are never deleted or rewritten) and manifest
    * v2 = v1's files from untouched partitions + the commit's own
    * appended files (captured as a before/after set difference — at
    * scale the writer's task-commit file list, never a re-list of
    * the table). Version 1 therefore remains exactly readable. */
  private[graft] def upsertCow(s: org.apache.spark.sql.SparkSession,
      d: String, out: String): Unit = {
    import org.apache.spark.sql.functions.col
    val chg = changelog(s, d)
    val years = chg.select("yr").distinct().collect().map(_.getInt(0)).toSet
    val v1 = Sinks.readManifest(s, out, 1)
    val before = Sinks.dataFiles(s, out).toSet
    val merged = Sinks.readAtVersion(s, out, 1)
      .where(col("yr").isin(years.toSeq.map(Integer.valueOf): _*))
      .join(chg.select(col("o_orderkey").as("ck")),
        col("o_orderkey") === col("ck"), "left_anti")
      .unionByName(chg)
      .localCheckpointScoped()
    merged.write.mode("append").partitionBy("yr").parquet(out)
    val appended = Sinks.dataFiles(s, out).filterNot(before)
    val keep = v1.filterNot(f => years.exists(y => f.startsWith(s"yr=$y/")))
    Sinks.writeManifest(s, out, 2, keep ++ appended)
  }

  /** sink18's planted adversarial payloads — every RFC-4180 escape
    * case: delimiter, embedded quotes, embedded newline, padding,
    * and the all-three mix. */
  private[graft] lazy val csvNastyRows: Seq[(Long, String)] = Seq(
    (9000001L, "a,b,c"),
    (9000002L, "say \"hi\" twice"),
    (9000003L, "line1\nline2"),
    (9000004L, "  padded  "),
    (9000005L, "mix, of \"all\"\nthree"))

  /** sink17's lifecycle (factored for SinksSpec): base (pre-1996,
    * date-sorted) written + stats manifest v1 from a base scan; a
    * 1996+ batch appended; manifest v2 = v1 rows ∪ stats of ONLY the
    * appended files (the incremental scan reads just those paths).
    * Returns (table dir, v2 manifest dir). */
  private[graft] def statsIncrementalRun(
      s: org.apache.spark.sql.SparkSession, d: String): (String, String) = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val out = scratch("statsinc")
    val man1 = scratch("statsinc-man1")
    val man2 = scratch("statsinc-man2")
    val o = Tables(s, d, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(input_file_name().as("file"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"),
        count(lit(1)).as("n_rows"))
    o.where("year(o_orderdate) < 1996")
      .repartitionByRange(4, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate", "o_orderkey")
      .write.parquet(out)
    stats(s.read.parquet(out)).write.parquet(man1)
    val before = Sinks.dataFiles(s, out).toSet
    o.where("year(o_orderdate) >= 1996")
      .repartitionByRange(3, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate", "o_orderkey")
      .write.mode("append").parquet(out)
    val appended = Sinks.dataFiles(s, out).filterNot(before).map(f => s"$out/$f")
    // the incremental scan: ONLY the appended files are read
    s.read.parquet(man1)
      .unionByName(stats(s.read.parquet(appended: _*)))
      .write.parquet(man2)
    (out, man2)
  }

  /** sink16's full WAP lifecycle (factored so SinksSpec can replay
    * it and inspect the table): base → v1; stage POISONED batch `a`
    * (NULL custkeys) → audit rejects, nothing published (and NOT
    * aborted — the rejected stage is left pending so SinksSpec can
    * pin vacuum's pending-stage protection); stage good batch `b`
    * from the published head → audit passes → publish v2 (which
    * consumes staging-b). Returns (table dir, b's staged file set as
    * captured before the publish consumed it). */
  private[graft] def wapRun(s: org.apache.spark.sql.SparkSession,
      d: String): (String, Seq[String]) = {
    val out = scratch("wap")
    Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(out)
    Sinks.writeManifest(s, out, 1, Sinks.dataFiles(s, out))
    // Batch key shifts must clear EVERY scale fixture's key space: the
    // sf-N fixtures shift orders keys by copy*10M (up to ~1e10 at
    // sf100), and a +300M shift is itself 30 copies' worth — at >=31
    // copies the "good" batch landed exactly on copy i+30's keys and
    // the audit (correctly) refused the duplicate o_orderkeys. Caught
    // by the sf10 sweep; 2e11/3e11 are above any fixture's max key.
    val poisoned = Tables(s, d, "orders")
      .where("o_orderkey % 101 = 0")
      .selectExpr("o_orderkey + 200000000000 as o_orderkey",
        "cast(null as bigint) as o_custkey", "o_totalprice")
    val good = Tables(s, d, "orders")
      .where("o_orderkey % 89 = 0")
      .selectExpr("o_orderkey + 300000000000 as o_orderkey", "o_custkey",
        "o_totalprice")
    require(!stageAndAudit(s, out, "a", poisoned),
      "poisoned batch passed the WAP audit - the gate has no teeth")
    require(Sinks.manifestVersions(s, out) == Seq(1),
      "a rejected stage must not advance the published history")
    require(stageAndAudit(s, out, "b", good),
      "good batch failed the WAP audit")
    val stagedB = Sinks.readStaged(s, out, "b")
    Sinks.publishStaged(s, out, "b", 2)
    (out, stagedB)
  }

  /** Stage `batch` on top of the latest PUBLISHED version under
    * `tag`, then audit the staged snapshot: no NULL o_custkey, no
    * duplicate o_orderkey. Returns the audit verdict; publishes
    * nothing either way. */
  private def stageAndAudit(s: org.apache.spark.sql.SparkSession,
      out: String, tag: String,
      batch: org.apache.spark.sql.DataFrame): Boolean = {
    val head = Sinks.manifestVersions(s, out).max
    val published = Sinks.readManifest(s, out, head)
    val before = Sinks.dataFiles(s, out).toSet
    batch.write.mode("append").parquet(out)
    val appended = Sinks.dataFiles(s, out).filterNot(before)
    Sinks.writeStaged(s, out, tag, published ++ appended)
    val staged = Sinks.readAtStaged(s, out, tag)
    val nulls = staged.where("o_custkey is null").count()
    val dups = staged.groupBy("o_orderkey").count().where("count > 1").count()
    nulls == 0 && dups == 0
  }
}
