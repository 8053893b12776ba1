package graft.sinks

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink tier — the reference's output surface re-expressed on Spark:
  *
  *   - zstd Parquet with the versioned + "latest" double-write and the
  *     idempotent existence skip
  *     (`/root/reference/src/dwca_parquet/libs/parquet.py:24-51`),
  *   - GeoParquet `geo` footer metadata (`csw.py:65`, `geoapi.py:58-62`;
  *     SURVEY §7.3 — Spark's writer has no per-write footer API, so the
  *     footer is patched post-write by rewriting the file with
  *     parquet-hadoop's `appendFile`, which copies row groups as raw
  *     bytes — no decode/re-encode),
  *   - a JSON **array** file (`COPY … (FORMAT json, ARRAY true)`,
  *     `geoapi.py:73-75`) — one `[…]` array, not NDJSON.
  *
  * Paths go through the Hadoop FileSystem API, so the same code drives
  * `file://` in tests and `s3a://` (with `fs.s3a.*` credentials — the
  * reference's SECRET, `settings.py:65-80`) on a cluster.
  *
  * Scale note: the parity tier mirrors the reference's single-object
  * output via `coalesce(1)` — correct for per-archive DwC-A outputs
  * (one archive ≪ executor memory). The 100 TB tier calls the same
  * sinks with `singleFile = false`, keeping the parallel multi-part
  * write; the GeoParquet patch then rewrites each part.
  */
object Sinks {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Versioned + latest Parquet double-write with existence skip
    * (`parquet.py:33-51`). Returns true if the conversion ran, false
    * if the versioned object already existed (idempotent skip). */
  def writeVersioned(spark: SparkSession, df: => DataFrame, baseDir: String,
      resourceId: String, versionId: String, singleFile: Boolean = true): Boolean = {
    val versioned = new Path(s"$baseDir/$resourceId/v$versionId.parquet")
    val latest = new Path(s"$baseDir/$resourceId.parquet")
    val hfs = fs(spark, versioned)
    if (hfs.exists(versioned)) false
    else {
      val out = if (singleFile) df.coalesce(1) else df
      // execute the conversion ONCE, then byte-copy the written
      // objects to the latest alias. The reference executes its query
      // twice (parquet.py:48-51); at 100 TB a second execution doubles
      // the whole conversion, while the copy is pure filesystem I/O —
      // no decode, no shuffle, no recompute. (FileUtil.copy streams
      // through the client; an object-store deployment would swap in
      // the store's server-side copy for the alias step.)
      writeZstd(out, versioned.toString)
      if (hfs.exists(latest)) hfs.delete(latest, true)
      org.apache.hadoop.fs.FileUtil.copy(hfs, versioned, hfs, latest,
        false, true, spark.sparkContext.hadoopConfiguration)
      true
    }
  }

  def writeZstd(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(path)

  /** [[writeZstd]] + read-back of the written files. The read is given
    * the WRITER's schema — for data this frame just wrote, schema
    * re-inference (a file listing plus a footer-read job per
    * invocation, ~60 ms driver-side) can only rediscover what the
    * writer already knows. Simple-typed frames round-trip their
    * schema exactly (SinksSpec pins it); the scan itself still reads
    * whatever is on disk. */
  def writeZstdAndRead(df: DataFrame, path: String): DataFrame = {
    writeZstd(df, path)
    df.sparkSession.read.schema(df.schema).parquet(path)
  }

  // ── manifest-based snapshot isolation on plain parquet (the
  // Delta/Iceberg core contract, minimally; sink12): commits only
  // APPEND data files — copy-on-write, nothing deleted or rewritten
  // in place — and `_manifests/v<N>.txt` pins the file set LIVE at
  // version N (one root-relative path per line, sorted). A reader of
  // version N loads exactly that manifest's files, so later commits
  // cannot disturb it and every historical version stays exactly
  // readable until an explicit vacuum. The manifest is O(live files)
  // of driver-side text — the same scale contract as a Delta log
  // entry. The recursive listing below is the plain-parquet
  // bootstrap; a 100 TB writer records its own written-file set at
  // commit instead of re-listing (sink12's upsert does exactly that
  // via a before/after set difference of the affected partitions). ──

  /** Root-relative paths of all parquet data files under `dir`,
    * sorted. Any path with a `_`-prefixed segment is a SIDECAR, not
    * data — `_manifests/` (commit log), `_deletes/` (positional-delete
    * vectors, sink15) — and is excluded, so vacuum never computes a
    * delete-vector file as "dead data" (deleting a DV would silently
    * resurrect its deleted rows). This is the same convention Spark's
    * own readers use to skip `_SUCCESS`/`_metadata`. */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val hfs = fs(spark, root)
    if (!hfs.exists(root)) return Nil // a table before its first commit
    val it = hfs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val rootUri = root.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (st.isFile && rel.endsWith(".parquet") &&
          !rel.split('/').exists(_.startsWith("_")))
        out += rel
    }
    out.sorted.toSeq
  }

  /** Commit version `v`: write `_manifests/v<v>.txt` naming `files`
    * (root-relative) as the version's live set. */
  def writeManifest(spark: SparkSession, dir: String, v: Int,
      files: Seq[String]): Unit = {
    val p = new Path(dir, s"_manifests/v$v.txt")
    val hfs = fs(spark, p)
    val w = new BufferedWriter(new OutputStreamWriter(
      hfs.create(p, true), StandardCharsets.UTF_8))
    try files.sorted.foreach { f => w.write(f); w.newLine() }
    finally w.close()
  }

  /** Commit version `v` WITH its table schema recorded alongside the
    * file list (`_manifests/v<v>.schema.json`, StructType JSON) —
    * the Delta-style schema-in-the-log: SCHEMA EVOLUTION needs the
    * reader to know the version's logical schema without opening
    * data files, because after a column is added the live set mixes
    * old-schema and new-schema files. [[readAtVersion]] applies the
    * recorded schema, so (a) old files' missing columns null-fill —
    * the add-column contract — and (b) the read never does a
    * mergeSchema footer sweep, which at 100 TB means touching every
    * file's metadata before the first byte of data. */
  def writeManifestWithSchema(spark: SparkSession, dir: String, v: Int,
      files: Seq[String], schema: org.apache.spark.sql.types.StructType): Unit = {
    writeManifest(spark, dir, v, files)
    val p = new Path(dir, s"_manifests/v$v.schema.json")
    val w = new BufferedWriter(new OutputStreamWriter(
      fs(spark, p).create(p, true), StandardCharsets.UTF_8))
    try w.write(schema.json)
    finally w.close()
  }

  /** The schema recorded for version `v`, if the commit wrote one. */
  def manifestSchema(spark: SparkSession, dir: String,
      v: Int): Option[org.apache.spark.sql.types.StructType] = {
    val p = new Path(dir, s"_manifests/v$v.schema.json")
    val hfs = fs(spark, p)
    if (!hfs.exists(p)) None
    else {
      val r = new BufferedReader(new InputStreamReader(
        hfs.open(p), StandardCharsets.UTF_8))
      val json = try Iterator.continually(r.readLine())
        .takeWhile(_ != null).mkString("\n")
      finally r.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** Committed manifest versions under `dir`, ascending (empty when
    * the table has no `_manifests` yet). */
  def manifestVersions(spark: SparkSession, dir: String): Seq[Int] = {
    val mDir = new Path(dir, "_manifests")
    val hfs = fs(spark, mDir)
    if (!hfs.exists(mDir)) Nil
    else hfs.listStatus(mDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted.toSeq
  }

  /** The live file set committed for version `v`. */
  def readManifest(spark: SparkSession, dir: String, v: Int): Seq[String] = {
    val p = new Path(dir, s"_manifests/v$v.txt")
    val r = new BufferedReader(new InputStreamReader(
      fs(spark, p).open(p), StandardCharsets.UTF_8))
    try Iterator.continually(r.readLine()).takeWhile(_ != null).toVector
    finally r.close()
  }

  /** Time-travel read: exactly version `v`'s files, with hive
    * partition columns recovered via `basePath`. When the commit
    * recorded a schema ([[writeManifestWithSchema]]) the read is
    * pinned to it: old-schema files null-fill added columns (schema
    * evolution) and no footer sweep happens — each version reads
    * with ITS OWN schema, so a column added in v2 is invisible when
    * time-traveling to v1 even though v1's files are also in v2. */
  def readAtVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val files = readManifest(spark, dir, v).map(f => s"$dir/$f")
    val rd = spark.read.option("basePath", dir)
    manifestSchema(spark, dir, v) match {
      case Some(sch) => rd.schema(sch).parquet(files: _*)
      case None => rd.parquet(files: _*)
    }
  }

  /** Change feed between two committed versions (the Delta CDF idea
    * on the manifest table): rows in `to`-only files minus rows in
    * `from`-only files are the net adds, the reverse the net removes
    * — copy-on-write copies of UNchanged rows appear in both reads
    * and cancel. The crucial scale property: only the CHANGED files
    * are ever read — an incremental consumer of a 100 TB table pays
    * for the delta, not the table. Row-level cancellation is an
    * exceptAll (hash-keyed on the full row, partial-agg'd); at any
    * scale its input is bounded by the changed-file bytes. */
  def changeFeed(spark: SparkSession, dir: String, from: Int, to: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val mFrom = readManifest(spark, dir, from).toSet
    val mTo = readManifest(spark, dir, to).toSet
    def read(files: Set[String]): DataFrame = {
      val paths = files.toSeq.sorted.map(f => s"$dir/$f")
      if (paths.isEmpty) spark.read.option("basePath", dir)
        .parquet(s"$dir/${readManifest(spark, dir, to).head}").limit(0)
      else spark.read.option("basePath", dir).parquet(paths: _*)
    }
    val old = read(mFrom -- mTo)
    val neu = read(mTo -- mFrom)
    neu.exceptAll(old).withColumn("action", lit("add"))
      .unionByName(old.exceptAll(neu).withColumn("action", lit("remove")))
  }

  /** Retention GC over the manifest table (the Delta VACUUM idea):
    * retain the newest `keep` committed versions, physically delete
    * every data file referenced by NO retained manifest AND no
    * pending stage, and drop the expired manifest files themselves.
    * Returns the deleted data-file paths (root-relative, sorted —
    * the reclaim report).
    *
    * Ordering is the crash-safety contract: expired MANIFESTS are
    * deleted FIRST, then the orphaned data files — at every
    * intermediate state, any manifest [[manifestVersions]] can still
    * see names only files that still exist. (A reader already inside
    * an expired version can still lose its files mid-read — the same
    * retention-horizon caveat Delta's VACUUM documents; the horizon
    * is the caller's promise, not something GC can check.)
    *
    * Pending WAP stages are PROTECTED: every `staging-<tag>.txt` file
    * set is unioned into the live set, so a vacuum racing an audit
    * cannot delete a staged snapshot's files out from under its
    * [[publishStaged]]. A REJECTED stage must be released explicitly
    * with [[abortStaged]] before its orphans become reclaimable —
    * without the abort, a stage pins its files forever, which is the
    * safe failure mode (Delta gets the same property from its file-age
    * retention window).
    *
    * Scale shape: pure FileSystem-metadata work — one recursive
    * listing plus driver-side set difference bounded by the manifest
    * sizes (manifests name FILES, not rows; a 100 TB table is a few
    * thousand manifest lines) — no executor job, no data read. */
  def vacuum(spark: SparkSession, dir: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"vacuum must retain at least one version, got $keep")
    vacuumCore(spark, dir, _.takeRight(keep))
  }

  /** Shared GC body for both vacuum surfaces: one ordering (expired
    * manifests first, then dead data files), one staging policy
    * (pending `staging-*.txt` sets are live; staging manifests are
    * never vacuum's to delete — [[publishStaged]] consumes them,
    * [[abortStaged]] releases them).
    *
    * `choose` picks the retained versions FROM THE SNAPSHOT — the
    * version listing is taken exactly once and both the retained set
    * and the deletion list derive from it, so a version committed
    * while GC runs can never be "not retained yet listed for
    * deletion" (the double-listing race: keep-based retention
    * computed on listing #1, expiry on listing #2, the new version
    * only in #2). A version committed AFTER the snapshot is invisible
    * to this GC entirely — its manifest survives; its data files are
    * covered by the retention-horizon caveat documented on
    * [[vacuum]], same as Delta's VACUUM. */
  private def vacuumCore(spark: SparkSession, dir: String,
      choose: Seq[Int] => Seq[Int]): Seq[String] = {
    val versions = manifestVersions(spark, dir) // the ONE listing
    val retain = choose(versions)
    val retained = retain.toSet
    val pending = stagingTags(spark, dir)
      .flatMap(readStaged(spark, dir, _)).toSet
    val live = retain.flatMap(readManifest(spark, dir, _)).toSet ++ pending
    val hfs = fs(spark, new Path(dir))
    versions.filterNot(retained).foreach { v =>
      hfs.delete(new Path(dir, s"_manifests/v$v.txt"), false)
      // the version's recorded schema (sink27) expires with it —
      // delete(_, false) on a missing path is a no-op for pre-schema
      // commits
      hfs.delete(new Path(dir, s"_manifests/v$v.schema.json"), false)
    }
    val dead = dataFiles(spark, dir).filterNot(live)
    dead.foreach(f => hfs.delete(new Path(dir, f), false))
    dead
  }

  // ── write-audit-publish (WAP; sink16): a candidate snapshot is
  // STAGED as `_manifests/staging-<tag>.txt` — a name
  // [[manifestVersions]] cannot see, so readers of the published
  // table are unaffected — audited in place, and only then promoted
  // to the next version by one manifest PUT. A rejected stage leaves
  // the published history byte-untouched; [[abortStaged]] releases
  // it and its orphaned data files fall to [[vacuum]]. While a stage
  // is PENDING (written, neither published nor aborted) its file set
  // counts as live — vacuum cannot race the audit into data loss. ──

  /** Stage a candidate snapshot's file set under `tag` (not a
    * readable version until [[publishStaged]]). */
  def writeStaged(spark: SparkSession, dir: String, tag: String,
      files: Seq[String]): Unit = {
    val p = new Path(dir, s"_manifests/staging-$tag.txt")
    val hfs = fs(spark, p)
    val w = new BufferedWriter(new OutputStreamWriter(
      hfs.create(p, true), StandardCharsets.UTF_8))
    try files.sorted.foreach { f => w.write(f); w.newLine() }
    finally w.close()
  }

  /** The staged file set recorded under `tag`. */
  def readStaged(spark: SparkSession, dir: String, tag: String): Seq[String] = {
    val p = new Path(dir, s"_manifests/staging-$tag.txt")
    val r = new BufferedReader(new InputStreamReader(
      fs(spark, p).open(p), StandardCharsets.UTF_8))
    try Iterator.continually(r.readLine()).takeWhile(_ != null).toVector
    finally r.close()
  }

  /** Audit-time read of a staged snapshot: exactly the staged files. */
  def readAtStaged(spark: SparkSession, dir: String, tag: String): DataFrame = {
    val files = readStaged(spark, dir, tag).map(f => s"$dir/$f")
    spark.read.option("basePath", dir).parquet(files: _*)
  }

  /** Tags of all PENDING stages under `dir` (staging manifests that
    * have been neither published nor aborted), sorted. */
  def stagingTags(spark: SparkSession, dir: String): Seq[String] = {
    val mDir = new Path(dir, "_manifests")
    val hfs = fs(spark, mDir)
    if (!hfs.exists(mDir)) Nil
    else hfs.listStatus(mDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("staging-") && n.endsWith(".txt") =>
        n.stripPrefix("staging-").stripSuffix(".txt") }
      .sorted.toSeq
  }

  /** Promote the staged snapshot `tag` to version `v`: one manifest
    * PUT (the data files were already written at stage time), then
    * the consumed staging manifest is dropped. A crash between the
    * two leaves a dangling staging manifest whose file set is a
    * subset of v's — harmless (vacuum keeps the files live either
    * way); the operator clears it with [[abortStaged]]. */
  def publishStaged(spark: SparkSession, dir: String, tag: String,
      v: Int): Unit = {
    writeManifest(spark, dir, v, readStaged(spark, dir, tag))
    abortStaged(spark, dir, tag)
  }

  /** Release a rejected (or crashed-publish leftover) stage: drop its
    * staging manifest so the stage no longer pins its file set; the
    * now-orphaned data files fall to the next [[vacuum]]. Idempotent
    * — aborting an unknown tag is a no-op. */
  def abortStaged(spark: SparkSession, dir: String, tag: String): Unit = {
    val p = new Path(dir, s"_manifests/staging-$tag.txt")
    val hfs = fs(spark, p)
    if (hfs.exists(p)) hfs.delete(p, false)
  }

  /** Garbage-collect by explicit retained-version list (the vacuum
    * that makes copy-on-write sustainable); delegates to the same
    * body as the retention-count overload — identical
    * manifests-first crash ordering and pending-stage protection.
    * Returns the deleted-file count. Driver-side O(files) metadata
    * work, no data read. */
  def vacuum(spark: SparkSession, dir: String, retain: Seq[Int]): Int =
    vacuumCore(spark, dir, _ => retain).size

  // ── positional deletes (merge-on-read; sink15): the Iceberg
  // positional-delete / Delta deletion-vector contract — row-level
  // DELETE against an immutable parquet table without rewriting any
  // data file. The delete records (file_path, row_index) pairs in a
  // hidden `_deletes/` sidecar — O(deleted rows), never O(table) —
  // and readers subtract them with an anti-join on the position key.
  // `_metadata.row_index` is the row's physical ordinal within its
  // file: stable across reads, filters, and schedulers, which is
  // what makes the position a durable address. ──

  /** Record the rows matching `predicate` as a positional delete
    * sidecar under `dir/_deletes` (append — deletes accumulate across
    * commits). The scan is one predicate-filtered pass; at scale,
    * file skipping limits it to files whose stats overlap the
    * predicate. Returns the number of newly recorded positions. */
  def positionalDelete(spark: SparkSession, dir: String, predicate: String): Long = {
    val dv = spark.read.parquet(dir)
      .selectExpr("_metadata.file_path as file_path",
        "_metadata.row_index as row_index", s"($predicate) as del")
      .where("del").select("file_path", "row_index")
    dv.write.mode(SaveMode.Append).parquet(s"$dir/_deletes/dv")
    spark.read.parquet(s"$dir/_deletes/dv").count()
  }

  /** Merge-on-read: the table minus its recorded positional deletes.
    * The sidecar is broadcast (deleted positions are a vanishing
    * fraction of a healthy table); a deployment whose DVs outgrow a
    * broadcast shards them by file_path — the join key already leads
    * with it, so the plan degrades to a co-partitioned equi-join,
    * never a rewrite. A `_deletes`-less table reads as-is. */
  def readWithDeletes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val base = spark.read.parquet(dir)
      .selectExpr("*", "_metadata.file_path as __f", "_metadata.row_index as __i")
    val dvPath = new Path(dir, "_deletes/dv")
    val out =
      if (fs(spark, dvPath).exists(dvPath)) {
        val dv = spark.read.parquet(dvPath.toString)
          .select(col("file_path").as("__f"), col("row_index").as("__i"))
        base.join(broadcast(dv), Seq("__f", "__i"), "left_anti")
      } else base
    out.drop("__f", "__i")
  }

  /** Small-file compaction: rewrite `inDir`'s parquet parts as
    * ~`targetBytes`-sized files (part count = ceil(observed bytes /
    * target), from a driver-side listing — O(files) statuses, no data
    * read). Shuffle-FREE by design: `coalesce` merges whole input
    * splits map-side, so compaction costs one read + one write and no
    * exchange — a `repartition` would shuffle the full table for
    * marginally more even output files, doubling network cost at
    * 100 TB. Compacted output inherits the input's row order only
    * within each merged group; callers that also want a skipping
    * layout should compose with the sink05 range-sorted write
    * instead. Returns the target part count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val in = new Path(inDir)
    val bytes = fs(spark, in).listStatus(in)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    writeZstd(spark.read.parquet(inDir).coalesce(parts), outDir)
    parts
  }

  /** GeoParquet 1.0.0 `geo` footer for a WKB geometry column.
    * `"crs": null` is EXPLICIT — null means OGC:CRS84 per spec (the
    * reference's output CRS), and consumers (OGR, geopandas)
    * increasingly warn when the key is absent rather than null.
    * `geometry_types` is populated from the written data via
    * [[geomTypes]]; optional per-column bbox [xmin, ymin, xmax, ymax]. */
  def geoMetadataJson(geomColumn: String, bbox: Option[Seq[Double]] = None,
      geometryTypes: Seq[String] = Nil, covering: Option[String] = None): String = {
    val bboxJson = bbox.map(b => s""","bbox":[${b.mkString(",")}]""").getOrElse("")
    val types = geometryTypes.map(t => s""""$t"""").mkString(",")
    // GeoParquet 1.1 `covering`: declares the per-row bbox struct
    // column ([[withBboxColumn]]) so readers prune ROW GROUPS from
    // the struct fields' parquet min/max stats — the read-side
    // complement of the per-part footer bbox. 1.0.0 footers stay the
    // default (covering is the only 1.1 feature emitted; consumers
    // that only speak 1.0 keep working on default output).
    val cov = covering.map(c =>
      s""","covering":{"bbox":{"xmin":["$c","xmin"],"ymin":["$c","ymin"],"xmax":["$c","xmax"],"ymax":["$c","ymax"]}}""").getOrElse("")
    val version = if (covering.isDefined) "1.1.0" else "1.0.0"
    s"""{"version":"$version","primary_column":"$geomColumn","columns":{"$geomColumn":{"encoding":"WKB","geometry_types":[$types],"crs":null$bboxJson$cov}}}"""
  }

  /** GeoParquet 1.1 per-row bbox struct for a WKB geometry column —
    * one `st_envelope` per row, projected map-side into the
    * (xmin, ymin, xmax, ymax) struct the `covering` footer declares.
    * DOUBLE fields: exact, so no float-rounding direction rules
    * apply; null geometry → null struct (spec-legal, and the row
    * then never survives a bbox predicate). Written alongside the
    * data, the struct's parquet column stats give any 1.1 reader
    * row-group-level spatial pruning with zero extra passes. */
  def withBboxColumn(spark: SparkSession, df: DataFrame, geomColumn: String,
      bboxColumn: String = "bbox"): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    df.withColumn("__env", org.apache.spark.sql.functions.expr(
        s"st_envelope($geomColumn)"))
      .withColumn(bboxColumn, org.apache.spark.sql.functions.expr(
        """case when __env is null then null else
             named_struct('xmin', __env[0], 'ymin', __env[1],
                          'xmax', __env[2], 'ymax', __env[3]) end"""))
      .drop("__env")
  }

  /** Distinct geometry type names of a WKB column — one partial-agg'd
    * distinct over the 5-byte WKB header (endianness byte + uint32
    * type code), so the scan reads only the column's first bytes and
    * the driver receives at most the handful of distinct codes. */
  def geomTypes(spark: SparkSession, df: DataFrame, geomColumn: String): Seq[String] = {
    val th = s"hex(substring($geomColumn, 2, 4))" // 4 type bytes as 8 hex chars
    val codes = df.where(s"$geomColumn is not null")
      .selectExpr(
        s"""cast(conv(case when hex(substring($geomColumn, 1, 1)) = '01'
             then concat(substr($th, 7, 2), substr($th, 5, 2),
                         substr($th, 3, 2), substr($th, 1, 2))
             else $th end, 16, 10) as bigint) as code""")
      .distinct().collect().map(_.getLong(0))
    codes.sorted.map(wkbTypeName)
  }

  private def wkbTypeName(code: Long): String = {
    val base = code % 1000 match {
      case 1 => "Point"
      case 2 => "LineString"
      case 3 => "Polygon"
      case 4 => "MultiPoint"
      case 5 => "MultiLineString"
      case 6 => "MultiPolygon"
      case 7 => "GeometryCollection"
      case other => s"Unknown($other)"
    }
    // ISO WKB dimension ranges: 1000s = Z, 2000s = M, 3000s = ZM
    code / 1000 match {
      case 1 => base + " Z"
      case 2 => base + " M"
      case 3 => base + " ZM"
      case _ => base
    }
  }

  /** Dataset-level bbox of a WKB geometry column — distributed min/max
    * over st_envelope, one partial-aggregated pass. */
  def geomBbox(spark: SparkSession, df: DataFrame, geomColumn: String): Option[Seq[Double]] = {
    graft.functions.GeoFunctions.register(spark)
    val r = df.selectExpr(s"st_envelope($geomColumn) as e")
      .where("e is not null")
      .selectExpr("min(e[0]) as xmin", "min(e[1]) as ymin",
        "max(e[2]) as xmax", "max(e[3]) as ymax")
      .head()
    if (r.isNullAt(0)) None
    else Some(Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }

  /** Per-part-file bboxes of a written parquet dir's WKB column — ONE
    * distributed envelope pass grouped by `input_file_name()`; the
    * driver receives one row per part file (bounded by file count,
    * never row count). Keys are part file NAMES, so the map is valid
    * for any byte-copied alias of the same write. */
  def geomBboxByPart(spark: SparkSession, dir: String,
      geomColumn: String): Map[String, Seq[Double]] = {
    graft.functions.GeoFunctions.register(spark)
    spark.read.parquet(dir)
      .selectExpr("input_file_name() as f", s"st_envelope($geomColumn) as e")
      .where("e is not null")
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.expr("min(e[0])").as("xmin"),
        org.apache.spark.sql.functions.expr("min(e[1])").as("ymin"),
        org.apache.spark.sql.functions.expr("max(e[2])").as("xmax"),
        org.apache.spark.sql.functions.expr("max(e[3])").as("ymax"))
      .collect()
      .map { r =>
        val name = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
        name -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      }.toMap
  }

  /** Add the `geo` key to every part file's footer under `dir`
    * (post-write patch: row groups are byte-copied via `appendFile`,
    * only the footer is rewritten). `geometryTypes` defaults to one
    * distributed distinct pass over the written column ([[geomTypes]]);
    * callers patching multiple aliases of the same data compute it
    * once and pass it through.
    *
    * Each part is stamped with ITS OWN bbox (computed by
    * [[geomBboxByPart]] unless a precomputed `partBboxes` map is
    * passed) — a single dataset-global bbox on every part is legal
    * GeoParquet but defeats part-wise spatial pruning: a consumer
    * listing parts would have to read all of them for any window that
    * intersects the global extent. Passing `bbox` overrides with a
    * uniform global stamp (parity/testing escape hatch). Parts with no
    * non-null geometries carry no bbox key. */
  def patchGeoFooter(spark: SparkSession, dir: String, geomColumn: String,
      bbox: Option[Seq[Double]] = None,
      geometryTypes: Option[Seq[String]] = None,
      partBboxes: Option[Map[String, Seq[Double]]] = None,
      covering: Option[String] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val hfs = fs(spark, d)
    val types = geometryTypes.getOrElse(
      geomTypes(spark, spark.read.parquet(dir), geomColumn))
    val perPart: Map[String, Seq[Double]] =
      if (bbox.isDefined) Map.empty
      else partBboxes.getOrElse(geomBboxByPart(spark, dir, geomColumn))
    val parts = hfs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
    parts.foreach(p =>
      patchOneFooter(conf, p, geomColumn, bbox.orElse(perPart.get(p.getName)),
        types, covering))
  }

  private def patchOneFooter(conf: Configuration, file: Path, geomColumn: String,
      bbox: Option[Seq[Double]], geometryTypes: Seq[String],
      covering: Option[String] = None): Unit = {
    val in = HadoopInputFile.fromPath(file, conf)
    val reader = ParquetFileReader.open(in)
    val fileMeta =
      try reader.getFooter.getFileMetaData
      finally reader.close()
    val extra = new java.util.HashMap[String, String](fileMeta.getKeyValueMetaData)
    extra.put("geo", geoMetadataJson(geomColumn, bbox, geometryTypes, covering))

    val tmp = new Path(file.getParent, file.getName + ".geo.tmp")
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmp, conf), fileMeta.getSchema,
      ParquetFileWriter.Mode.OVERWRITE, 128L * 1024 * 1024, 8 * 1024 * 1024)
    writer.start()
    writer.appendFile(in)
    writer.end(extra)

    val hfs = file.getFileSystem(conf)
    hfs.delete(file, false)
    hfs.rename(tmp, file)
  }

  /** Read back a footer key-value entry (verification surface). */
  def readFooterKey(spark: SparkSession, dir: String, key: String): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val hfs = fs(spark, d)
    hfs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .toSeq.sortBy(_.getName)
      .map { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try p.getName -> r.getFooter.getFileMetaData.getKeyValueMetaData.get(key)
        finally r.close()
      }
  }

  /** Single JSON array file (`ARRAY true` semantics). The rows stream
    * through a coalesced executor write, then the driver streams the
    * NDJSON part into `[...]` — line-by-line, never materializing the
    * relation in memory. Array-file output is inherently
    * single-object; callers needing 100 TB output use NDJSON parquet
    * instead. */
  def writeJsonArray(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val target = new Path(path)
    val hfs = fs(spark, target)
    val staging = new Path(path + ".staging")
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(staging.toString)
    val part = hfs.listStatus(staging).map(_.getPath)
      .find(_.getName.startsWith("part-")).getOrElse(
        throw new IllegalStateException(s"no part file under $staging"))
    val reader = new BufferedReader(new InputStreamReader(hfs.open(part), StandardCharsets.UTF_8))
    val writer = new BufferedWriter(new OutputStreamWriter(hfs.create(target, true), StandardCharsets.UTF_8))
    try {
      writer.write("[")
      var line = reader.readLine()
      var first = true
      while (line != null) {
        if (line.nonEmpty) {
          if (!first) writer.write(",")
          writer.write("\n")
          writer.write(line)
          first = false
        }
        line = reader.readLine()
      }
      writer.write("\n]\n")
    } finally {
      reader.close(); writer.close()
    }
    hfs.delete(staging, true)
  }
}
