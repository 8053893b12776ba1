package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft-sinkspec-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("sink12 time travel: v2 equals sink11's merge, v1 survives it, manifests differ only on affected partitions") {
    val d = "/root/testdata/sf0.001"
    val out = tmp("timetravel") + "/t"
    SinkQueries.writeBasePartitioned(spark, d, out)
    graft.sinks.Sinks.writeManifest(spark, out, 1,
      graft.sinks.Sinks.dataFiles(spark, out))
    val baseRows = graft.sinks.Sinks.readAtVersion(spark, out, 1)
      .collect().map(_.toString).sorted
    SinkQueries.upsertCow(spark, d, out)
    // v1 read AFTER the v2 commit is byte-for-byte the pre-merge base
    val v1After = graft.sinks.Sinks.readAtVersion(spark, out, 1)
      .collect().map(_.toString).sorted
    assert(v1After === baseRows)
    // v2 equals sink11's in-place merge semantics on a separate copy
    val ref = tmp("timetravel-ref") + "/t"
    SinkQueries.writeBasePartitioned(spark, d, ref)
    SinkQueries.mergeInto(spark, d, ref)
    val expected = spark.read.parquet(ref).collect().map(_.toString).sorted
    val v2 = graft.sinks.Sinks.readAtVersion(spark, out, 2)
      .collect().map(_.toString).sorted
    assert(v2 === expected)
    // manifests: shared files are exactly the untouched partitions';
    // every affected-partition file in v2 is new (copy-on-write)
    val m1 = graft.sinks.Sinks.readManifest(spark, out, 1).toSet
    val m2 = graft.sinks.Sinks.readManifest(spark, out, 2).toSet
    val affected = spark.read.parquet(ref).selectExpr("yr")
      .where("yr >= 1996").distinct().collect().map(_.getInt(0)).toSet
    val (m2Aff, m2Keep) = m2.partition(f => affected.exists(y => f.startsWith(s"yr=$y/")))
    assert(m2Keep === m1.filterNot(f => affected.exists(y => f.startsWith(s"yr=$y/"))))
    assert(m2Aff.nonEmpty && m2Aff.intersect(m1).isEmpty,
      "copy-on-write must append fresh files for affected partitions")
    // and nothing was deleted: v1's full file set is still on disk
    assert(m1.subsetOf(graft.sinks.Sinks.dataFiles(spark, out).toSet))
  }

  test("sink12 vacuum: drops exactly the unreferenced files, retained version intact") {
    val d = "/root/testdata/sf0.001"
    val out = tmp("vacuum") + "/t"
    SinkQueries.writeBasePartitioned(spark, d, out)
    graft.sinks.Sinks.writeManifest(spark, out, 1,
      graft.sinks.Sinks.dataFiles(spark, out))
    SinkQueries.upsertCow(spark, d, out)
    val v2Before = graft.sinks.Sinks.readAtVersion(spark, out, 2)
      .collect().map(_.toString).sorted
    val m1 = graft.sinks.Sinks.readManifest(spark, out, 1).toSet
    val m2 = graft.sinks.Sinks.readManifest(spark, out, 2).toSet
    val deleted = graft.sinks.Sinks.vacuum(spark, out, Seq(2))
    assert(deleted === (m1 -- m2).size, "vacuum must drop exactly v1-only files")
    assert(graft.sinks.Sinks.dataFiles(spark, out).toSet === m2)
    // the retained version is bit-identical after the vacuum
    assert(graft.sinks.Sinks.readAtVersion(spark, out, 2)
      .collect().map(_.toString).sorted === v2Before)
    // the dropped version's manifest is gone: history is explicitly vacuumed
    assertThrows[Exception](graft.sinks.Sinks.readManifest(spark, out, 1))
  }

  test("sink13 change feed: adds are the changelog, removes the updated keys' old rows, copies cancel") {
    val d = "/root/testdata/sf0.001"
    val out = tmp("cdf") + "/t"
    SinkQueries.writeBasePartitioned(spark, d, out)
    graft.sinks.Sinks.writeManifest(spark, out, 1,
      graft.sinks.Sinks.dataFiles(spark, out))
    val base = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice"), r.getAs[Int]("yr")))
    SinkQueries.upsertCow(spark, d, out)
    val feed = graft.sinks.Sinks.changeFeed(spark, out, 1, 2).collect()
    val adds = feed.filter(_.getAs[String]("action") == "add")
    val removes = feed.filter(_.getAs[String]("action") == "remove")
    val updatedKeys = base.collect { case (k, _, yr) if k % 37 == 0 && yr >= 1996 => k }.toSet
    val insertedKeys = base.collect { case (k, _, yr) if k % 97 == 0 && yr >= 1996 => k + 400000000000L }.toSet
    assert(removes.map(_.getAs[Long]("o_orderkey")).toSet === updatedKeys)
    assert(adds.map(_.getAs[Long]("o_orderkey")).toSet === updatedKeys ++ insertedKeys)
    assert(adds.length === updatedKeys.size + insertedKeys.size,
      "copy-on-write copies of unchanged rows must cancel out of the feed")
    // an updated key's add carries the +1000 price, its remove the original
    val k = updatedKeys.head
    val before = base.collect { case (`k`, p, _) => p }.head
    val after = adds.find(_.getAs[Long]("o_orderkey") == k).get
      .getAs[Double]("o_totalprice")
    assert(after - before === 1000.0)
  }

  test("writeVersioned: double-write then idempotent skip") {
    import spark.implicits._
    val base = tmp("versioned")
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(Sinks.writeVersioned(spark, df, base, "r", "1"))
    assert(Files.exists(Paths.get(base, "r", "v1.parquet")))
    assert(Files.exists(Paths.get(base, "r.parquet")))
    // second call must skip (versioned object exists)
    assert(!Sinks.writeVersioned(spark, df, base, "r", "1"))
    // a new version writes again and overwrites latest
    assert(Sinks.writeVersioned(spark, df, base, "r", "2"))
    assert(spark.read.parquet(s"$base/r.parquet").count() === 2)
  }

  test("writeZstdAndRead: the schema'd read-back equals a fresh inference exactly") {
    import spark.implicits._
    val base = tmp("schemaread")
    val df = Seq((1L, "a", Some(1.5), java.sql.Date.valueOf("2024-04-03")),
      (2L, null, None, null))
      .toDF("k", "s", "d", "dt")
    val back = Sinks.writeZstdAndRead(df, base)
    val inferred = spark.read.parquet(base)
    // the writer's schema IS the inferred schema (the helper's whole
    // premise — re-inference can only rediscover it) ...
    assert(back.schema === inferred.schema)
    // ... and the rows come off disk, not from the frame
    assert(back.orderBy("k").collect().toSeq === inferred.orderBy("k").collect().toSeq)
  }

  test("writeVersioned executes the conversion plan exactly once") {
    import spark.implicits._
    val base = tmp("once")
    val acc = spark.sparkContext.longAccumulator("evals")
    val df = spark.range(100).map { i => acc.add(1); i }.toDF("v")
    assert(Sinks.writeVersioned(spark, df, base, "r", "1"))
    // both objects exist and read back identically ...
    assert(spark.read.parquet(s"$base/r/v1.parquet").count() === 100)
    assert(spark.read.parquet(s"$base/r.parquet").count() === 100)
    // ... but every source row was evaluated once, not twice — the
    // latest alias is a byte-copy, not a re-execution
    assert(acc.value === 100L, "conversion plan was re-executed for the latest alias")
  }

  test("geoparquet footer patch preserves data and adds the geo key with the part bbox") {
    import spark.implicits._
    val out = tmp("geo") + "/t.parquet"
    val df = Seq((1L, graft.functions.Geo.pointWkb(3.5, 7.25)), (2L, null))
      .toDF("fid", "geom")
    Sinks.writeZstd(df.coalesce(1), out)
    val before = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    Sinks.patchGeoFooter(spark, out, "geom")
    // data survives the byte-copy rewrite
    val after = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(after === before)
    // footer now carries GeoParquet metadata with geometry_types and
    // the part's own bbox derived from the written WKB, explicit crs
    val geo = Sinks.readFooterKey(spark, out, "geo")
    assert(geo.nonEmpty)
    assert(geo.forall(_._2 ==
      Sinks.geoMetadataJson("geom", Some(Seq(3.5, 7.25, 3.5, 7.25)), Seq("Point"))))
    assert(geo.head._2.contains(""""geometry_types":["Point"]"""))
    assert(geo.head._2.contains(""""crs":null"""))
    assert(geo.head._2.contains(""""bbox":[3.5,7.25,3.5,7.25]"""))
  }

  test("multi-part write: each part's footer carries its OWN bbox, not the global one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = tmp("geo2") + "/t.parquet"
    // two spatially disjoint groups, range-partitioned into two parts
    val df = Seq(
      (1L, graft.functions.Geo.pointWkb(0.0, 0.0)),
      (2L, graft.functions.Geo.pointWkb(1.0, 1.0)),
      (3L, graft.functions.Geo.pointWkb(100.0, 100.0)),
      (4L, graft.functions.Geo.pointWkb(101.0, 101.0)))
      .toDF("fid", "geom")
      .repartitionByRange(2, col("fid"))
    df.write.mode("overwrite").parquet(out)
    Sinks.patchGeoFooter(spark, out, "geom")
    val geo = Sinks.readFooterKey(spark, out, "geo")
    assert(geo.size === 2, geo.map(_._1).mkString(", "))
    val bboxes = geo.map(_._2).toSet
    // a global stamp would make both parts identical and kill
    // part-wise spatial pruning for footer-reading consumers
    assert(bboxes.size === 2, bboxes.mkString("\n"))
    assert(bboxes === Set(
      Sinks.geoMetadataJson("geom", Some(Seq(0.0, 0.0, 1.0, 1.0)), Seq("Point")),
      Sinks.geoMetadataJson("geom", Some(Seq(100.0, 100.0, 101.0, 101.0)), Seq("Point"))))
  }

  test("r9 external-reader conformance: a NON-engine reader consumes the GeoParquet output") {
    // The reference's contract is that outputs are consumable by OGR
    // /vsicurl/ (csw.py:65, geoapi.py:58-62); until r8 the only check
    // read the footer back with the engine's own reader. tools/
    // geocheck.py re-reads the full conversion output with pyarrow +
    // a pure-python WKB parser and independently re-derives the
    // geometry types and per-part bbox from the data.
    assume(
      new ProcessBuilder("python3", "-c", "import pyarrow.parquet").start().waitFor() == 0,
      "python3+pyarrow unavailable")
    val out = tmp("geoconf") + "/conv.parquet"
    val df = graft.dwca.DwcaConvert.convert(
      spark, graft.dwca.DwcaQueries.fixtureZip, graft.dwca.DwcaConvert.GeomWkb)
    Sinks.writeZstd(df.coalesce(1), out)
    Sinks.patchGeoFooter(spark, out, "geom")
    val repoRoot = new java.io.File(".").getCanonicalPath
    val p = new ProcessBuilder("python3", s"$repoRoot/tools/geocheck.py", out, "geom")
      .redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() === 0, s"geocheck.py rejected the output:\n$log")
    assert(log.contains("geocheck OK"), log)

    // and the checker is not a rubber stamp: a corrupted footer fails
    val bad = tmp("geoconf-bad") + "/conv.parquet"
    Sinks.writeZstd(spark.read.parquet(out), bad)
    // no patchGeoFooter → no geo key
    val pb = new ProcessBuilder("python3", s"$repoRoot/tools/geocheck.py", bad, "geom")
      .redirectErrorStream(true).start()
    val badLog = new String(pb.getInputStream.readAllBytes())
    assert(pb.waitFor() !== 0, s"geocheck.py accepted a geo-less footer:\n$badLog")
  }

  test("GeoParquet 1.1 covering: external reader verifies per-row bbox against each WKB") {
    assume(
      new ProcessBuilder("python3", "-c", "import pyarrow.parquet").start().waitFor() == 0,
      "python3+pyarrow unavailable")
    val out = tmp("geocov") + "/conv.parquet"
    val df = graft.dwca.DwcaConvert.convert(
      spark, graft.dwca.DwcaQueries.fixtureZip, graft.dwca.DwcaConvert.GeomWkb)
    Sinks.writeZstd(Sinks.withBboxColumn(spark, df, "geom").coalesce(1), out)
    Sinks.patchGeoFooter(spark, out, "geom", covering = Some("bbox"))
    // footer byte shape pinned: 1.1.0 + the four covering paths
    Sinks.readFooterKey(spark, out, "geo").foreach { case (_, j) =>
      assert(j.contains(""""version":"1.1.0""""), j)
      assert(j.contains(
        """"covering":{"bbox":{"xmin":["bbox","xmin"],"ymin":["bbox","ymin"],"xmax":["bbox","xmax"],"ymax":["bbox","ymax"]}}"""), j)
    }
    val repoRoot = new java.io.File(".").getCanonicalPath
    val p = new ProcessBuilder("python3", s"$repoRoot/tools/geocheck.py", out, "geom")
      .redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() === 0, s"geocheck.py rejected the covering output:\n$log")

    // not a rubber stamp: a covering footer whose declared struct
    // column is absent from the schema must fail
    val bad = tmp("geocov-bad") + "/conv.parquet"
    Sinks.writeZstd(df.coalesce(1), bad) // no bbox column written
    Sinks.patchGeoFooter(spark, bad, "geom", covering = Some("bbox"))
    val pb = new ProcessBuilder("python3", s"$repoRoot/tools/geocheck.py", bad, "geom")
      .redirectErrorStream(true).start()
    val badLog = new String(pb.getInputStream.readAllBytes())
    assert(pb.waitFor() !== 0,
      s"geocheck.py accepted covering without the struct column:\n$badLog")
  }

  test("writeJsonArray emits one parseable JSON array") {
    import spark.implicits._
    val out = tmp("json") + "/a.json"
    Sinks.writeJsonArray(spark, Seq((1, "x"), (2, "y")).toDF("k", "v"), out)
    val text = new String(Files.readAllBytes(Paths.get(out)))
    assert(text.trim.startsWith("[") && text.trim.endsWith("]"))
    // Spark parses it back as a multiLine JSON array
    val back = spark.read.option("multiLine", "true").json(out)
    assert(back.count() === 2)
    assert(back.columns.sorted === Array("k", "v"))
  }

  test("sink05 layout: per-file o_orderdate ranges are disjoint and a range filter prunes files") {
    import org.apache.spark.sql.functions._
    val df = graft.sinks.SinkQueries.all("sink05_sorted_write")
      .fn(spark, "/root/testdata/sf0.001")
    val ranges = df.withColumn("f", input_file_name())
      .groupBy("f").agg(
        min(col("o_orderdate").cast("string")).as("lo"),
        max(col("o_orderdate").cast("string")).as("hi"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._2)
    assert(ranges.length >= 2, "range repartition produced a single file")
    ranges.sliding(2).foreach { case Array((_, _, hi), (f2, lo2, _)) =>
      assert(hi <= lo2, s"file ranges overlap at $f2: $hi > $lo2")
    }
    // locality: all rows of the first file's date range live in (at
    // most) that file plus a boundary neighbor — the physical
    // clustering row-group min/max skipping exploits
    val (_, lo, hi) = ranges.head
    val touched = df.where(col("o_orderdate").cast("string") >= lo
        && col("o_orderdate").cast("string") <= hi)
      .withColumn("f", input_file_name()).select("f").distinct().count()
    assert(touched <= 2 && touched < ranges.length.toLong,
      s"date range scattered across $touched files — not clustered")
  }

  test("sink07 manifest: stats cover every row; the pruned scan opens fewer files, loses nothing") {
    import org.apache.spark.sql.functions._
    val df = graft.sinks.SinkQueries.all("sink07_stats_manifest")
      .fn(spark, "/root/testdata/sf0.001")
    val man = spark.read.parquet(
      graft.sinks.SinkQueries.scratchPath("manifest"))
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    // the manifest accounts for every row exactly once
    assert(man.agg(sum("n_rows")).collect()(0).getLong(0) === orders.count())
    val nFiles = man.count()
    assert(nFiles === 4, "range write precondition")
    // the scan behind the returned relation opens strictly fewer files
    val touched = df.withColumn("f", input_file_name())
      .select("f").distinct().count()
    assert(touched < nFiles, s"pruning opened all $nFiles files")
    // and the pruned read equals the direct full-scan filter
    val direct = orders.where(
      "o_orderdate >= timestamp '1996-01-01' and o_orderdate <= timestamp '1996-12-31 23:59:59'")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    assert(df.exceptAll(direct).isEmpty && direct.exceptAll(df).isEmpty,
      "manifest pruning changed the answer")
  }

  test("sink08 z-order: per-file ranges localize BOTH dimensions — either column alone prunes") {
    import org.apache.spark.sql.functions._
    val df = graft.sinks.SinkQueries.all("sink08_zorder")
      .fn(spark, "/root/testdata/sf0.001")
    val files = df.withColumn("f", input_file_name())
      .withColumn("day", expr("unix_date(cast(o_orderdate as date))"))
      .groupBy("f").agg(
        min("o_custkey").as("clo"), max("o_custkey").as("chi"),
        min("day").as("dlo"), max("day").as("dhi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(files.length >= 4, "z-order write produced too few files to prove pruning")
    // scale-robust probes: the top/bottom decile of each dimension
    val (ckLo, ckHi) = (files.map(_._1).min, files.map(_._2).max)
    val ckProbe = ckHi - (ckHi - ckLo) / 10
    val dtProbe = files.map(_._3).min + (files.map(_._4).max - files.map(_._3).min) / 10
    // a custkey-only slice must skip at least one file on custkey stats
    val ckSurvivors = files.count { case (_, hi, _, _) => hi >= ckProbe }
    assert(ckSurvivors < files.length,
      s"custkey slice pruned nothing ($ckSurvivors of ${files.length})")
    // a date-only slice must ALSO skip at least one file on date stats
    // — the property a single-column sort (sink05) cannot give both ways
    val dSurvivors = files.count { case (_, _, lo, _) => lo <= dtProbe }
    assert(dSurvivors < files.length,
      s"date slice pruned nothing ($dSurvivors of ${files.length})")
  }

  test("sink06 compaction: part count = ceil(bytes/target), content identical, no shuffle") {
    import java.nio.file.Paths
    val frag = tmp("compact-in")
    val src = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "source", "text")
    src.repartition(64).write.mode("overwrite")
      .option("compression", "zstd").parquet(frag)
    def parquetFiles(dir: String) =
      Paths.get(dir).toFile.listFiles().filter(_.getName.endsWith(".parquet"))
    val inFiles = parquetFiles(frag)
    assert(inFiles.length === 64, "fragmented input precondition")
    val bytes = inFiles.map(_.length).sum

    // force a multi-file output: target = ~bytes/3 → exactly 3 parts
    val out3 = tmp("compact-out3")
    val target = bytes / 3 + 1
    val parts = Sinks.compact(spark, frag, out3, target)
    assert(parts === ((bytes + target - 1) / target).toInt)
    assert(parquetFiles(out3).length === parts)
    assert(parts > 1 && parts < 64, s"expected genuine compaction, got $parts")

    // content is exactly preserved (same multiset of rows)
    val back = spark.read.parquet(out3)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "compaction changed content")

    // the compaction plan must be shuffle-free: coalesce, no exchange
    val plan = spark.read.parquet(frag).coalesce(parts)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction shuffles:\n$plan")
  }

  test("sink11 merge rewrites ONLY the changelog's partitions; earlier years frozen") {
    val sf = "/root/testdata/sf0.001"
    val out = tmp("upsert-frozen") + "/base"
    SinkQueries.writeBasePartitioned(spark, sf, out)
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(Paths.get(out).toFile)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> ((f.length, f.lastModified))).toMap
    }
    val before = snapshot()
    val yearsBefore = Paths.get(out).toFile.listFiles()
      .filter(_.getName.startsWith("yr=")).map(_.getName).toSet
    assert(yearsBefore.exists(_ < "yr=1996"), "fixture lacks pre-1996 years")
    SinkQueries.mergeInto(spark, sf, out)
    val after = snapshot()
    def yearOf(p: String): Int = p.split("yr=")(1).take(4).toInt
    val frozen = before.keys.filter(yearOf(_) < 1996)
    // every pre-1996 file survives byte-for-byte (same path, size, mtime)
    frozen.foreach { p =>
      assert(after.contains(p), s"frozen partition file deleted: $p")
      assert(after(p) === before(p), s"frozen partition file rewritten: $p")
    }
    assert(frozen.nonEmpty, "no frozen file to check - vacuous")
    // and the affected years really were rewritten (new file identities)
    val touched = before.keys.filter(yearOf(_) >= 1996)
    assert(touched.nonEmpty && touched.exists(p => !after.contains(p)),
      "no 1996+ partition file was replaced - dynamic overwrite not exercised")
  }

  test("sink22 full merge: every clause fires; frozen years untouched; serial re-derivation agrees") {
    val sf = "/root/testdata/sf0.001"
    val out = tmp("merge-full") + "/base"
    SinkQueries.writeBasePartitioned(spark, sf, out)
    val baseRows = spark.read.parquet(out)
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice", "yr").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    def snapshot(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(Paths.get(out).toFile).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    }
    val before = snapshot()
    SinkQueries.mergeFull(spark, sf, out)
    val after = spark.read.parquet(out)
      .selectExpr("o_orderkey", "o_totalprice", "yr").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getInt(2)))).toMap
    // serial clause-by-clause re-derivation over the base snapshot
    val srcKeys = baseRows.collect {
      case (k, (_, _, yr)) if yr >= 1996 && (k % 41 == 0 || k % 37 == 0) => k
    }.toSet
    var nUpd, nDel, nIns, nBySrc = 0
    baseRows.foreach { case (k, (_, price, yr)) =>
      if (yr < 1996) assert(after(k)._1 === price, s"pre-1996 key $k changed")
      else if (k % 41 == 0) { assert(!after.contains(k), s"delete missed $k"); nDel += 1 }
      else if (k % 37 == 0) { assert(after(k)._1 === price + 1000, s"update missed $k"); nUpd += 1 }
      else if (k % 53 == 0 && !srcKeys.contains(k)) {
        assert(!after.contains(k), s"by-source delete missed $k"); nBySrc += 1
      } else assert(after(k)._1 === price, s"untouched key $k changed")
    }
    baseRows.foreach { case (k, (_, price, yr)) =>
      if (yr >= 1996 && k % 97 == 0) {
        assert(after.get(k + 500000000000L).exists(_._1 == price), s"insert missed $k")
        nIns += 1
      }
    }
    assert(after.size === baseRows.size - nDel - nBySrc + nIns)
    // non-vacuous: every clause actually fired on this corpus
    assert(nUpd > 0 && nDel > 0 && nIns > 0 && nBySrc > 0,
      s"a clause never fired: upd=$nUpd del=$nDel ins=$nIns bySrc=$nBySrc")
    // frozen years' files byte-identical (same paths survive)
    def yearOf(p: String): Int = p.split("yr=")(1).take(4).toInt
    val frozen = before.filter(yearOf(_) < 1996)
    assert(frozen.nonEmpty && frozen.forall(snapshot().contains),
      "a pre-1996 partition file was replaced")
  }

  test("sink15 positional delete: NO data file rewritten, sidecar = predicate rows exactly") {
    val sf = "/root/testdata/sf0.001"
    val out = tmp("deletevec-frozen") + "/base"
    SinkQueries.writeBasePartitioned(spark, sf, out)
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(Paths.get(out).toFile)
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getAbsolutePath.contains("_deletes"))
        .map(f => f.getAbsolutePath -> ((f.length, f.lastModified))).toMap
    }
    val total = spark.read.parquet(out).count()
    val expectDel = spark.read.parquet(out).where("o_orderkey % 13 = 0").count()
    assert(expectDel > 0, "predicate deletes nothing - vacuous")
    val before = snapshot()
    val recorded = graft.sinks.Sinks.positionalDelete(spark, out, "o_orderkey % 13 = 0")
    // merge-on-read's whole point: every base file survives byte-for-byte
    val after = snapshot()
    assert(after === before, "a data file changed under a positional delete")
    assert(recorded === expectDel, "sidecar positions != predicate row count")
    // the merged read subtracts exactly the deleted rows...
    val served = graft.sinks.Sinks.readWithDeletes(spark, out)
    assert(served.count() === total - expectDel)
    assert(served.where("o_orderkey % 13 = 0").count() === 0L,
      "a deleted row survived the merge-on-read")
    // ...while the raw table still holds them (history intact until compaction)
    assert(spark.read.parquet(out).count() === total)
    // deletes accumulate: a second commit against another predicate composes
    graft.sinks.Sinks.positionalDelete(spark, out, "o_orderkey % 17 = 0")
    val twice = graft.sinks.Sinks.readWithDeletes(spark, out)
    assert(twice.where("o_orderkey % 13 = 0 or o_orderkey % 17 = 0").count() === 0L)
  }

  test("sink16 WAP: rejected stage invisible, vacuum-protected until abort; publish is the staged set verbatim") {
    import graft.sinks.Sinks
    val (out, stagedB) = SinkQueries.wapRun(spark, "/root/testdata/sf0.001")
    // only the good batch was published; staging manifests are not versions
    assert(Sinks.manifestVersions(spark, out) === Seq(1, 2))
    // publish promoted the staged set verbatim (one manifest PUT)...
    assert(Sinks.readManifest(spark, out, 2) === stagedB.sorted)
    // ...and consumed the staging manifest; only the rejected "a" is pending
    assert(Sinks.stagingTags(spark, out) === Seq("a"))
    // the poisoned batch's files exist on disk but NO version references them
    val referenced = (Sinks.readManifest(spark, out, 1) ++
      Sinks.readManifest(spark, out, 2)).toSet
    val orphans = Sinks.dataFiles(spark, out).filterNot(referenced)
    assert(orphans.nonEmpty, "rejected stage left no files - reject path untested")
    val stagedA = Sinks.readStaged(spark, out, "a").toSet
    assert(orphans.forall(stagedA), "an orphan not from the rejected stage")
    // no reader path can see a poisoned row
    assert(Sinks.readAtVersion(spark, out, 2)
      .where("o_custkey is null").count() === 0L)
    // while the stage is PENDING (not yet aborted), vacuum must not
    // touch its files — this is the audit-vs-GC race guard
    assert(Sinks.vacuum(spark, out, Seq(1, 2)) === 0,
      "vacuum deleted files of a pending stage")
    assert(Sinks.readAtStaged(spark, out, "a").count() > 0L,
      "pending stage unreadable after vacuum")
    // explicit abort releases the stage; vacuum then removes exactly
    // the rejected orphans, and the published version reads identically
    val v2Before = Sinks.readAtVersion(spark, out, 2).count()
    Sinks.abortStaged(spark, out, "a")
    val deleted = Sinks.vacuum(spark, out, Seq(1, 2))
    assert(deleted === orphans.size)
    assert(Sinks.dataFiles(spark, out).toSet === referenced)
    assert(Sinks.readAtVersion(spark, out, 2).count() === v2Before)
  }

  test("sink16/25 vacuum vs pending WAP stage: retention GC spares the stage; publish after GC reads green") {
    import graft.sinks.Sinks
    val d = "/root/testdata/sf0.001"
    val out = tmp("wapvac") + "/t"
    val orders = graft.Tables(spark, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // v1 = base write; v2 = a full COW rewrite (strands all of v1's files)
    orders.repartition(3).write.parquet(out)
    Sinks.writeManifest(spark, out, 1, Sinks.dataFiles(spark, out))
    val v1 = Sinks.readManifest(spark, out, 1).toSet
    orders.repartition(2).write.mode("append").parquet(out)
    val v2 = Sinks.dataFiles(spark, out).filterNot(v1)
    Sinks.writeManifest(spark, out, 2, v2)
    // stage a good batch on top of v2 — written, audited, NOT yet published
    val before = Sinks.dataFiles(spark, out).toSet
    orders.where("o_orderkey % 89 = 0").coalesce(1)
      .write.mode("append").parquet(out)
    val appended = Sinks.dataFiles(spark, out).filterNot(before)
    Sinks.writeStaged(spark, out, "c", v2 ++ appended)
    // retention GC while the stage is pending: v1's stranded files die,
    // but nothing the stage names is touched
    val dead = Sinks.vacuum(spark, out, keep = 1)
    assert(dead.toSet === v1, s"reclaim mismatch: $dead")
    assert(appended.forall(f => Sinks.dataFiles(spark, out).contains(f)),
      "vacuum deleted a pending stage's data file")
    // publish AFTER the GC: the promoted version reads complete
    Sinks.publishStaged(spark, out, "c", 3)
    val expected = orders.count() + orders.where("o_orderkey % 89 = 0").count()
    assert(Sinks.readAtVersion(spark, out, 3).count() === expected)
    assert(Sinks.stagingTags(spark, out) === Seq.empty)
  }

  test("sink15/25 vacuum spares _deletes sidecars: positional deletes survive GC") {
    import graft.sinks.Sinks
    val d = "/root/testdata/sf0.001"
    val out = tmp("dvvac") + "/t"
    val orders = graft.Tables(spark, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    orders.repartition(2).write.parquet(out)
    Sinks.writeManifest(spark, out, 1, Sinks.dataFiles(spark, out))
    Sinks.positionalDelete(spark, out, "o_orderkey % 13 = 0")
    // DV sidecars are not data files, so vacuum cannot compute them dead
    assert(Sinks.dataFiles(spark, out).forall(!_.startsWith("_deletes/")))
    assert(Sinks.vacuum(spark, out, keep = 1) === Seq.empty)
    // the deletes still apply after GC — no silent row resurrection
    assert(Sinks.readWithDeletes(spark, out)
      .where("o_orderkey % 13 = 0").count() === 0L)
  }

  test("sink17 incremental stats: equals the full rebuild; prior rows pass through verbatim") {
    import org.apache.spark.sql.functions.{count, input_file_name, lit, max, min}
    val (out, man2) = SinkQueries.statsIncrementalRun(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame): Map[String, (String, String, Long)] =
      df.collect().map(r => r.getString(0) ->
        ((r.get(1).toString, r.get(2).toString, r.getLong(3)))).toMap
    val incremental = rows(spark.read.parquet(man2))
    // the incremental manifest equals a from-scratch rebuild of the
    // whole table, file for file, stat for stat
    val rebuild = rows(spark.read.parquet(out)
      .groupBy(input_file_name().as("file"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"),
        count(lit(1)).as("n_rows")))
    assert(incremental === rebuild, "incremental manifest diverged from full rebuild")
    // both tiers are present and every file is covered
    assert(incremental.size === graft.sinks.Sinks.dataFiles(spark, out).size)
    val years = incremental.values.map(_._1.take(4).toInt).toSet
    assert(years.exists(_ < 1996) && years.exists(_ >= 1996),
      "append boundary not represented - increment is vacuous")
  }

  test("sink18 CSV: nasty payloads roundtrip verbatim and the bytes are RFC (doubled quotes)") {
    val got = SinkQueries.all("sink18_csv_roundtrip").fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    SinkQueries.csvNastyRows.foreach { case (id, payload) =>
      assert(got(id) === payload, s"row $id mutated through the roundtrip")
    }
    // the on-disk form is RFC 4180: quotes doubled, never backslashed
    val dir = new java.io.File(
      graft.sinks.SinkQueries.scratchPath("csvround"))
    val raw = dir.listFiles().filter(_.getName.endsWith(".csv"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .mkString
    assert(raw.contains("\"\"hi\"\""), "embedded quotes are not doubled")
    assert(!raw.contains("\\\""), "backslash escaping leaked into the export")
    // the embedded newline is inside a quoted field, not a row break
    assert(raw.contains("\"line1\nline2\""), "newline not carried inside quotes")
  }

  test("sink19 partition evolution: layouts coexist, month pruning hits only the evolved spec") {
    val sf = "/root/testdata/sf0.001"
    val out = SinkQueries.partitionEvolutionRun(spark, sf)
    def files(root: String): Seq[String] = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(_.toString.stripPrefix(root)).toVector
      } finally it.close()
    }
    val f1 = files(s"$out/spec1")
    val f2 = files(s"$out/spec2")
    // spec1 files carry ONLY yr= in their path; spec2 files carry both
    assert(f1.nonEmpty && f1.forall(p => p.contains("yr=") && !p.contains("mo=")))
    assert(f2.nonEmpty && f2.forall(p => p.contains("yr=") && p.contains("mo=")))
    // a month-filtered read of the evolved spec prunes by directory:
    // the scan's static partition listing covers only mo=3 dirs
    val pruned = spark.read.option("basePath", s"$out/spec2")
      .parquet(s"$out/spec2").where("mo = 3")
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.inputPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(scansOf)
    }
    val scan = scansOf(pruned.queryExecution.executedPlan).head
    val mo3Dirs = f2.map(_.split("/part-").head).distinct.count(_.contains("mo=3"))
    val allDirs = f2.map(_.split("/part-").head).distinct.size
    assert(scan.partitionFilters.nonEmpty,
      "month filter did not reach the scan as a PartitionFilter")
    assert(scan.selectedPartitions.partitionCount === mo3Dirs)
    assert(mo3Dirs < allDirs, "pruning precondition vacuous")
    // evolution never rewrites: the reconciled read (spec1 with the
    // derived month + spec2 as written) leaves spec1 bytes alone
    val before = f1.map(p => p -> java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$out/spec1$p")).toMillis).toMap
    val reconciled = spark.read.option("basePath", s"$out/spec1")
      .parquet(s"$out/spec1")
      .withColumn("mo", org.apache.spark.sql.functions.expr("month(o_orderdate)"))
      .unionByName(spark.read.option("basePath", s"$out/spec2")
        .parquet(s"$out/spec2"))
    val expected = graft.Tables(spark, sf, "orders").count()
    assert(reconciled.count() === expected)
    f1.foreach { p =>
      val now = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$out/spec1$p")).toMillis
      assert(now === before(p), s"spec1 file $p was touched by the read")
    }
  }

  test("sink20 IVM: untouched years ride through unchanged; affected years move by the delta") {
    val sf = "/root/testdata/sf0.01"
    val o = graft.Tables(spark, sf, "orders").selectExpr(
      "year(o_orderdate) as yr",
      "cast(floor(o_totalprice * 100) as bigint) as cents")
    val agg0 = o.groupBy("yr")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("cents").as("c"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = graft.SparkEntry.queries("sink20_agg_maintain")(spark, sf)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === agg0.keySet)
    // the changelog is confined to 1996+: earlier years must be
    // BIT-identical to the unmaintained aggregate
    got.filter(_._1 < 1996).foreach { case (yr, v) =>
      assert(v === agg0(yr), s"untouched year $yr moved under maintenance")
    }
    // and at least one affected year genuinely moved in both measures
    assert(got.exists { case (yr, (n, c)) =>
      yr >= 1996 && n > agg0(yr)._1 && c > agg0(yr)._2
    }, "no year moved - the changelog delta was lost")
  }

  test("sink23: the fact scan carries a runtime DynamicPruning subquery and reads only 1997's partitions") {
    val sf = "/root/testdata/sf0.001"
    val (df, path) = graft.sinks.SinkQueries.dppRead(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP subquery in the fact scan:\n$plan")
    // the pruned result equals the statically-filtered read (prune != change)
    val rows = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = spark.read.parquet(path).where("ym like '1997-%'")
      .groupBy("ym").agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("qty_c").as("q"),
        org.apache.spark.sql.functions.sum("price_c").as("p"))
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows === want)
    assert(rows.keySet === (1 to 12).map(m => f"1997-$m%02d").toSet)
    // the table genuinely holds 7 years of partitions — 1997 is a prune,
    // not the whole table
    val allParts = new java.io.File(path).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ym="))
    assert(allParts > 70, s"expected ~83 month partitions, saw $allParts")
  }

  test("sink25 vacuum: replaced files + expired manifest gone, survivors intact, keep-all reclaims nothing") {
    val d = "/root/testdata/sf0.001"
    val out = tmp("vacuum") + "/t"
    val S = graft.sinks.Sinks
    SinkQueries.writeBasePartitioned(spark, d, out)
    S.writeManifest(spark, out, 1, S.dataFiles(spark, out))
    SinkQueries.upsertCow(spark, d, out)
    val v1 = S.readManifest(spark, out, 1).toSet
    val v2 = S.readManifest(spark, out, 2).toSet
    val headBefore = S.readAtVersion(spark, out, 2)
      .collect().map(_.toString).sorted
    // a full-retention vacuum reclaims nothing — every file is referenced
    assert(S.vacuum(spark, out, keep = 2) === Seq.empty)
    assert(S.dataFiles(spark, out).toSet === (v1 ++ v2))
    // keep=1: exactly v1's replaced files die, v1's manifest dies with them
    val dead = S.vacuum(spark, out, keep = 1)
    assert(dead.toSet === (v1 -- v2), s"reclaim mismatch: $dead")
    assert(dead.nonEmpty) // the COW merge really did strand history
    assert(S.manifestVersions(spark, out) === Seq(2))
    assert(S.dataFiles(spark, out).toSet === v2)
    // current readers are untouched by the GC
    val headAfter = S.readAtVersion(spark, out, 2)
      .collect().map(_.toString).sorted
    assert(headAfter === headBefore)
    // time travel past the horizon now fails loudly, not half-reads
    intercept[Exception](S.readAtVersion(spark, out, 1).collect())
  }
}
