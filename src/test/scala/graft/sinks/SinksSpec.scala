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

  test("geoparquet footer patch preserves data and adds the geo key") {
    import spark.implicits._
    val out = tmp("geo") + "/t.parquet"
    val df = Seq((1L, Array[Byte](1, 1, 0, 0, 0)), (2L, null))
      .toDF("fid", "geom")
    Sinks.writeZstd(df.coalesce(1), out)
    val before = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    Sinks.patchGeoFooter(spark, out, "geom")
    // data survives the byte-copy rewrite
    val after = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(after === before)
    // footer now carries GeoParquet metadata with geometry_types
    // derived from the written WKB (the fixture bytes are a
    // little-endian Point header) and an explicit crs
    val geo = Sinks.readFooterKey(spark, out, "geo")
    assert(geo.nonEmpty)
    assert(geo.forall(_._2 == Sinks.geoMetadataJson("geom", None, Seq("Point"))))
    assert(geo.head._2.contains(""""geometry_types":["Point"]"""))
    assert(geo.head._2.contains(""""crs":null"""))
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
}
