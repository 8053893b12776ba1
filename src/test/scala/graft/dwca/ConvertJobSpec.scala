package graft.dwca

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.sinks.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** EP1 end-to-end: fetch (file:// stands in for the IPT HTTP endpoint
  * offline) → convert → versioned sinks → GeoParquet footer → skip. */
class ConvertJobSpec extends AnyFunSuite with SparkTestBase {

  test("full conversion pipeline, then idempotent skip") {
    val out = Files.createTempDirectory("graft-convertjob").toString
    val url = Paths.get(DwcaQueries.fixtureZip).toUri.toString // file://...

    assert(ConvertJob.run(spark, url, out, "res1", "3"))
    val versioned = s"$out/res1/v3.parquet"
    val latest = s"$out/res1.parquet"
    assert(spark.read.parquet(versioned).count() === 10)
    assert(spark.read.parquet(latest).count() === 10)
    // both outputs carry the GeoParquet footer with the data bbox
    // (fixture extent: lat 58.97-69.65 as x, lon 5.73-19 as y —
    // polygon rings stretch lon to 19)
    Seq(versioned, latest).foreach { p =>
      val geo = Sinks.readFooterKey(spark, p, "geo")
      assert(geo.nonEmpty)
      geo.foreach { case (_, json) =>
        assert(json.contains(""""bbox":["""), json)
        assert(json.contains(""""encoding":"WKB""""), json)
      }
    }
    // the cache zip was cleaned up
    assert(!Files.exists(Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-cache-res1-v3.zip")))
    // second run: versioned object exists -> skip
    assert(!ConvertJob.run(spark, url, out, "res1", "3"))
  }

  test("catalog fleet conversion: per-archive isolation and skip") {
    val out = Files.createTempDirectory("graft-fleet").toString
    val goodUrl = Paths.get(DwcaQueries.fixtureZip).toUri.toString
    val datasets = Seq(
      graft.meta.IptDataset("good", "Good", "1", "g/1", ""),
      graft.meta.IptDataset("bad", "Bad", "1", "b/1", ""))
    val urls = Map("good" -> goodUrl, "bad" -> "file:///nonexistent.zip")
    val res = ConvertJob.runCatalog(spark, datasets, ds => urls(ds.id), out)
    assert(res("good") === "ran")
    assert(res("bad").startsWith("error"))
    // second pass: good is skipped, bad errors again, fleet continues
    val res2 = ConvertJob.runCatalog(spark, datasets, ds => urls(ds.id), out)
    assert(res2("good") === "skipped")
    assert(spark.read.parquet(s"$out/good.parquet").count() === 10)
  }

  test("fleet conversions run concurrently: >=2 archives overlap in wall time") {
    FleetFixture.ensure()
    val out = FleetFixture.freshOutBase()
    val timed = ConvertJob.runCatalogTimed(spark, FleetFixture.datasets,
      FleetFixture.urlOf, out)
    assert(timed.values.forall(_.status === "ran"), timed)
    // the RQ-tier claim is horizontal scaling — prove at least one
    // pair of conversions actually overlapped instead of serializing
    val iv = timed.values.toSeq
    val overlaps = iv.combinations(2).count {
      case Seq(a, b) => a.startNs < b.endNs && b.startNs < a.endNs
    }
    assert(overlaps >= 1, s"no two conversions overlapped: $timed")
    // and each archive's output is intact + distinct from the others
    val counts = FleetFixture.datasets.map { ds =>
      spark.read.parquet(s"$out/${ds.id}.parquet").count()
    }
    assert(counts.forall(_ === FleetFixture.rowsPer.toLong))
    val firstIds = FleetFixture.datasets.map { ds =>
      spark.read.parquet(s"$out/${ds.id}.parquet")
        .selectExpr("min(id)").head.getString(0)
    }
    assert(firstIds.distinct.size === FleetFixture.nArchives,
      s"archives cross-contaminated: $firstIds")
  }

  test("fetch supports bare local paths and rejects unknown schemes") {
    val dest = Files.createTempDirectory("graft-fetch").resolve("z.zip")
    graft.sources.Fetch.toFile(DwcaQueries.fixtureZip, dest)
    assert(Files.size(dest) > 0)
    assertThrows[IllegalArgumentException](
      graft.sources.Fetch.toFile("ftp://x/y.zip", dest))
  }

  test("s3a configuration maps the reference's SECRET fields") {
    graft.sources.Fetch.configureS3a(spark, "http://minio.local:9000", "ak", "sk")
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.endpoint") === "http://minio.local:9000")
    assert(c.get("fs.s3a.access.key") === "ak")
    assert(c.get("fs.s3a.secret.key") === "sk")
    assert(c.get("fs.s3a.path.style.access") === "true")
  }
}
