package graft.sinks

import java.net.URI
import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.dwca.{ConvertJob, DwcaQueries}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite

/** A local FileSystem registered under its OWN scheme. Any code that
  * bypasses the Hadoop `FileSystem` API and hands a data path to
  * `java.io.File`/`java.nio.file` sees the literal string
  * `graftfs:///tmp/…` — which is not a local path — and fails
  * loudly, so a green round-trip through this scheme proves the
  * storage contract behaviorally instead of by code reading. */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** The FileSystem contract behind the s3a claim (`Fetch.configureS3a`,
  * reference `settings.py:65-80`): every sink/fetch data-path
  * operation must reach storage only through Hadoop `FileSystem`, so
  * pointing `outBase` at s3a:// (or any object store) is a config
  * change, not a code change. Exercised call sites, end to end via
  * `ConvertJob.run` on a foreign scheme:
  *
  *   - `Sinks.writeVersioned`  (exists-probe, staging write, rename,
  *                              latest-alias byte copy)
  *   - `Sinks.writeZstd`       (the parquet write itself)
  *   - `Sinks.geomBboxByPart` / `Sinks.geomTypes` (read-back scans)
  *   - `Sinks.patchGeoFooter`  (footer read, tmp write, atomic swap)
  *   - `Sinks.readFooterKey`   (footer read)
  *
  * The archive CACHE deliberately stays `java.nio` — it is local
  * scratch by design, mirroring the reference's download-then-read
  * ("httpfs + zipfs does not work greatly together", parquet.py:35-42).
  */
class FsContractSpec extends AnyFunSuite with SparkTestBase {

  test("full conversion round-trips on a non-local FileSystem scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = Files.createTempDirectory("graft-fscontract").toString
    val out = s"graftfs://$local"
    val url = Paths.get(DwcaQueries.fixtureZip).toUri.toString

    assert(ConvertJob.run(spark, url, out, "res1", "1"))
    val versioned = s"$out/res1/v1.parquet"
    val latest = s"$out/res1.parquet"
    assert(spark.read.parquet(versioned).count() === 10)
    assert(spark.read.parquet(latest).count() === 10)
    // the GeoParquet footer was patched through the same scheme
    Seq(versioned, latest).foreach { p =>
      val geo = Sinks.readFooterKey(spark, p, "geo")
      assert(geo.nonEmpty, s"no geo footer at $p")
      geo.foreach { case (_, json) =>
        assert(json.contains(""""bbox":["""), json)
      }
    }
    // the existence probe / idempotent skip also goes through FS
    assert(!ConvertJob.run(spark, url, out, "res1", "1"))
    // and the bytes really landed under the local root the scheme maps to
    assert(Files.exists(Paths.get(local, "res1", "v1.parquet")))
  }
}
