package graft.dwca

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

import graft.sinks.Sinks
import graft.sources.Fetch

/** EP1 end-to-end: the worker body of `version_to_parquet`
  * (`/root/reference/src/dwca_parquet/libs/parquet.py:19-56`) as plain
  * driver orchestration — the reference's FastAPI/RQ tier is job
  * plumbing, not engine surface (SURVEY §3).
  *
  * skip-if-exists → fetch archive to local cache → convert →
  * versioned + latest zstd Parquet → GeoParquet footer → cache
  * cleanup. Returns true when a conversion ran.
  */
object ConvertJob {

  def run(spark: SparkSession, archiveUrl: String, outBase: String,
      resourceId: String, versionId: String,
      singleFile: Boolean = true): Boolean = {
    val cache = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-cache-$resourceId-v$versionId.zip")
    try {
      val ran = Sinks.writeVersioned(spark, {
        Fetch.toFile(archiveUrl, cache)
        DwcaConvert.convert(spark, cache.toString, DwcaConvert.GeomWkb)
      }, outBase, resourceId, versionId, singleFile)
      if (ran) {
        val versioned = s"$outBase/$resourceId/v$versionId.parquet"
        // per-part bboxes + geometry types from the written data — one
        // distributed envelope pass and one header-distinct pass,
        // computed once and reused for both aliases (the latest alias
        // is a byte copy, so part names and contents are identical)
        val written = spark.read.parquet(versioned)
        val parts = Some(Sinks.geomBboxByPart(spark, versioned, "geom"))
        val types = Some(Sinks.geomTypes(spark, written, "geom"))
        Sinks.patchGeoFooter(spark, versioned, "geom",
          geometryTypes = types, partBboxes = parts)
        Sinks.patchGeoFooter(spark, s"$outBase/$resourceId.parquet", "geom",
          geometryTypes = types, partBboxes = parts)
      }
      ran
    } finally {
      // cache unlink runs even on failure (parquet.py:52-54)
      java.nio.file.Files.deleteIfExists(cache)
    }
  }

  /** Catalog-driven fleet conversion — the reference's per-request RQ
    * loop (`resources.py:46-75` over the RSS datasets) as one driver
    * loop: each dataset is an independent skip-or-convert. Failures
    * are isolated per archive (one bad zip must not sink the fleet);
    * returns (resourceId → ran|skipped|error). */
  def runCatalog(spark: SparkSession, datasets: Seq[graft.meta.IptDataset],
      archiveUrlOf: graft.meta.IptDataset => String, outBase: String,
      singleFile: Boolean = true): Map[String, String] =
    datasets.map { ds =>
      ds.id -> (try {
        if (run(spark, archiveUrlOf(ds), outBase, ds.id, ds.version, singleFile))
          "ran" else "skipped"
      } catch {
        case e: Exception => s"error: ${e.getMessage}"
      })
    }.toMap
}
