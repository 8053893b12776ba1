package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Source-side fetch + object-store configuration (SURVEY §2.1
  * S5/S10) — the reference's fsspec download
  * (`/root/reference/src/dwca_parquet/libs/parquet.py:36-42`) and
  * DuckDB S3 SECRET (`settings.py:65-80`) re-expressed for Spark.
  */
object Fetch {

  /** Download `url` to `dest` (driver-side, same local-cache rationale
    * as the reference). `http(s)://` via java.net.http; `file://` and
    * bare paths copy locally — which is also what keeps this testable
    * offline. */
  def toFile(url: String, dest: Path): Path = {
    Files.createDirectories(dest.getParent)
    val uri = URI.create(url)
    uri.getScheme match {
      case "http" | "https" =>
        val client = HttpClient.newBuilder()
          .followRedirects(HttpClient.Redirect.NORMAL).build()
        val req = HttpRequest.newBuilder(uri).GET().build()
        val res = client.send(req, HttpResponse.BodyHandlers.ofFile(dest,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
        require(res.statusCode() / 100 == 2, s"GET $url -> ${res.statusCode()}")
        res.body()
      case "file" | null =>
        val src = if (uri.getScheme == null) Paths.get(url) else Paths.get(uri)
        Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
        dest
      case other => throw new IllegalArgumentException(s"unsupported scheme $other")
    }
  }

  /** IPT archive URL (`parquet.py:38-40`). */
  def archiveUrl(iptPublic: String, resourceId: String, versionId: String): String =
    s"$iptPublic/archive.do?r=$resourceId&v=$versionId"

  /** `s3a://` credentials + endpoint on the session's Hadoop conf —
    * the Spark equivalent of the reference's `CREATE SECRET`
    * (key/secret, endpoint, url-style path, `settings.py:65-80`).
    * Same sinks/scans then run unchanged against `s3a://` paths. */
  def configureS3a(spark: SparkSession, endpoint: String, accessKey: String,
      secretKey: String, pathStyleAccess: Boolean = true): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    c.set("fs.s3a.path.style.access", pathStyleAccess.toString)
  }

  /** Every `fs.s3a.*` key this object (or a gate binding the mini
    * filesystem) may set on a SHARED hadoopConfiguration. Gates that
    * snapshot-and-restore around a loopback server iterate THIS list,
    * so a future configureS3a addition cannot silently leak past
    * their restore (it must be added here, next to the set). */
  val s3aKeys: Seq[String] = Seq(
    "fs.s3a.impl", "fs.s3a.impl.disable.cache",
    "fs.s3a.endpoint", "fs.s3a.access.key", "fs.s3a.secret.key",
    "fs.s3a.path.style.access", "fs.s3a.multipart.size")
}
