package graft.dwca

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Four small generated DwC-A archives for the FLEET conversion gate
  * (dwca11) — the reference's RQ tier converts a whole IPT catalog,
  * one enqueued job per dataset (`resources.py:46-75`); the gate
  * needs N ≥ 4 independent archives whose concurrent conversion
  * hash-matches the per-archive DuckDB oracles. Core-only archives
  * (zero extensions — the star join's empty fold, a path no other
  * gate exercises), content seeded per archive so the four outputs
  * are pairwise distinct. */
object FleetFixture {

  val nArchives = 4
  val rowsPer = 2000
  private val dir: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft-fleet-v1")

  def zipPath(k: Int): String = dir.resolve(s"fleet$k.zip").toString
  def extractedDir(k: Int): String = dir.resolve(s"extracted$k").toString

  def datasets: Seq[graft.meta.IptDataset] =
    (1 to nArchives).map(k => graft.meta.IptDataset(
      s"fleet$k", s"Fleet archive $k", "1", s"fleet/$k", ""))

  def urlOf(ds: graft.meta.IptDataset): String =
    Paths.get(zipPath(ds.id.stripPrefix("fleet").toInt)).toUri.toString

  private val vocab =
    Array("Vulpes vulpes", "Lynx lynx", "Parus major", "Falco peregrinus", "Alces alces")

  private def occurrenceTxt(k: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder(rowsPer * 60)
    sb.append("id\tscientificName\tdecimalLatitude\tdecimalLongitude\n")
    var i = 1
    while (i <= rowsPer) {
      // every 53rd row loses its coordinates → the null-geom branch
      val lat = if ((i + k) % 53 == 0) "" else f"${50 + ((i * 7 + k * 13) % 9000) * 0.001}%.3f"
      val lon = if ((i + k) % 53 == 0) "" else f"${10 + ((i * 11 + k * 17) % 7000) * 0.001}%.3f"
      sb.append('a').append(k).append('r').append(i).append('\t')
        .append(vocab((i * k) % 5)).append('\t')
        .append(lat).append('\t').append(lon).append('\n')
      i += 1
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private val metaXml =
    """<?xml version="1.0" encoding="utf-8"?>
      |<archive xmlns="http://rs.tdwg.org/dwc/text/" metadata="eml.xml">
      |  <core encoding="UTF-8" fieldsTerminatedBy="\t" linesTerminatedBy="\n" fieldsEnclosedBy="" ignoreHeaderLines="1" rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
      |    <files><location>occurrence.txt</location></files>
      |    <id index="0" />
      |    <field index="1" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
      |    <field index="2" term="http://rs.tdwg.org/dwc/terms/decimalLatitude"/>
      |    <field index="3" term="http://rs.tdwg.org/dwc/terms/decimalLongitude"/>
      |  </core>
      |</archive>
      |""".stripMargin.getBytes(StandardCharsets.UTF_8)

  /** Idempotent: generates the archives + extracted members once
    * (marker-gated); later calls return immediately. */
  def ensure(): Unit = synchronized {
    val marker = dir.resolve("_READY")
    if (Files.exists(marker)) return
    (1 to nArchives).foreach { k =>
      val ex = dir.resolve(s"extracted$k")
      Files.createDirectories(ex)
      val members = Seq(
        "occurrence.txt" -> occurrenceTxt(k), "meta.xml" -> metaXml)
      members.foreach { case (n, b) => Files.write(ex.resolve(n), b) }
      val zos = new ZipOutputStream(
        Files.newOutputStream(dir.resolve(s"fleet$k.zip")))
      try members.foreach { case (n, b) =>
        zos.putNextEntry(new ZipEntry(n)); zos.write(b); zos.closeEntry()
      } finally zos.close()
    }
    Files.createFile(marker)
  }

  /** Serve the fixture zips over loopback HTTP at the IPT contract
    * path (`/archive.do?r=<id>&v=<ver>` — `ipt.py:7,25`,
    * `parquet.py:38-40`), so the fleet gate can exercise
    * [[graft.sources.Fetch.toFile]]'s real `http://` branch
    * end-to-end offline. Multi-threaded executor: the fleet fetches
    * CONCURRENTLY, and a single-thread server would serialize the
    * very overlap ConvertJobSpec asserts. */
  def withHttpServer[A](body: Int => A): A = {
    ensure()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/archive.do", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split("&").iterator.map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v }.toMap
        val k = params.get("r")
          .flatMap(id => id.stripPrefix("fleet").toIntOption)
          .filter(i => i >= 1 && i <= nArchives)
        k match {
          case Some(i) =>
            val bytes = Files.readAllBytes(Paths.get(zipPath(i)))
            ex.getResponseHeaders.set("Content-Type", "application/zip")
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    val exec = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(exec)
    server.start()
    try body(server.getAddress.getPort)
    finally { server.stop(0); exec.shutdown() } // non-daemon threads must die with the server
  }

  /** A clean fleet output root: prior outputs deleted so the gate
    * always exercises a real concurrent conversion, never the
    * skip-if-exists fast path over stale bytes. */
  def freshOutBase(name: String = "out"): String = {
    val out = dir.resolve(name)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => rm(c))
      Files.deleteIfExists(p)
    }
    rm(out)
    Files.createDirectories(out)
    out.toString
  }

  /** Stage the fleet catalog for the STREAMING intake (stream27):
    * one single-row parquet file per dataset in a fresh directory, so
    * a `maxFilesPerTrigger=1` file stream sees each archive ARRIVE in
    * its own micro-batch. The sibling checkpoint dir (`<name>-ckpt`)
    * is wiped too — a gate run is deterministic; the exactly-once
    * restart semantics are pinned by spec against a KEPT checkpoint.
    * Returns the catalog dir. */
  def stageCatalog(spark: org.apache.spark.sql.SparkSession,
      name: String = "catalog"): String = {
    ensure()
    val cat = freshOutBase(name)
    freshOutBase(s"$name-ckpt")
    datasets.zipWithIndex.foreach { case (ds, i) =>
      appendCatalogEntry(spark, cat, s"arrival-$i.parquet",
        ds.id, ds.version, urlOf(ds))
    }
    cat
  }

  /** One catalog file = one arrival event: a single (resource_id,
    * version, url) row, written whole then MOVED into the watched dir
    * (the file source must never observe a half-written file). */
  def appendCatalogEntry(spark: org.apache.spark.sql.SparkSession,
      catalogDir: String, fileName: String, resourceId: String,
      version: String, url: String): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-catalog-entry")
    Seq((resourceId, version, url)).toDF("resource_id", "version", "url")
      .coalesce(1).write.mode("overwrite").parquet(tmp.resolve("w").toString)
    val part = {
      import scala.jdk.CollectionConverters._
      Files.list(tmp.resolve("w")).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
    }
    Files.move(part, Paths.get(catalogDir, fileName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(c => rm(c))
      Files.deleteIfExists(p)
    }
    rm(tmp)
  }
}
