package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkTestBase
import graft.meta.Ipt
import org.scalatest.funsuite.AnyFunSuite

/** Drives the service shim over REAL HTTP (loopback, ephemeral port)
  * with fixture-backed fetch — the full reference router surface
  * (`resources.py:19-75`) offline: catalog listing, metadata GET with
  * its conversion side effect, CSW/geoapi job enqueues, job status. */
class ResourceServerSpec extends AnyFunSuite with SparkTestBase {

  private val ipt = "https://ipt.example"

  private def fixtureFetch(url: String): String = url match {
    case u if u == s"$ipt/rss.do" => Ipt.readFixture("rss.xml")
    case u if u.startsWith(s"$ipt/eml.do?r=") =>
      Ipt.readFixture(s"eml_${u.split("=").last}.xml")
    case other => sys.error(s"unexpected fetch $other")
  }

  private def get(port: Int, path: String, post: Boolean = false): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    val req = (if (post) b.POST(HttpRequest.BodyPublishers.noBody()) else b.GET()).build()
    val res = HttpClient.newHttpClient().send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("the full router surface: list, metadata+convert, csw, geoapi, jobs, 404") {
    val out = Files.createTempDirectory("graft-svc-out").toString
    val srv = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = fixtureFetch,
      // the "archive" behind every id is the committed sample zip
      archiveUrlOf = (_, _) => graft.dwca.DwcaQueries.fixtureZip)
    val port = srv.start()
    try {
      // GET /resources — the RSS catalog
      val (c1, list) = get(port, "/resources")
      assert(c1 === 200)
      assert(list.contains(""""id":"birds-norway""""))
      assert(list.contains(""""id":"mammals-svalbard""""))
      assert(list.contains(""""version":"12""""))

      // GET /resources/{id} — metadata, URLs, version from packageId,
      // and the conversion enqueued as a side effect (reference
      // semantics, resources.py:73)
      val (c2, res) = get(port, "/resources/birds-norway")
      assert(c2 === 200)
      assert(res.contains(""""version":"7""""))
      assert(res.contains(""""title":"Bird observations Norway""""))
      assert(res.contains(""""ipt_dwca":"https://ipt.example/archive.do?r=birds-norway""""))
      assert(res.contains(""""parquet_url":"https://s3.example/bucket/birds-norway.parquet""""))
      srv.drain()
      // the conversion really ran: versioned + latest objects exist
      assert(Files.exists(java.nio.file.Paths.get(out, "birds-norway", "v7.parquet")))
      assert(Files.exists(java.nio.file.Paths.get(out, "birds-norway.parquet")))
      assert(spark.read.parquet(s"$out/birds-norway.parquet").count() > 0)

      // POST /resources/csw — records parquet over the live catalog
      val (c3, csw) = get(port, "/resources/csw", post = true)
      assert(c3 === 200)
      assert(csw.contains(""""result":"https://s3.example/bucket/csw-records.parquet""""))
      srv.drain()
      val rec = spark.read.parquet(s"$out/csw-records.parquet")
      assert(rec.count() === 2)
      assert(rec.columns.contains("anytext") && rec.columns.contains("wkt_geometry"))

      // POST /resources/geoapi — config JSON array file
      val (c4, geo) = get(port, "/resources/geoapi", post = true)
      assert(c4 === 200)
      srv.drain()
      val cfg = spark.read.option("multiLine", "true").json(s"$out/geoapi-config.json")
      assert(cfg.count() === 2)
      assert(cfg.columns.contains("providers"))

      // GET /jobs — all terminal, none failed
      val (c5, jobs) = get(port, "/jobs")
      assert(c5 === 200)
      assert(jobs.contains("done"))
      assert(!jobs.contains("failed"), jobs)
      assert(srv.jobStatuses.values.forall(_ == "done"), srv.jobStatuses)

      // unknown route
      assert(get(port, "/nope")._1 === 404)
    } finally srv.stop()
  }

  test("N workers drain the queue concurrently (the RQ replica analog)") {
    val out = Files.createTempDirectory("graft-svc-fleet").toString
    // both jobs must be INSIDE their first fetch at the same moment:
    // each counts the latch down and waits for the other — reachable
    // only when two worker threads run jobs concurrently (under one
    // worker the second job never starts and the await times out)
    val latch = new java.util.concurrent.CountDownLatch(2)
    val gated: String => String = { url =>
      if (url == s"$ipt/rss.do") {
        latch.countDown()
        assert(latch.await(60, java.util.concurrent.TimeUnit.SECONDS),
          "second worker never reached fetch - jobs serialized")
      }
      fixtureFetch(url)
    }
    val srv = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = gated,
      archiveUrlOf = (_, _) => graft.dwca.DwcaQueries.fixtureZip,
      workers = 2)
    val port = srv.start()
    try {
      assert(get(port, "/resources/csw", post = true)._1 === 200)
      assert(get(port, "/resources/geoapi", post = true)._1 === 200)
      srv.drain()
      assert(srv.jobStatuses.values.forall(_ == "done"), srv.jobStatuses)
      assert(Files.exists(java.nio.file.Paths.get(out, "csw-records.parquet")))
      assert(Files.exists(java.nio.file.Paths.get(out, "geoapi-config.json")))
    } finally srv.stop()
  }

  test("hostile resource ids are 404, not path/query injection") {
    val out = Files.createTempDirectory("graft-svc-sec").toString
    val srv = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = fixtureFetch,
      archiveUrlOf = (_, _) => graft.dwca.DwcaQueries.fixtureZip)
    val port = srv.start()
    try {
      // encoded traversal: %2E%2E%2F decodes to ../ — would climb out
      // of outBase if it reached ConvertJob
      assert(get(port, "/resources/%2E%2E%2Fetc%2Fpasswd")._1 === 404)
      // query-param smuggling into the eml.do fetch URL
      assert(get(port, "/resources/x%26admin=1")._1 === 404)
      assert(get(port, "/resources/x%3Fy")._1 === 404)
      // bare dot segments and empty id
      assert(get(port, "/resources/..")._1 === 404)
      assert(get(port, "/resources/")._1 === 404)
      // no job was ever enqueued by any of the above
      assert(srv.jobStatuses.isEmpty, srv.jobStatuses)
      // a conservative token id still routes (fetch hit proves it)
      assert(get(port, "/resources/birds-norway")._1 === 200)
    } finally srv.stop()
  }

  test("a failing job is marked failed (never a zombie 'running') and terminal entries age out") {
    val out = Files.createTempDirectory("graft-svc-fail").toString
    val srv = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = fixtureFetch,
      // archive fetch inside the JOB blows up — the enqueue must survive
      archiveUrlOf = (_, _) => "file:///nonexistent/archive.zip",
      maxJobEntries = 3)
    val port = srv.start()
    try {
      assert(get(port, "/resources/birds-norway")._1 === 200) // enqueues the doomed convert
      srv.drain() // a stuck "running" would hang this until its timeout
      assert(srv.jobStatuses.values.exists(_.startsWith("failed")), srv.jobStatuses)
      val (_, jobs) = get(port, "/jobs")
      assert(jobs.contains("failed"))

      // age-out: every enqueue past the cap evicts the oldest terminal
      // entry, so the map never exceeds maxJobEntries (=3 here)
      (1 to 5).foreach { _ =>
        get(port, "/resources/birds-norway")
        srv.drain()
        assert(srv.jobStatuses.size <= 3, srv.jobStatuses)
      }
      // the newest job is still visible after pruning
      assert(srv.jobStatuses.keys.exists(_.endsWith("-6")), srv.jobStatuses)
    } finally srv.stop()
  }

  test("r9 durable journal: jobs survive a crash and a restarted server completes them") {
    val out = Files.createTempDirectory("graft-svc-journal").toString
    val journal = s"$out/_jobs.json"

    // server1's rss.do fetch parks FOREVER, ignoring interrupts — the
    // csw job must still be journaled as "running" when we crash (an
    // interrupt would let the job mark itself failed, which a real
    // kill -9 never allows)
    def parkingFetch(url: String): String = url match {
      case u if u == s"$ipt/rss.do" =>
        val never = new java.util.concurrent.CountDownLatch(1)
        while (true) {
          try never.await()
          catch { case _: InterruptedException => }
        }
        sys.error("unreachable")
      case other => fixtureFetch(other)
    }

    val srv1 = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = parkingFetch,
      archiveUrlOf = (_, _) => graft.dwca.DwcaQueries.fixtureZip,
      journalPath = Some(journal))
    val port1 = srv1.start()
    // csw-1 occupies the single worker (running, parked); the convert
    // enqueued behind it never gets to run (queued)
    assert(get(port1, "/resources/csw", post = true)._1 === 200)
    val t0 = System.currentTimeMillis()
    while (!srv1.jobStatuses.values.exists(_ == "running")) {
      require(System.currentTimeMillis() - t0 < 30000, srv1.jobStatuses)
      Thread.sleep(20)
    }
    assert(get(port1, "/resources/birds-norway")._1 === 200)
    assert(srv1.jobStatuses.values.toSet === Set("running", "queued"), srv1.jobStatuses)
    srv1.crash()
    // nothing completed before the crash
    assert(!Files.exists(java.nio.file.Paths.get(out, "csw-records.parquet")))
    assert(!Files.exists(java.nio.file.Paths.get(out, "birds-norway.parquet")))

    // restart on the same journal with a healthy fetch: both jobs are
    // re-enqueued in order and run to completion
    val srv2 = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = fixtureFetch,
      archiveUrlOf = (_, _) => graft.dwca.DwcaQueries.fixtureZip,
      journalPath = Some(journal))
    try {
      srv2.drain()
      assert(srv2.jobStatuses.size === 2, srv2.jobStatuses)
      assert(srv2.jobStatuses.values.forall(_ == "done"), srv2.jobStatuses)
      assert(srv2.jobStatuses.keys.exists(_.startsWith("csw-")), srv2.jobStatuses)
      assert(srv2.jobStatuses.keys.exists(_.startsWith("convert-birds-norway-")), srv2.jobStatuses)
      assert(spark.read.parquet(s"$out/csw-records.parquet").count() === 2)
      assert(spark.read.parquet(s"$out/birds-norway.parquet").count() > 0)
      // the journal itself records the terminal states for the NEXT restart
      val text = new String(Files.readAllBytes(java.nio.file.Paths.get(journal)))
      assert(text.contains("\"done\"") && !text.contains("\"queued\"") && !text.contains("\"running\""))
    } finally srv2.stop()
  }

  test("idempotent re-GET skips the conversion (existence probe, parquet.py:33)") {
    val out = Files.createTempDirectory("graft-svc-skip").toString
    val srv = new ResourceServer(spark, ipt, out, "https://s3.example/bucket",
      fetch = fixtureFetch,
      archiveUrlOf = (_, _) => graft.dwca.DwcaQueries.fixtureZip)
    val port = srv.start()
    try {
      get(port, "/resources/mammals-svalbard"); srv.drain()
      val v = java.nio.file.Paths.get(out, "mammals-svalbard", "v12.parquet")
      assert(Files.exists(v))
      val mtime = Files.getLastModifiedTime(v)
      get(port, "/resources/mammals-svalbard"); srv.drain()
      // second conversion is a skip: the versioned object is untouched
      assert(Files.getLastModifiedTime(v) === mtime)
      assert(srv.jobStatuses.values.forall(_ == "done"), srv.jobStatuses)
    } finally srv.stop()
  }
}
