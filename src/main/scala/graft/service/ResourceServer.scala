package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.dwca.ConvertJob
import graft.meta.{Eml, Ipt, MetaQueries}
import graft.sinks.Sinks
import graft.sources.Fetch

/** Thin HTTP service shim over the engine — the reference's FastAPI +
  * RQ tier (`/root/reference/src/dwca_parquet/routers/resources.py:19-75`)
  * re-expressed endpoint-for-endpoint on the JDK's built-in
  * `com.sun.net.httpserver` (zero new dependencies; the service tier
  * is job plumbing, so a web framework would be padding):
  *
  *   - `GET  /resources`        — IPT RSS catalog listing
  *   - `POST /resources/csw`    — enqueue EML → CSW records build
  *   - `POST /resources/geoapi` — enqueue EML → pygeoapi config build
  *   - `GET  /resources/{id}`   — dataset metadata + parquet URLs, and
  *     (reference semantics, `resources.py:73`) enqueues the
  *     conversion as a side effect of the GET
  *   - `GET  /jobs`             — job statuses (shim addition: RQ's
  *     dashboard stands outside the reference router; some visible
  *     status surface is needed to be usable at all)
  *
  * One worker thread stands in for the reference's single RQ worker —
  * conversions are Spark DRIVER jobs, so serializing them preserves
  * both RQ's semantics and the cluster's resources. Job bodies reuse
  * the exact builders the gate checks ([[MetaQueries.cswRecords]],
  * [[MetaQueries.geoapiResources]], [[ConvertJob.run]]), so the
  * service cannot drift from the verified engine.
  *
  * `fetch` is pluggable (URL → body) so tests drive the full HTTP
  * surface against committed fixtures offline; production passes a
  * real HTTP fetch. Output paths are Hadoop-FS paths — `file:/` in
  * tests, `s3a://` (after [[Fetch.configureS3a]]) in deployment.
  *
  * Durability (`journalPath`): the reference's RQ+Redis queue
  * (`dependencies.py:33-34`) survives a worker restart; the r8 shim's
  * in-memory jobs map did not. With a journal path set (production
  * wiring does, `_jobs.json` under outBase), every job transition
  * snapshots the full job table — id, state, and a replayable payload
  * — through the Hadoop FS API (tmp-write + rename; works on file:/,
  * HDFS, and object stores, no appends). On construction the journal
  * is replayed: terminal jobs are restored for /jobs continuity and
  * queued/running jobs are RE-ENQUEUED — safe because every job body
  * is idempotent (the convert sink's existence probe skips completed
  * outputs, `Sinks.scala` / reference `parquet.py:33`; csw/geoapi
  * rebuild from the live catalog). A snapshot per transition is one
  * small PUT per state change of a minutes-long conversion job —
  * negligible, and unlike an append log it needs no compaction.
  */
final class ResourceServer(
    spark: SparkSession,
    iptPublic: String,
    outBase: String,
    resultBase: String,
    fetch: String => String,
    archiveUrlOf: (String, String) => String,
    bindHost: String = "127.0.0.1",
    bindPort: Int = 0,
    maxJobEntries: Int = 1024,
    journalPath: Option[String] = None,
    workers: Int = 1) {

  private val server = HttpServer.create(new InetSocketAddress(bindHost, bindPort), 0)
  // `workers` is the reference's RQ replica count
  // (docker-compose.yml:28-30 scales conversion throughput by adding
  // queue workers): N worker threads drain the queue. Jobs are
  // serialized PER STRIPE (resource id): two POSTs for the same
  // resource must not race writeVersioned's skip-if-exists probe
  // against each other's write (TOCTOU double-write to the same
  // versioned/latest paths). Per-stripe FIFO chains over the shared
  // pool — not hash-striping onto fixed threads, which would let two
  // DISTINCT resources false-serialize on a hash collision. Default
  // 1 = the reference's single-replica default (strict global FIFO).
  private val worker = Executors.newFixedThreadPool(math.max(1, workers), r => {
    val t = new Thread(r, "graft-service-worker"); t.setDaemon(true); t
  })
  private val stripeTails =
    new ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[Void]]()

  /** Chain `r` after the stripe's current tail (FIFO within a stripe,
    * any free worker across stripes). handleAsync, not thenRun: a
    * fatal error in one job must not starve the stripe forever. */
  private def submitStriped(stripe: String, r: Runnable): Unit = {
    val next = stripeTails.compute(stripe, (_, prev) => {
      val base =
        if (prev == null) java.util.concurrent.CompletableFuture.completedFuture[Void](null)
        else prev
      base.handleAsync[Void]((_, _) => { r.run(); null }, worker)
    })
    // Cleanup is registered OUTSIDE compute: whenComplete may run
    // synchronously on this thread if the job already finished, and
    // mutating the same CHM mapping from inside its own remapping
    // function is forbidden by the ConcurrentHashMap contract.
    // remove(stripe, next) is a no-op if a newer tail replaced us.
    next.whenComplete((_, _) => stripeTails.remove(stripe, next))
  }
  private val jobSeq = new AtomicLong(0)
  private val jobs = new ConcurrentHashMap[String, String]()
  // Insertion order for age-out; ConcurrentHashMap has none of its own.
  private val jobOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  // Replayable payload per job id ({"kind":...} + args) — what the
  // journal needs to reconstruct a body after a restart.
  private val jobMeta = new ConcurrentHashMap[String, String]()
  // Jackson ships inside Spark; readTree/writeValueAsBytes are
  // thread-safe on a shared configured mapper.
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private val journalLock = new Object

  private def isTerminal(s: String): Boolean = s == "done" || s.startsWith("failed")

  private def pruneJobs(): Unit =
    while (jobs.size > maxJobEntries) {
      val oldest = jobOrder.peek()
      // Never evict a live job: stop pruning at the first non-terminal
      // entry. Under one worker (FIFO) everything behind it is
      // younger; under N workers this is merely conservative — a
      // stalled old job delays pruning but never evicts a live one.
      if (oldest == null || !isTerminal(jobs.getOrDefault(oldest, "done"))) return
      jobOrder.poll(); jobs.remove(oldest); jobMeta.remove(oldest)
    }

  /** Snapshot the whole job table to the journal (tmp + rename — no
    * Hadoop-FS append, which LocalFileSystem and s3a both refuse).
    * Serialized under a lock: worker + handler threads both
    * transition states. */
  private def snapshotJournal(): Unit = journalPath.foreach { jp =>
    journalLock.synchronized {
      import scala.jdk.CollectionConverters._
      val arr = om.createArrayNode()
      jobOrder.asScala.foreach { id =>
        val o = om.createObjectNode()
        o.put("id", id)
        o.put("state", jobs.getOrDefault(id, "queued"))
        val payload = jobMeta.get(id)
        o.set("payload", om.readTree(if (payload != null) payload else "{}"))
        arr.add(o)
      }
      val root = om.createObjectNode()
      root.set("jobs", arr)
      val path = new org.apache.hadoop.fs.Path(jp)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(jp + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(om.writeValueAsBytes(root)) finally out.close()
      if (fs.exists(path)) fs.delete(path, false)
      fs.rename(tmp, path)
    }
  }

  private def setState(id: String, st: String): Unit = {
    jobs.put(id, st)
    snapshotJournal()
  }

  /** Stripe key of a job: convert jobs serialize per RESOURCE id (the
    * TOCTOU guard above); catalog builds serialize per kind. Derived
    * from the payload so the journal-replay path stripes identically. */
  private def stripeOf(payload: String): String = {
    val n = om.readTree(payload)
    Option(n.get("rid")).map(_.asText())
      .orElse(Option(n.get("kind")).map(_.asText()))
      .getOrElse(payload)
  }

  /** Register `id` and run `body` on its stripe's worker. A fatal
    * Throwable (OOM, linkage error) still marks the job failed before
    * propagating, so /jobs never shows a zombie "running" forever. */
  private def submitJob(id: String, payload: String)(body: => Unit): Unit = {
    jobs.put(id, "queued"); jobMeta.put(id, payload); jobOrder.add(id); pruneJobs()
    snapshotJournal()
    submitStriped(stripeOf(payload), new Runnable {
      override def run(): Unit = {
        setState(id, "running")
        try { body; setState(id, "done") }
        catch {
          case scala.util.control.NonFatal(e) =>
            setState(id, s"failed: ${e.getMessage}")
          case e: Throwable =>
            setState(id, s"failed: fatal ${e.getClass.getSimpleName}: ${e.getMessage}")
            throw e
        }
      }
    })
  }

  /** Enqueue `body` on the single worker; returns the job id. */
  private def enqueue(kind: String, payload: String)(body: => Unit): String = {
    val id = s"$kind-${jobSeq.incrementAndGet()}"
    submitJob(id, payload)(body)
    id
  }

  private def catalog() =
    Ipt.datasets(fetch(s"$iptPublic/rss.do"), baseUrl = s"$iptPublic/")

  private def withMeta() =
    catalog().map(ds => ds -> Eml.parse(fetch(s"$iptPublic/eml.do?r=${ds.id}")))

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  // ── job bodies (shared by the endpoints and journal replay) ──

  private def cswBody(): Unit =
    Sinks.writeZstd(
      MetaQueries.cswRecords(spark, withMeta()), s"$outBase/csw-records.parquet")

  private def geoapiBody(): Unit =
    Sinks.writeJsonArray(spark,
      MetaQueries.geoapiResources(spark, withMeta()), s"$outBase/geoapi-config.json")

  private def convertBody(url: String, rid: String, version: String): Unit =
    ConvertJob.run(spark, url, outBase, rid, version)

  /** Reconstruct a job body from its journaled payload; None for a
    * payload this build cannot replay (journal from a newer shim). */
  private def replayBody(payload: String): Option[() => Unit] = {
    val n = om.readTree(payload)
    def f(k: String): Option[String] = Option(n.get(k)).map(_.asText())
    f("kind") match {
      case Some("csw") => Some(() => cswBody())
      case Some("geoapi") => Some(() => geoapiBody())
      case Some("convert") =>
        for (u <- f("url"); r <- f("rid"); v <- f("version"))
          yield () => convertBody(u, r, v)
      case _ => None
    }
  }

  // ── endpoint bodies ──

  /** `GET /resources` (`resources.py:20-28`). */
  private def listResources(): String =
    catalog().map { ds =>
      s"""{"id":${jstr(ds.id)},"title":${jstr(ds.title)},"version":${jstr(ds.version)},"guid":${jstr(ds.guid)},"url":${jstr(ds.url)}}"""
    }.mkString("""{"resources":[""", ",", "]}")

  /** `POST /resources/csw` (`resources.py:31-36`): CSW records over
    * the live catalog → parquet under outBase. */
  private def generateCsw(): String = {
    val job = enqueue("csw", """{"kind":"csw"}""")(cswBody())
    s"""{"result":${jstr(s"$resultBase/csw-records.parquet")},"job":${jstr(job)}}"""
  }

  /** `POST /resources/geoapi` (`resources.py:39-44`): pygeoapi config
    * JSON array under outBase. */
  private def generateGeoapi(): String = {
    val job = enqueue("geoapi", """{"kind":"geoapi"}""")(geoapiBody())
    s"""{"result":${jstr(s"$resultBase/geoapi-config.json")},"job":${jstr(job)}}"""
  }

  /** `GET /resources/{id}` (`resources.py:47-75`): metadata + URLs,
    * conversion enqueued as a side effect — reference semantics. */
  private def getResource(id: String): String = {
    val emlXml = fetch(s"$iptPublic/eml.do?r=$id")
    val meta = Eml.parse(emlXml)
    val version = Eml.packageVersion(emlXml)
    val url = archiveUrlOf(id, version)
    val payload = {
      val o = om.createObjectNode()
      o.put("kind", "convert"); o.put("url", url)
      o.put("rid", id); o.put("version", version)
      om.writeValueAsString(o)
    }
    val job = enqueue(s"convert-$id", payload) {
      convertBody(url, id, version)
    }
    s"""{"id":${jstr(id)},
        |"ipt_url":${jstr(s"$iptPublic/resource?r=$id")},
        |"ipt_eml":${jstr(s"$iptPublic/eml.do?r=$id")},
        |"ipt_dwca":${jstr(s"$iptPublic/archive.do?r=$id")},
        |"title":${jstr(meta.title)},
        |"version":${jstr(version)},
        |"parquet_url":${jstr(s"$resultBase/$id.parquet")},
        |"s3_path":${jstr(s"$outBase/$id.parquet")},
        |"job":${jstr(job)}}""".stripMargin.replace("\n", "")
  }

  private def jobsJson(): String =
    "{" + jobs.entrySet().stream().map[String](e =>
      s"${jstr(e.getKey)}:${jstr(e.getValue)}").sorted().toArray.mkString(",") + "}"

  server.createContext("/", (ex: HttpExchange) => {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    try (method, path) match {
      case ("GET", "/resources") => respond(ex, 200, listResources())
      case ("POST", "/resources/csw") => respond(ex, 200, generateCsw())
      case ("POST", "/resources/geoapi") => respond(ex, 200, generateGeoapi())
      case ("GET", "/jobs") => respond(ex, 200, jobsJson())
      case ("GET", p) if p.startsWith("/resources/") =>
        // The id flows into fetch URLs and output paths, so reject
        // anything but a conservative token (FastAPI's `{resource_id}`
        // path param can't match slashes either, `resources.py:47`).
        // The raw (pre-URL-decode) path must ALSO be clean, or an
        // encoded `%2F`/`%26` would smuggle separators through.
        val id = p.stripPrefix("/resources/")
        val rawId = Option(ex.getRequestURI.getRawPath).getOrElse(p).stripPrefix("/resources/")
        if (ResourceServer.validId(id) && ResourceServer.validId(rawId))
          respond(ex, 200, getResource(id))
        else respond(ex, 404, """{"error":"not found"}""")
      case _ => respond(ex, 404, """{"error":"not found"}""")
    } catch {
      case e: Exception => respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
    }
  })

  // ── journal replay (constructor-time, before the server listens) ──
  // Terminal jobs are restored for /jobs continuity; queued/running
  // jobs are re-enqueued in their original order (idempotent bodies
  // make this the RQ restart semantics, not a duplicate-work hazard).
  journalPath.foreach { jp =>
    val main = new org.apache.hadoop.fs.Path(jp)
    val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash-window fallback: the writer goes create(tmp) → delete(main)
    // → rename(tmp, main) (no overwriting rename on LocalFileSystem /
    // s3a). A kill between the delete and the rename leaves only the
    // tmp — which is complete, because it was written and closed
    // before the delete — so a missing main falls back to it rather
    // than silently dropping every journaled job.
    val tmp = new org.apache.hadoop.fs.Path(jp + ".tmp")
    val path = if (fs.exists(main)) main else tmp
    if (fs.exists(path)) {
      import scala.jdk.CollectionConverters._
      val in = fs.open(path)
      val root =
        try om.readTree(in)
        finally in.close()
      Option(root.get("jobs")).toSeq.flatMap(_.elements().asScala).foreach { n =>
        val id = n.get("id").asText()
        val st = n.get("state").asText()
        val payload = Option[Any](n.get("payload")).map(_.toString).getOrElse("{}")
        // keep new ids past every journaled one
        id.split("-").lastOption.flatMap(_.toLongOption)
          .foreach(seq => jobSeq.updateAndGet(cur => math.max(cur, seq)))
        if (isTerminal(st)) {
          jobs.put(id, st); jobMeta.put(id, payload); jobOrder.add(id)
        } else replayBody(payload) match {
          case Some(body) => submitJob(id, payload)(body())
          case None =>
            jobs.put(id, "failed: unreplayable journal payload")
            jobMeta.put(id, payload); jobOrder.add(id)
        }
      }
      // the terminal-restore path above bypasses submitJob's prune: a
      // journal written at the cap would otherwise resurrect past it
      pruneJobs()
      snapshotJournal()
    }
  }

  def start(): Int = { server.start(); server.getAddress.getPort }

  /** Test aid: die like a crashed engine — stop listening and abandon
    * the worker WITHOUT letting queued jobs run (ExecutorService.
    * shutdown() would drain them, which is exactly what a crash does
    * not do). The restart spec builds a new server on the same
    * journal afterwards. */
  def crash(): Unit = { server.stop(0); worker.shutdownNow() }

  /** Wait for all queued jobs to finish (test/shutdown aid). */
  def drain(timeoutMs: Long = 120000): Unit = {
    val t0 = System.currentTimeMillis()
    while (jobs.values.stream.anyMatch(v => v == "queued" || v == "running")) {
      require(System.currentTimeMillis() - t0 < timeoutMs, s"jobs stuck: $jobs")
      Thread.sleep(50)
    }
  }

  def jobStatuses: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    jobs.asScala.toMap
  }

  def stop(): Unit = { server.stop(0); worker.shutdown() }
}

object ResourceServer {
  /** Ids flow into fetch URLs and Hadoop output paths: only a
    * conservative token shape is routable; everything else is 404. */
  private val IdPattern = java.util.regex.Pattern.compile("^[A-Za-z0-9._-]+$")
  def validId(id: String): Boolean =
    id.nonEmpty && id.length <= 256 && IdPattern.matcher(id).matches() &&
      id != "." && id != ".."

  /** Production wiring: real HTTP fetch, reference archive URL shape,
    * durable job journal under outBase (RQ+Redis restart parity). */
  def apply(spark: SparkSession, iptPublic: String, outBase: String,
      resultBase: String, bindHost: String = "127.0.0.1",
      bindPort: Int = 0): ResourceServer =
    new ResourceServer(spark, iptPublic, outBase, resultBase,
      fetch = url => {
        val tmp = java.nio.file.Files.createTempFile("graft-svc", ".xml")
        try new String(java.nio.file.Files.readAllBytes(Fetch.toFile(url, tmp)),
          StandardCharsets.UTF_8)
        finally java.nio.file.Files.deleteIfExists(tmp)
      },
      archiveUrlOf = (id, v) => Fetch.archiveUrl(iptPublic, id, v),
      journalPath = Some(s"$outBase/_jobs.json"))
}

/** Standalone entry point:
  * `runMain graft.service.ServiceMain <iptPublicUrl> <outBase> <resultBase> [port] [bindHost]`
  * — the deployment analogue of the reference's uvicorn app. The
  * session is local by default; a cluster deployment constructs its
  * own SparkSession (spark-submit master) before this main runs.
  *
  * Binds LOOPBACK unless a bind host is given explicitly — the shim
  * has no auth layer, so exposing it beyond the host must be an
  * operator decision (front it with a reverse proxy), not a default. */
object ServiceMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ServiceMain <iptPublicUrl> <outBase> <resultBase> [port] [bindHost]")
    val port = args.lift(3).map(_.toInt).getOrElse(8080)
    val host = args.lift(4).getOrElse("127.0.0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val srv = ResourceServer(spark, args(0), args(1), args(2),
      bindHost = host, bindPort = port)
    val bound = srv.start()
    System.err.println(s"[graft-service] listening on $host:$bound")
    Thread.currentThread().join() // serve until killed
  }
}
