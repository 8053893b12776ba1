package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process loopback object store speaking the minimal S3 REST
  * subset [[S3MiniFileSystem]] needs — the object-store gate for the
  * sink/source tier (SURVEY §2 S10/E3), mirroring how the loopback
  * IPT server (`graft.dwca.FleetFixture.withHttpServer`) closed the
  * HTTP-fetch gate. Path-style addressing (`/bucket/key`), per the
  * reference's `url_style='path'` SECRET (`settings.py:65-80`):
  *
  *   - `PUT /b/k` — store; `x-amz-copy-source: /b2/k2` = server-side
  *     COPY (no body)
  *   - `GET /b/k` — bytes; honors `Range: bytes=a-b` (206)
  *   - `HEAD /b/k` — 200 + Content-Length, else 404
  *   - `DELETE /b/k` — 204
  *   - `GET /b?list-type=2&prefix=p&delimiter=/` — ListObjectsV2 XML
  *     (Contents + CommonPrefixes)
  *   - multipart upload: `POST /b/k?uploads` (InitiateMultipartUpload),
  *     `PUT /b/k?partNumber=N&uploadId=I`, `POST /b/k?uploadId=I`
  *     (Complete — assembles declared parts in part order),
  *     `DELETE /b/k?uploadId=I` (Abort); in-flight parts are
  *     invisible to GET/LIST until Complete, per the S3 contract
  *
  * Objects live in one ConcurrentHashMap keyed `bucket/key`.
  * Credentials are REAL in shape: every request must carry the
  * keyed-HMAC `Authorization` header [[S3MiniFileSystem]] signs
  * (access key named, method+path MAC'd with the secret); a wrong
  * key or signature is a 403, so the gate proves the SECRET plumbing,
  * not just byte transport. (The MAC is HMAC-SHA256 over the request
  * line — the SigV4 *idea* without its canonicalization ceremony,
  * which a loopback gate doesn't need.)
  */
object S3Loopback {

  def sign(secretKey: String, method: String, path: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secretKey.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(s"$method $path".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  def authHeader(accessKey: String, secretKey: String, method: String,
      path: String): String =
    s"GRAFT-HMAC-SHA256 $accessKey:${sign(secretKey, method, path)}"

  /** Serve an empty store on an ephemeral port for the duration of
    * `body`; multi-threaded (executors fetch concurrently). */
  def withServer[A](accessKey: String, secretKey: String)(body: Int => A): A = {
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new Handler(store, accessKey, secretKey))
    val exec = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(exec)
    server.start()
    try body(server.getAddress.getPort)
    finally { server.stop(0); exec.shutdown() }
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private class Handler(store: ConcurrentHashMap[String, Array[Byte]],
      accessKey: String, secretKey: String) extends HttpHandler {

    // multipart-upload state: parts keyed "uploadId/partNumber",
    // kept OUT of `store` so in-flight uploads never appear in
    // listings (the real-S3 invisibility contract for pending MPUs)
    private val mpuParts = new ConcurrentHashMap[String, Array[Byte]]()
    private val mpuSeq = new java.util.concurrent.atomic.AtomicLong(0)

    private def parseQuery(query: String): Map[String, String] =
      query.split("&").iterator.filter(_.nonEmpty).map(_.split("=", 2))
        .map {
          case Array(k)    => k -> ""
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap

    override def handle(ex: HttpExchange): Unit =
      try route(ex)
      catch { case _: Exception => reply(ex, 500, Array.empty) }
      finally ex.close()

    private def reply(ex: HttpExchange, code: Int, bytes: Array[Byte],
        headers: Map[String, String] = Map.empty): Unit = {
      headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      // HEAD responses advertise the length but send no body. The JDK
      // HttpServer rewrites Content-Length when rspLength is -1, so
      // the true length travels in an explicit header (real S3 sets
      // Content-Length itself; the client accepts either).
      if (ex.getRequestMethod == "HEAD") {
        ex.getResponseHeaders.set("x-graft-content-length", bytes.length.toString)
        ex.sendResponseHeaders(code, -1)
      } else if (bytes.isEmpty) ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      }
    }

    private def authorized(ex: HttpExchange): Boolean = {
      val hdr = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      hdr == authHeader(accessKey, secretKey, ex.getRequestMethod,
        ex.getRequestURI.getRawPath)
    }

    private def route(ex: HttpExchange): Unit = {
      if (!authorized(ex)) { reply(ex, 403, Array.empty); return }
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      // a LIST targets the bucket itself; a trailing-slash OBJECT path
      // (empty-dir marker) is still an object op
      val isList = !path.stripSuffix("/").contains("/") &&
        (query.contains("list-type=2") || !path.contains("/"))
      val params = parseQuery(query)
      (ex.getRequestMethod, isList) match {
        case ("POST", _) if params.contains("uploads") =>
          initiateMpu(ex, path)
        case ("POST", _) if params.contains("uploadId") =>
          completeMpu(ex, path, params("uploadId"))
        case ("PUT", _) if params.contains("uploadId") =>
          putPart(ex, params("uploadId"), params.getOrElse("partNumber", "0"))
        case ("DELETE", _) if params.contains("uploadId") =>
          abortMpu(params("uploadId")); reply(ex, 204, Array.empty)
        case ("GET" | "HEAD", true) => list(ex, path.stripSuffix("/"), query)
        case ("GET" | "HEAD", false) => get(ex, path)
        case ("PUT", _)             => put(ex, path)
        case ("DELETE", _)          => { store.remove(path); reply(ex, 204, Array.empty) }
        case _                      => reply(ex, 405, Array.empty)
      }
    }

    // ── multipart upload (Initiate / UploadPart / Complete / Abort):
    // parts accumulate invisibly; Complete assembles the client's
    // declared part list IN PART-NUMBER ORDER into one object ──

    private def initiateMpu(ex: HttpExchange, path: String): Unit = {
      val id = s"mpu-${mpuSeq.incrementAndGet()}"
      val xml = "<InitiateMultipartUploadResult>" +
        s"<Key>${xmlEscape(path)}</Key><UploadId>$id</UploadId>" +
        "</InitiateMultipartUploadResult>"
      reply(ex, 200, xml.getBytes(StandardCharsets.UTF_8))
    }

    private def putPart(ex: HttpExchange, uploadId: String,
        partNumber: String): Unit = {
      mpuParts.put(s"$uploadId/$partNumber", ex.getRequestBody.readAllBytes())
      reply(ex, 200, Array.empty, Map("ETag" -> s""""$uploadId-$partNumber""""))
    }

    private def completeMpu(ex: HttpExchange, path: String,
        uploadId: String): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val declared = (scala.xml.XML.loadString(body) \\ "PartNumber")
        .map(_.text.trim.toInt).sorted
      val parts = declared.map(n => Option(mpuParts.get(s"$uploadId/$n")))
      // real S3 rejects a duplicate PartNumber in the manifest
      // (InvalidPartOrder) rather than concatenating the part twice —
      // a buggy client must fail loudly, not get a corrupted object
      if (declared.isEmpty || declared != declared.distinct ||
          parts.exists(_.isEmpty)) {
        reply(ex, 400, Array.empty); return
      }
      val out = new java.io.ByteArrayOutputStream()
      parts.flatten.foreach(out.write)
      store.put(path, out.toByteArray)
      abortMpu(uploadId)
      reply(ex, 200, ("<CompleteMultipartUploadResult><Key>" +
        xmlEscape(path) + "</Key></CompleteMultipartUploadResult>")
        .getBytes(StandardCharsets.UTF_8))
    }

    private def abortMpu(uploadId: String): Unit = {
      val it = mpuParts.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(uploadId + "/")) it.remove()
    }

    private def put(ex: HttpExchange, path: String): Unit = {
      val copySrc = Option(ex.getRequestHeaders.getFirst("x-amz-copy-source"))
      copySrc match {
        case Some(src) =>
          val key = java.net.URLDecoder.decode(src.stripPrefix("/"), "UTF-8")
          Option(store.get(key)) match {
            case Some(bytes) =>
              store.put(path, bytes)
              reply(ex, 200, "<CopyObjectResult/>".getBytes(StandardCharsets.UTF_8))
            case None => reply(ex, 404, Array.empty)
          }
        case None =>
          store.put(path, ex.getRequestBody.readAllBytes())
          reply(ex, 200, Array.empty)
      }
    }

    private def get(ex: HttpExchange, path: String): Unit =
      Option(store.get(path)) match {
        case None => reply(ex, 404, Array.empty)
        case Some(bytes) =>
          Option(ex.getRequestHeaders.getFirst("Range")) match {
            case Some(r) if r.startsWith("bytes=") =>
              val Array(a, b) = r.stripPrefix("bytes=").split("-", 2)
              val from = a.toLong
              val to = if (b.isEmpty) bytes.length - 1L
                       else math.min(b.toLong, bytes.length - 1L)
              if (from > to) reply(ex, 416, Array.empty)
              else reply(ex, 206,
                java.util.Arrays.copyOfRange(bytes, from.toInt, to.toInt + 1),
                Map("Content-Range" -> s"bytes $from-$to/${bytes.length}"))
            case _ => reply(ex, 200, bytes)
          }
      }

    /** ListObjectsV2, path-style: bucket from the path, prefix and
      * optional `delimiter=/` from the query. */
    private def list(ex: HttpExchange, bucket: String, query: String): Unit = {
      val params = query.split("&").iterator.map(_.split("=", 2))
        .collect { case Array(k, v) =>
          k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      val prefix = params.getOrElse("prefix", "")
      val delimited = params.get("delimiter").contains("/")
      val full = s"$bucket/$prefix"
      val keys = store.keySet().iterator()
      val contents = Seq.newBuilder[(String, Int)]
      val prefixes = scala.collection.mutable.SortedSet.empty[String]
      while (keys.hasNext) {
        val k = keys.next()
        if (k.startsWith(full)) {
          val rest = k.stripPrefix(s"$bucket/")
          val tail = rest.stripPrefix(prefix)
          if (delimited && tail.contains("/"))
            prefixes += prefix + tail.takeWhile(_ != '/') + "/"
          else contents += rest -> store.get(k).length
        }
      }
      val xml = new StringBuilder
      xml ++= """<?xml version="1.0" encoding="UTF-8"?>"""
      xml ++= s"<ListBucketResult><Name>${xmlEscape(bucket)}</Name>"
      xml ++= s"<Prefix>${xmlEscape(prefix)}</Prefix><IsTruncated>false</IsTruncated>"
      contents.result().sortBy(_._1).foreach { case (k, len) =>
        xml ++= s"<Contents><Key>${xmlEscape(k)}</Key><Size>$len</Size></Contents>"
      }
      prefixes.foreach { p =>
        xml ++= s"<CommonPrefixes><Prefix>${xmlEscape(p)}</Prefix></CommonPrefixes>"
      }
      xml ++= "</ListBucketResult>"
      reply(ex, 200, xml.result().getBytes(StandardCharsets.UTF_8),
        Map("Content-Type" -> "application/xml"))
    }
  }
}
