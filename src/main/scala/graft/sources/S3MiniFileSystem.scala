package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Minimal `s3a://` client: a Hadoop FileSystem speaking the
  * path-style S3 REST subset over HTTP (SURVEY §2 S10/E3). The
  * sandbox classpath carries no hadoop-aws module, so this class is
  * what `fs.s3a.impl` points at — same URIs, same conf keys
  * ([[Fetch.configureS3a]]: endpoint, access key, secret key,
  * path-style), real HTTP and real credential checking against
  * [[S3Loopback]] (or any server speaking the same subset).
  *
  * Semantics follow the object-store contract s3a documents:
  *   - objects are immutable blobs under `bucket/key`; "directories"
  *     are key prefixes, plus zero-byte `key/` markers for EMPTY dirs
  *     (mkdirs writes one; listings hide them)
  *   - create buffers at most ONE part locally: objects under one
  *     part size are a single PUT on close; larger objects roll
  *     through multipart upload (Initiate/UploadPart/Complete,
  *     `fs.s3a.multipart.size`, default 32 MiB) — real S3 caps a
  *     single PUT at 5 GB, below one 100 TB-job parquet part
  *   - open is lazy: positioned reads are ranged GETs, so a parquet
  *     footer read fetches footer bytes, not the object
  *   - rename is COPY+DELETE per key (the real S3 cost model —
  *     exactly why the committer story at 100 TB is "write to final
  *     paths + manifest commit", `graft.sinks.Sinks.writeManifest`,
  *     not rename-based committers)
  *
  * NOT a full s3a: no retries/backoff, no seek-ahead buffering, no
  * parallel part upload (parts go sequentially — bounded memory over
  * raw throughput). The point is the PLUMBING — URIs, SECRET, server
  * protocol, multipart shape — gated end-to-end offline.
  */
class S3MiniFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var endpoint: String = _
  private var accessKey: String = _
  private var secretKey: String = _
  private var workDir: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"${uri.getScheme}://${uri.getAuthority}")
    endpoint = conf.get("fs.s3a.endpoint")
    require(endpoint != null, "fs.s3a.endpoint is required")
    if (!endpoint.contains("://")) endpoint = s"http://$endpoint"
    accessKey = conf.get("fs.s3a.access.key", "")
    secretKey = conf.get("fs.s3a.secret.key", "")
    workDir = new Path(fsUri.toString + "/")
  }

  override def getScheme: String = "s3a"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  private def bucket: String = fsUri.getAuthority

  /** Object key of `p` (no leading slash, no bucket). Empty = root. */
  private def keyOf(p: Path): String =
    makeQualified(p).toUri.getPath.stripPrefix("/")

  // ── HTTP plumbing ──────────────────────────────────────────────

  /** Percent-encode an object key for the request line: each
    * '/'-separated segment is URL-encoded so spaces, '%', '+', '#',
    * '?' and non-ASCII (e.g. Hive partition values `col=a b/`)
    * survive both HTTP transport and the HMAC signing, while the
    * path structure — slashes, including a trailing dir-marker
    * slash — is preserved. The server decodes via `URI.getPath`. */
  private def encKey(key: String): String =
    key.split("/", -1).map(enc).mkString("/")

  private def request(method: String, key: String, query: String = "",
      body: Array[Byte] = null, headers: Map[String, String] = Map.empty)
      : (Int, Array[Byte], Map[String, String]) = {
    val rawPath = s"/$bucket/${encKey(key)}"
    val url = new URL(endpoint + rawPath + (if (query.isEmpty) "" else s"?$query"))
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setRequestProperty("Authorization",
      S3Loopback.authHeader(accessKey, secretKey, method, rawPath))
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    if (body != null) {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(body.length)
      val out = c.getOutputStream
      try out.write(body) finally out.close()
    } else if (method == "PUT") {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(0)
      c.getOutputStream.close()
    }
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val bytes = if (in == null) Array.empty[Byte]
                else try in.readAllBytes() finally in.close()
    import scala.jdk.CollectionConverters._
    val hdrs = c.getHeaderFields.asScala.collect {
      case (k, vs) if k != null && !vs.isEmpty => k -> vs.get(0)
    }.toMap
    (code, bytes, hdrs)
  }

  private def head(key: String): Option[Long] = {
    val (code, _, hdrs) = request("HEAD", key)
    if (code != 200) None
    else Some(hdrs.collectFirst {
      // real S3 answers Content-Length; the loopback's JDK server can
      // only pass the true length through an explicit header
      case (k, v) if k.equalsIgnoreCase("x-graft-content-length") => v.toLong
    }.orElse(hdrs.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Length") && v.toLong > 0 => v.toLong
    }).getOrElse(0L))
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** One ListObjectsV2 page (the loopback never truncates):
    * (relative keys with sizes, common prefixes). */
  private def listV2(prefix: String, delimiter: Boolean)
      : (Seq[(String, Long)], Seq[String]) = {
    val q = s"list-type=2&prefix=${enc(prefix)}" +
      (if (delimiter) "&delimiter=%2F" else "")
    val (code, bytes, _) = request("GET", "", q)
    require(code == 200, s"list $prefix failed: HTTP $code")
    val xml = scala.xml.XML.loadString(new String(bytes, "UTF-8"))
    val contents = (xml \ "Contents").map { c =>
      ((c \ "Key").text, (c \ "Size").text.toLong)
    }
    val prefixes = (xml \ "CommonPrefixes").map(p => (p \ "Prefix").text)
    (contents, prefixes)
  }

  private def fileStatus(p: Path, len: Long, isDir: Boolean): FileStatus =
    new FileStatus(len, isDir, 1, 64L * 1024 * 1024, 0L, makeQualified(p))

  // ── FileSystem contract ────────────────────────────────────────

  override def getFileStatus(p: Path): FileStatus = {
    val key = keyOf(p)
    if (key.isEmpty) return fileStatus(p, 0, isDir = true) // bucket root
    head(key) match {
      case Some(len) => fileStatus(p, len, isDir = false)
      case None =>
        // dir if its marker or ANY key under the prefix exists
        if (head(key + "/").isDefined) fileStatus(p, 0, isDir = true)
        else {
          val (contents, prefixes) = listV2(key + "/", delimiter = true)
          if (contents.nonEmpty || prefixes.nonEmpty)
            fileStatus(p, 0, isDir = true)
          else throw new java.io.FileNotFoundException(p.toString)
        }
    }
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val st = getFileStatus(p) // FileNotFoundException propagates
    if (!st.isDirectory) return Array(st)
    val key = keyOf(p)
    val prefix = if (key.isEmpty) "" else key + "/"
    val (contents, prefixes) = listV2(prefix, delimiter = true)
    val files = contents.collect {
      // hide the empty-dir marker itself (relative tail is empty)
      case (k, len) if k != prefix =>
        fileStatus(new Path(s"$fsUri/$k"), len, isDir = false)
    }
    val dirs = prefixes.map(pr =>
      fileStatus(new Path(s"$fsUri/${pr.stripSuffix("/")}"), 0, isDir = true))
    (files ++ dirs).toArray
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    val key = keyOf(p)
    if (key.nonEmpty) {
      val (code, _, _) = request("PUT", key + "/", body = Array.empty)
      require(code == 200, s"mkdirs $p failed: HTTP $code")
    }
    true
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(p)
    require(key.nonEmpty, "cannot create the bucket root")
    if (!overwrite && head(key).isDefined)
      throw new FileAlreadyExistsException(p.toString)
    // getLongBytes: hadoop's own default for this key is "64M"
    val partSize = getConf.getLongBytes("fs.s3a.multipart.size", 32L * 1024 * 1024)
    new FSDataOutputStream(new S3MiniOutputStream(key, partSize), statistics)
  }

  /** Buffered writer with MULTIPART upload above one part size: an
    * object that fits in a single part is one PUT on close (no extra
    * round-trips for the common small-file case); anything larger
    * rolls 32 MiB parts (`fs.s3a.multipart.size`) through
    * InitiateMultipartUpload / UploadPart / CompleteMultipartUpload —
    * the real-S3 requirement for objects past the 5 GB single-PUT
    * cap, which a 100 TB conversion's multi-GB parquet parts exceed.
    * Local memory is bounded by ONE part regardless of object size. */
  private class S3MiniOutputStream(key: String, partSize: Long)
      extends OutputStream {
    private val buf = new ByteArrayOutputStream(64 * 1024)
    private var uploadId: String = null
    private var parts = Vector.empty[(Int, String)] // partNumber -> ETag
    private var closed = false

    private def rollPart(): Unit = {
      if (uploadId == null) {
        val (code, bytes, _) = request("POST", key, "uploads", body = Array.empty)
        require(code == 200, s"initiate multipart $key failed: HTTP $code")
        uploadId = (scala.xml.XML.loadString(new String(bytes, "UTF-8"))
          \\ "UploadId").text
        require(uploadId.nonEmpty, s"initiate multipart $key: no UploadId")
      }
      val n = parts.size + 1
      try {
        val (code, _, hdrs) = request("PUT", key,
          s"partNumber=$n&uploadId=${enc(uploadId)}", body = buf.toByteArray)
        require(code == 200, s"upload part $n of $key failed: HTTP $code")
        val etag = hdrs.collectFirst {
          case (k, v) if k.equalsIgnoreCase("ETag") => v
        }.getOrElse(s"part-$n")
        parts :+= (n -> etag)
      } catch {
        case e: Throwable =>
          abortQuietly()
          throw e
      }
      buf.reset()
    }

    private def maybeRoll(): Unit = if (buf.size >= partSize) rollPart()

    override def write(b: Int): Unit = { buf.write(b); maybeRoll() }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off; var l = len
      while (l > 0) { // chunk so the buffer never exceeds one part
        val room = math.min(math.max(partSize - buf.size, 1L),
          Int.MaxValue.toLong).toInt
        val take = math.min(l, room)
        buf.write(b, o, take); o += take; l -= take
        maybeRoll()
      }
    }

    // Idempotent: Hadoop's wrappers occasionally double-close a
    // stream; re-sending Complete after the server purged the parts
    // would 400. A failed part/Complete ABORTS the upload (best
    // effort) so the server never accumulates orphaned parts — real
    // S3 bills for those until a lifecycle rule reaps them.
    override def close(): Unit = {
      if (closed) return
      closed = true
      if (uploadId == null) { // never crossed a part: plain PUT
        val (code, _, _) = request("PUT", key, body = buf.toByteArray)
        require(code == 200, s"PUT $key failed: HTTP $code")
      } else {
        try {
          if (buf.size > 0) rollPart()
          val xml = new StringBuilder("<CompleteMultipartUpload>")
          parts.foreach { case (n, e) =>
            xml ++= s"<Part><PartNumber>$n</PartNumber><ETag>$e</ETag></Part>" }
          xml ++= "</CompleteMultipartUpload>"
          val (code, _, _) = request("POST", key, s"uploadId=${enc(uploadId)}",
            body = xml.result().getBytes(java.nio.charset.StandardCharsets.UTF_8))
          require(code == 200, s"complete multipart $key failed: HTTP $code")
        } catch {
          case e: Throwable =>
            abortQuietly()
            throw e
        }
      }
    }

    private def abortQuietly(): Unit = if (uploadId != null) {
      try request("DELETE", key, s"uploadId=${enc(uploadId)}")
      catch { case _: Throwable => () } // abort is best-effort cleanup
    }
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append is not an object-store op")

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(p)
    val len = head(key).getOrElse(
      throw new java.io.FileNotFoundException(p.toString))
    new FSDataInputStream(new S3MiniInputStream(key, len))
  }

  /** Seekable + PositionedReadable over ranged GETs; sequential reads
    * stream from one ranged connection until the next seek. */
  private class S3MiniInputStream(key: String, len: Long)
      extends FSInputStream {
    private var pos: Long = 0L
    private var stream: InputStream = _
    private var streamPos: Long = -1L

    private def ensureStream(): InputStream = {
      if (stream == null || streamPos != pos) {
        if (stream != null) stream.close()
        if (pos >= len) throw new EOFException(s"read past end of $key")
        val rawPath = s"/$bucket/${encKey(key)}"
        val url = new URL(endpoint + rawPath)
        val c = url.openConnection().asInstanceOf[HttpURLConnection]
        c.setRequestProperty("Authorization",
          S3Loopback.authHeader(accessKey, secretKey, "GET", rawPath))
        c.setRequestProperty("Range", s"bytes=$pos-")
        val code = c.getResponseCode
        require(code == 200 || code == 206, s"GET $key@$pos failed: HTTP $code")
        val raw = c.getInputStream
        // Only 206 proves the server honored Range. A server that
        // ignored it answers 200 with the FULL body — skip to pos so
        // a positioned read (parquet footer) never misreads offset 0
        // bytes as offset-pos bytes.
        if (code == 200 && pos > 0) {
          var toSkip = pos
          while (toSkip > 0) {
            val skipped = raw.skip(toSkip)
            if (skipped > 0) toSkip -= skipped
            else if (raw.read() >= 0) toSkip -= 1
            else throw new EOFException(s"$key shorter than $pos on 200 fallback")
          }
        }
        stream = new java.io.BufferedInputStream(raw, 128 * 1024)
        streamPos = pos
      }
      stream
    }

    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > len)
        throw new EOFException(s"seek($newPos) outside [0, $len] of $key")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      if (pos >= len) return -1
      val b = ensureStream().read()
      if (b >= 0) { pos += 1; streamPos = pos }
      b
    }

    override def read(b: Array[Byte], off: Int, dlen: Int): Int = {
      if (pos >= len) return -1
      val n = ensureStream().read(b, off, dlen)
      if (n > 0) { pos += n; streamPos = pos }
      n
    }

    override def close(): Unit = if (stream != null) stream.close()
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    val dstStatus = try Some(getFileStatus(dst))
                    catch { case _: java.io.FileNotFoundException => None }
    // HDFS semantics: renaming onto an existing directory moves the
    // source INTO it
    val target =
      if (dstStatus.exists(_.isDirectory)) new Path(dst, src.getName)
      else dst
    val targetKey = keyOf(target)
    head(srcKey) match {
      case Some(_) => copyDelete(srcKey, targetKey); true
      case None =>
        // directory rename: every key under the prefix moves (the
        // non-delimited listing already includes any `srcKey/` marker)
        val (contents, _) = listV2(srcKey + "/", delimiter = false)
        if (contents.isEmpty) false
        else {
          contents.map(_._1).foreach { k =>
            copyDelete(k, targetKey + k.stripPrefix(srcKey))
          }
          true
        }
    }
  }

  private def copyDelete(srcKey: String, dstKey: String): Unit = {
    val (code, _, _) = request("PUT", dstKey,
      // encoded like the request line; the server URL-decodes it
      headers = Map("x-amz-copy-source" -> s"/$bucket/${encKey(srcKey)}"))
    require(code == 200, s"COPY $srcKey -> $dstKey failed: HTTP $code")
    request("DELETE", srcKey)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val key = keyOf(p)
    head(key) match {
      case Some(_) => request("DELETE", key); true
      case None =>
        val (contents, _) = listV2(key + "/", delimiter = false)
        if (contents.isEmpty) false
        else if (!recursive && contents.exists(_._1 != key + "/"))
          throw new java.io.IOException(s"$p is a non-empty directory")
        else {
          contents.map(_._1).foreach(k => request("DELETE", k))
          true
        }
    }
  }
}
