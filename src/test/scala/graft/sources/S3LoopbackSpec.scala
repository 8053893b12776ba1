package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The s3a claim, gated behaviorally: [[S3MiniFileSystem]] (our
  * `fs.s3a.impl`) against [[S3Loopback]] (path-style S3 REST in
  * process). Pins the FileSystem contract pieces Spark's write/read
  * paths actually use — status/list/markers, buffered create,
  * ranged-GET seeks, COPY+DELETE renames of files AND directory
  * trees, recursive delete, credential rejection — then a real
  * Spark parquet round-trip over `s3a://` URIs. */
class S3LoopbackSpec extends AnyFunSuite with SparkTestBase {

  private def withS3[A](body: (FileSystem, String) => A): A =
    S3Loopback.withServer("graft", "s3secret") { port =>
      val conf = spark.sparkContext.hadoopConfiguration
      conf.set("fs.s3a.impl", classOf[S3MiniFileSystem].getName)
      conf.set("fs.s3a.impl.disable.cache", "true")
      graft.sources.Fetch.configureS3a(spark, s"http://127.0.0.1:$port",
        "graft", "s3secret")
      val base = "s3a://gate"
      val fs = new Path(base).getFileSystem(conf)
      try body(fs, base) finally fs.close()
    }

  test("filesystem contract: status, markers, create, seek, rename, delete") {
    withS3 { (fs, base) =>
      // bucket root is a directory
      assert(fs.getFileStatus(new Path(base)).isDirectory)
      // empty dir via marker
      assert(fs.mkdirs(new Path(s"$base/d1")))
      assert(fs.getFileStatus(new Path(s"$base/d1")).isDirectory)
      assert(fs.listStatus(new Path(s"$base/d1")).isEmpty)
      // create + read back, seek + positioned read
      val f = new Path(s"$base/d1/a.bin")
      val out = fs.create(f)
      val payload = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
      out.write(payload); out.close()
      assert(fs.getFileStatus(f).getLen === 100000L)
      val in = fs.open(f)
      val head3 = new Array[Byte](3)
      in.readFully(0, head3)
      assert(head3.toSeq === payload.take(3).toSeq)
      in.seek(99997L)
      val tail3 = new Array[Byte](3)
      in.readFully(tail3, 0, 3)
      assert(tail3.toSeq === payload.takeRight(3).toSeq)
      in.close()
      // implicit directories: a deep key makes every ancestor a dir
      val g = fs.create(new Path(s"$base/d2/sub/b.bin"))
      g.write(7); g.close()
      assert(fs.getFileStatus(new Path(s"$base/d2")).isDirectory)
      assert(fs.listStatus(new Path(s"$base/d2")).map(_.getPath.getName).toSeq
        === Seq("sub"))
      // directory rename moves the whole tree
      assert(fs.rename(new Path(s"$base/d2"), new Path(s"$base/d3")))
      assert(fs.exists(new Path(s"$base/d3/sub/b.bin")))
      assert(!fs.exists(new Path(s"$base/d2")))
      // file rename INTO an existing directory (HDFS semantics)
      assert(fs.rename(f, new Path(s"$base/d3")))
      assert(fs.exists(new Path(s"$base/d3/a.bin")))
      // recursive delete; non-recursive refuses a non-empty dir
      intercept[java.io.IOException](fs.delete(new Path(s"$base/d3"), false))
      assert(fs.delete(new Path(s"$base/d3"), true))
      assert(!fs.exists(new Path(s"$base/d3")))
      // deleting a missing path answers false, not an error
      assert(!fs.delete(new Path(s"$base/nope"), true))
    }
  }

  test("a wrong secret is a 403, not silent data") {
    withS3 { (fs, base) =>
      val out = fs.create(new Path(s"$base/x.bin")); out.write(1); out.close()
      val conf = new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration)
      conf.set("fs.s3a.secret.key", "WRONG")
      val bad = new Path(base).getFileSystem(conf)
      try {
        val e = intercept[Exception](bad.getFileStatus(new Path(s"$base/x.bin")))
        // HEAD under a bad MAC answers 403 -> not-found probe -> LIST
        // fails loudly with the status code
        assert(e.getMessage.contains("403"), e.getMessage)
      } finally bad.close()
    }
  }

  test("multipart upload: a write past one part size rolls parts and assembles exactly") {
    withS3 { (fs, base) =>
      // shrink the part size so a 2.5 MB object exercises the real
      // Initiate/UploadPart/Complete path (3 parts: 1M + 1M + 0.5M)
      fs.getConf.setLong("fs.s3a.multipart.size", 1024 * 1024)
      val f = new Path(s"$base/mpu/big.bin")
      val payload = Array.tabulate[Byte](2 * 1024 * 1024 + 512 * 1024)(
        i => ((i * 31 + 7) % 251).toByte)
      val out = fs.create(f)
      out.write(payload, 0, 700000)          // straddles a part boundary
      for (i <- 700000 until payload.length) out.write(payload(i))
      out.close()
      assert(fs.getFileStatus(f).getLen === payload.length.toLong)
      val in = fs.open(f)
      val back = new Array[Byte](payload.length)
      in.readFully(0, back); in.close()
      assert(java.util.Arrays.equals(back, payload),
        "assembled object must be byte-identical across part seams")
      // under-one-part objects still take the single-PUT path
      val small = fs.create(new Path(s"$base/mpu/small.bin"))
      small.write(Array[Byte](1, 2, 3)); small.close()
      assert(fs.getFileStatus(new Path(s"$base/mpu/small.bin")).getLen === 3L)
    }
  }

  test("multipart close is idempotent: Hadoop's occasional double-close is a no-op") {
    withS3 { (fs, base) =>
      fs.getConf.setLong("fs.s3a.multipart.size", 1024 * 1024)
      val f = new Path(s"$base/mpu/twice.bin")
      val payload = Array.tabulate[Byte](1536 * 1024)(i => (i % 127).toByte)
      val out = fs.create(f)
      out.write(payload); out.close()
      out.close() // second close must NOT re-send Complete (server would 400)
      val in = fs.open(f)
      val back = new Array[Byte](payload.length)
      in.readFully(0, back); in.close()
      assert(java.util.Arrays.equals(back, payload))
    }
  }

  test("a Complete manifest with a duplicate PartNumber is rejected, never concatenated twice") {
    // direct REST exercise of the loopback's S3 semantics: a buggy
    // client declaring part 1 twice must get a 400, not a silently
    // doubled object (real S3: InvalidPartOrder)
    graft.sources.S3Loopback.withServer("graft", "s") { port =>
      def req(method: String, pathQ: String, body: Array[Byte]) = {
        val u = java.net.URI.create(s"http://127.0.0.1:$port$pathQ").toURL
        val c = u.openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod(method)
        // the loopback authenticates via the keyed-HMAC header the
        // mini filesystem sends (MAC over method + raw path)
        c.setRequestProperty("Authorization", graft.sources.S3Loopback
          .authHeader("graft", "s", method, pathQ.takeWhile(_ != '?')))
        if (body.nonEmpty || method == "POST" || method == "PUT") {
          c.setDoOutput(true); c.getOutputStream.write(body)
        }
        val code = c.getResponseCode
        val bytes = try {
          val s = if (code < 400) c.getInputStream else c.getErrorStream
          if (s == null) Array.empty[Byte] else s.readAllBytes()
        } finally c.disconnect()
        (code, bytes)
      }
      val (ic, ib) = req("POST", "/gate/dup.bin?uploads", Array.empty)
      assert(ic === 200)
      val uid = (scala.xml.XML.loadString(new String(ib, "UTF-8")) \\ "UploadId").text
      assert(req("PUT", s"/gate/dup.bin?partNumber=1&uploadId=$uid",
        "AAAA".getBytes)._1 === 200)
      val manifest = ("<CompleteMultipartUpload>" +
        "<Part><PartNumber>1</PartNumber><ETag>e</ETag></Part>" +
        "<Part><PartNumber>1</PartNumber><ETag>e</ETag></Part>" +
        "</CompleteMultipartUpload>").getBytes("UTF-8")
      assert(req("POST", s"/gate/dup.bin?uploadId=$uid", manifest)._1 === 400)
    }
  }

  test("keys with spaces, percent, plus, hash survive transport and signing") {
    withS3 { (fs, base) =>
      // Hive-style partition values are the production shape of this
      val f = new Path(s"$base/part/col=a b/100%25+c#d.bin")
      val out = fs.create(f)
      out.write(Array[Byte](9, 8, 7)); out.close()
      assert(fs.exists(f))
      val in = fs.open(f)
      val b = new Array[Byte](3); in.readFully(0, b); in.close()
      assert(b.toSeq === Seq[Byte](9, 8, 7))
      val dirs = fs.listStatus(new Path(s"$base/part")).map(_.getPath.getName)
      assert(dirs.toSeq === Seq("col=a b"))
      assert(fs.rename(f, new Path(s"$base/part/col=a b/renamed %.bin")))
      assert(fs.exists(new Path(s"$base/part/col=a b/renamed %.bin")))
      assert(fs.delete(new Path(s"$base/part"), true))
    }
  }

  test("positioned reads survive a server that ignores Range (200 fallback skips to pos)") {
    // a minimal unauthenticated server: HEAD answers the length
    // header the client reads; GET always answers 200 FULL BODY
    val payload = Array.tabulate[Byte](50000)(i => (i % 127).toByte)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      if (ex.getRequestMethod == "HEAD") {
        ex.getResponseHeaders.set("x-graft-content-length", payload.length.toString)
        ex.sendResponseHeaders(200, -1)
      } else {
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
      }
      ex.close()
    })
    server.start()
    try {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.set("fs.s3a.impl", classOf[S3MiniFileSystem].getName)
      conf.set("fs.s3a.impl.disable.cache", "true")
      conf.set("fs.s3a.endpoint",
        s"http://127.0.0.1:${server.getAddress.getPort}")
      conf.set("fs.s3a.access.key", "any")
      conf.set("fs.s3a.secret.key", "any") // the dumb server never checks
      val fs = new Path("s3a://b").getFileSystem(conf)
      try {
        val in = fs.open(new Path("s3a://b/k.bin"))
        val tail = new Array[Byte](5)
        in.readFully(49995L, tail)
        assert(tail.toSeq === payload.takeRight(5).toSeq,
          "a 200 reply to a ranged GET must be skipped to pos, not misread")
        in.close()
      } finally fs.close()
    } finally server.stop(0)
  }

  test("spark parquet round-trips over s3a:// (write, commit renames, ranged footer reads)") {
    withS3 { (_, base) =>
      val df = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      graft.sinks.Sinks.writeZstd(df.repartition(2), s"$base/t.parquet")
      val back = spark.read.parquet(s"$base/t.parquet")
      assert(back.count() === df.count())
      assert(back.selectExpr("sum(o_orderkey)").head().getLong(0) ===
        df.selectExpr("sum(o_orderkey)").head().getLong(0))
      // versioned+latest double-write and the existence probe (S11)
      assert(graft.sinks.Sinks.writeVersioned(spark, df, s"$base/out", "r1", "7"))
      assert(!graft.sinks.Sinks.writeVersioned(spark, df, s"$base/out", "r1", "7"),
        "existence probe must skip the second write")
      assert(spark.read.parquet(s"$base/out/r1.parquet").count() === df.count())
    }
  }
}
