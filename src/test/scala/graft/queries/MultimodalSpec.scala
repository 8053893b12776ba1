package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The codec-swap contract: the multimodal decode pipeline's plan is
  * a property of the plumbing, not the codec. */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** A second codec with a genuinely different body — what a real
    * libjpeg/ffmpeg adapter would look like shape-wise. */
  private object AltCodec extends Multimodal.BlobCodec {
    override def decode(blob: Array[Byte]): (Int, Int) = {
      var acc = 17
      var i = 4
      while (i < blob.length) { acc = acc * 31 + (blob(i) & 0xff); i += 1 }
      (1 + math.abs(acc) % 1024, 1 + math.abs(acc / 7) % 1024)
    }
  }

  test("swapping the codec changes ZERO plan shape (and the plan is map-only)") {
    val stub = Multimodal.decodePipeline(spark, sf, Multimodal.StubCodec)
    val alt = Multimodal.decodePipeline(spark, sf, AltCodec)
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
    assert(shape(stub) === shape(alt))
    // map-only: decode never shuffles the corpus
    assert(!shape(stub).exists(_.contains("Exchange")), shape(stub).mkString(", "))
    // both execute: same ids, codec-dependent values
    val a = stub.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val b = alt.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(a.keySet === b.keySet)
    assert(a !== b)
  }

  test("stub codec agrees with the oracle on degenerate payloads (missing bytes read as 0)") {
    // DuckDB's ascii(substr(p, n, 1)) is 0 past the end; the stub must
    // match rather than crash on a doc with < 2 payload bytes
    assert(Multimodal.StubCodec.decode(Array[Byte](1, 2, 3, 4)) === (1, 1))
    assert(Multimodal.StubCodec.decode(Array[Byte](1, 2, 3, 4, 65)) === (1 + 65 % 64, 1))
  }

  test("m05 byte_features kernel equals the retired SQL-lambda formulation") {
    val kernel = Multimodal.all("m05_resize_features").fn(spark, sf)
      .collect().map(_.toSeq).toSet
    val lambda = Multimodal.resizeFeaturesSqlLambda(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(kernel === lambda)
    assert(kernel.nonEmpty)
  }

  test("byte_features kernel: high bytes, short payloads, and hist bins") {
    import graft.functions.ByteFeatures
    // bytes >= 128 land in hist bins 2/3 (the SQL form never sees them
    // — ASCII testdata — so pin the raw-byte semantics here)
    val r = ByteFeatures.compute(Array[Byte](0, 0, 0, 0, // tag
      10, 70, -127, -1)) // 10, 70, 129, 255 → bins 0,1,2,3
    assert(r.getLong(1) === 4L) // n_bytes
    assert(r.getLong(2) === (10L + 70 + 129 + 255) * 10000 / 4)
    assert(r.getUTF8String(3).toString === "1,1,1,1")
    // resized = offsets 4, 8 → here only offset 4 exists (byte 10)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(Array[Byte](10)).map("%02x".format(_)).mkString
    assert(r.getUTF8String(0).toString === md)
    // ≤ 4 bytes after nothing: total, not crashing
    assert(ByteFeatures.compute(Array[Byte](1, 2, 3, 4)) === null)
    assert(ByteFeatures.compute(Array.emptyByteArray) === null)
  }

  test("m07 perceptual near-dup: pairs verified, content-based across container formats") {
    val rows = Multimodal.all("m07_phash_neardup").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "no near-dup media pairs found on planted data")
    rows.foreach { case (d1, d2, h) =>
      assert(d1 < d2, s"unordered pair ($d1, $d2)")
      assert(h >= 0 && h <= 3, s"unverified hamming $h for ($d1, $d2)")
    }
    // the magic bytes are excluded from the grams, so near-dup TEXT
    // behind DIFFERENT container formats must still collide — the
    // cross-format property that distinguishes this from m06's
    // exact frame dedup (modality = doc_id % 3 by construction)
    assert(rows.exists { case (d1, d2, _) => d1 % 3 != d2 % 3 },
      "no cross-format pair: the hash is seeing container bytes")
    // soundness direction (the converse does not hold — simhash is
    // an order-independent lossy vote): equal byte-4-gram MULTISETS
    // must hash identically, so every such planted pair appears at
    // hamming 0
    val grams = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1)
        r.getLong(0) -> (if (t.length < 4) Map.empty[String, Int]
          else t.sliding(4).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
      }.toMap
    val found = rows.map(p => (p._1, p._2)).toSet
    for {
      (d1, g1) <- grams; (d2, g2) <- grams
      if d1 < d2 && g1.nonEmpty && g1 == g2
    } assert(found.contains((d1, d2)) &&
        rows.find(p => p._1 == d1 && p._2 == d2).get._3 == 0,
      s"equal gram multisets ($d1, $d2) missing or nonzero")
  }

  test("m08 real decode: PNG stats re-derived from the pixel formula, not from ImageIO") {
    // the fixtures' PNG pixels follow (37x+11y, 59x+3y, 17x+29y) % 256
    // and PNG is lossless — so the decoded stats are predictable
    // WITHOUT running the decoder, a genuinely independent oracle
    def formulaStats(w: Int, h: Int): (Long, Long) = {
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += (37 * x + 11 * y) % 256 + (59 * x + 3 * y) % 256 + (17 * x + 29 * y) % 256
      (w.toLong * h, sum * 10000 / (3L * w * h))
    }
    val got = Multimodal.all("m08_image_decode").fn(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.size === 4)
    for ((id, (w, h)) <- Seq(0L -> (6, 4), 1L -> (16, 9), 2L -> (1, 1))) {
      val (npx, bp) = formulaStats(w, h)
      assert(got(id) === (("png", w, h, npx, bp)), s"img $id")
    }
    // JPEG is lossy: dims exact, mean within 2% of the formula
    val (jn, jbp) = formulaStats(8, 8)
    val (jf, jw, jh, jnpx, jgot) = got(3L)
    assert((jf, jw, jh, jnpx) === (("jpg", 8, 8, jn)))
    assert(math.abs(jgot - jbp) * 50 < jbp, s"jpeg mean drifted: $jgot vs $jbp")
  }

  test("m08 ImageIoCodec runs through the m04 BlobCodec seam (dims only, same contract)") {
    val dims = Multimodal.fixtureImages(spark).collect()
      .map(r => r.getLong(0) -> Multimodal.ImageIoCodec.decode(r.getAs[Array[Byte]](2))).toMap
    assert(dims === Map(0L -> ((6, 4)), 1L -> ((16, 9)), 2L -> ((1, 1)), 3L -> ((8, 8))))
  }

  test("decode output schema is pinned regardless of codec") {
    val df = Multimodal.decodePipeline(spark, sf, AltCodec)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("doc_id", "long"), ("width", "integer"),
        ("height", "integer"), ("n_px", "integer")))
  }

  test("m09 real WAV decode: stats re-derived from the sample formula, not from javax.sound") {
    // the committed clips are PCM (lossless), so every decoded int16
    // must equal ((a·i + b·i² + c) mod 65521) − 32760 exactly; this
    // recomputes the stats from the formula alone — if the container
    // parse, endianness, or channel handling were wrong, peak/mean
    // could not agree
    val params = Map( // wav_id -> (rate, ch, frames, a, b, c)
      0L -> ((8000, 1, 1200, 37L, 11L, 7001L)),
      1L -> ((16000, 2, 800, 59L, 3L, 12345L)),
      2L -> ((11025, 1, 1, 17L, 29L, 23456L)))
    val got = Multimodal.all("m09_wav_decode").fn(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got.keySet === params.keySet)
    params.foreach { case (id, (rate, ch, frames, a, b, c)) =>
      val ss = (0L until frames.toLong * ch)
        .map(i => ((a * i + b * i * i + c) % 65521L - 32760L))
      val want = (rate, ch, frames.toLong,
        ss.map(math.abs).max.toInt, ss.map(math.abs).sum / ss.length)
      assert(got(id) === want, s"clip $id: ${got(id)} vs formula $want")
    }
  }

  test("m10 framed features: re-derived from the sample formula; tail frames dropped") {
    val params = Map( // wav_id -> (ch, frames, a, b, c)
      0L -> ((1, 1200, 37L, 11L, 7001L)),
      1L -> ((2, 800, 59L, 3L, 12345L)),
      2L -> ((1, 1, 17L, 29L, 23456L)))
    val expected = params.flatMap { case (id, (ch, frames, a, b, c)) =>
      val ch0 = (0L until frames.toLong * ch)
        .map(i => ((a * i + b * i * i + c) % 65521L - 32760L))
        .grouped(ch).map(_.head).toVector
      (0 until ch0.length / 160).map { f =>
        val w = ch0.slice(f * 160, (f + 1) * 160)
        (id, f) -> ((w.map(v => v * v).sum / 160,
          w.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong,
          w.map(math.abs).max))
      }
    }
    val got = Multimodal.all("m10_audio_features").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // the single-frame clip must emit nothing (tail-drop contract),
    // and the multi-frame clips must emit exactly n/160 frames
    assert(!got.keySet.exists(_._1 == 2L), "wav2 leaked a partial frame")
    assert(got.keys.count(_._1 == 0L) === 7 && got.keys.count(_._1 == 1L) === 5)
  }

  test("m11 dHash: PNGs re-derived from the formula; JPEG re-encode stays Hamming-near") {
    def formulaHash(w: Int, h: Int): Long = {
      def gray(gx: Int, gy: Int): Int = {
        val x = gx * w / 9; val y = gy * h / 8
        ((37 * x + 11 * y) % 256 + (59 * x + 3 * y) % 256 + (17 * x + 29 * y) % 256) / 3
      }
      (for (y <- 0 until 8; x <- 0 until 8 if gray(x + 1, y) > gray(x, y))
        yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
    }
    val got = Multimodal.all("m11_image_dhash").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    for ((id, (w, h)) <- Seq(0L -> (6, 4), 1L -> (16, 9), 2L -> (1, 1)))
      assert(got(id) === (("png", f"${formulaHash(w, h)}%016x")), s"img $id")
    // the lossy re-encode of the same content must stay perceptually
    // close to the lossless formula hash — the property m07's
    // byte-level fingerprint cannot have (the FILES share no bytes)
    val jpegHash = java.lang.Long.parseUnsignedLong(got(3L)._2, 16)
    val hamming = java.lang.Long.bitCount(jpegHash ^ formulaHash(8, 8))
    assert(hamming <= 8, s"JPEG drifted $hamming bits from the content hash")
    // and the hashes genuinely discriminate across different content
    assert(got.values.map(_._2).toSet.size === 4)
  }

  test("m12 shot boundaries equal the formula-derived distances; cuts land exactly at scene changes") {
    // re-derive every frame hash from the pixel formula — no ImageIO,
    // so the golden oracle is proven decoder-independent
    def hashOf(v: Long, f: Int): Long = {
      def gray(gx: Int, gy: Int): Int =
        Multimodal.framePixel(v, f, gx * 64 / 9, gy * 48 / 8)
      (for (y <- 0 until 8; x <- 0 until 8 if gray(x + 1, y) > gray(x, y))
        yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
    }
    val expected = (for (v <- Seq(0L, 1L); f <- 0 until 8) yield {
      val dist =
        if (f == 0) -1
        else java.lang.Long.bitCount(hashOf(v, f) ^ hashOf(v, f - 1))
      ((v, f), (dist, f > 0 && dist > 10))
    }).toMap
    val got = Multimodal.all("m12_shot_boundary").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getBoolean(3)))).toMap
    assert(got === expected)
    // exactly one cut per video, at the designed scene change
    val cuts = got.collect { case ((v, f), (_, true)) => (v, f) }.toSet
    assert(cuts === Set((0L, 4), (1L, 5)))
    // within-scene brightness drift stays well under the threshold
    got.foreach { case ((v, f), (dist, cut)) =>
      if (!cut && f > 0) assert(dist <= 8, s"drift too large at $v/$f: $dist")
    }
  }

  test("m13 audio fingerprints: formula-derived, volume-invariant, banding finds the re-master") {
    // re-derive every fingerprint from the sample formula — no
    // javax.sound, so the goldens are proven decoder-independent
    def fpOf(c: Long): Long = {
      val energies = (0 until 25).map { f =>
        (0 until 160).map { k =>
          val v = Multimodal.clipSample(c, f * 160 + k).toLong; v * v
        }.sum / 160
      }
      (1 until 25).foldLeft(0L) { (acc, k) =>
        if (energies(k) > energies(k - 1)) acc | (1L << (k - 1)) else acc
      }
    }
    val fps = (0L to 3L).map(c => c -> fpOf(c)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the engine's verified pairs equal the formula's distances
    val got = Multimodal.all("m13_audio_fingerprint").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getBoolean(3)))).toMap
    got.foreach { case ((a, b), (dist, dup)) =>
      assert(dist === ham(fps(a), fps(b)), s"pair ($a,$b)")
      assert(dup === (dist <= 4), s"pair ($a,$b) flag")
    }
    // volume invariance: the half-gain re-master is a fingerprint
    // match; distinct content is far
    assert(ham(fps(0L), fps(3L)) <= 4, "re-master drifted past the dup cut")
    for (a <- Seq(0L, 3L); b <- Seq(1L, 2L))
      assert(ham(fps(a), fps(b)) > 4, s"distinct clips $a/$b collide")
    // the banded candidate stage kept the true duplicate pair
    assert(got.contains((0L, 3L)) && got((0L, 3L))._2, "banding lost the re-master pair")
  }

  test("m14 color-hist: PNG pair intersections re-derived from the pixel formula") {
    def hist(w: Int, h: Int): Map[Int, Long] = {
      val m = scala.collection.mutable.HashMap[Int, Long]().withDefaultValue(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) =
          ((37 * x + 11 * y) % 256, (59 * x + 3 * y) % 256, (17 * x + 29 * y) % 256)
        m((r / 32) * 64 + (g / 32) * 8 + b / 32) += 1
      }
      m.toMap.withDefaultValue(0L)
    }
    val dims = Map(0L -> ((6, 4)), 1L -> ((16, 9)), 2L -> ((1, 1)))
    def inter(a: Long, b: Long): (Long, Long) = {
      val (ha, hb) = (hist(dims(a)._1, dims(a)._2), hist(dims(b)._1, dims(b)._2))
      val i = (ha.keySet ++ hb.keySet).toSeq.map(k => math.min(ha(k), hb(k))).sum
      val denom = math.min(dims(a)._1 * dims(a)._2, dims(b)._1 * dims(b)._2).toLong
      (i, i * 10000 / denom)
    }
    val got = graft.SparkEntry.queries("m14_color_hist")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // every PNG-PNG pair equals the formula derivation (decoder-independent)
    for (a <- Seq(0L, 1L, 2L); b <- Seq(0L, 1L, 2L) if a < b)
      assert(got((a, b)) === inter(a, b), s"pair ($a,$b)")
    // img0's grid is a sub-grid of img1's: 10000 bp is true containment
    assert(got((0L, 1L))._2 === 10000L)
    // the lossy JPEG pairs are genuinely below containment (the metric
    // discriminates) while staying well above zero (content survives)
    assert(got((1L, 3L))._2 > 1000L && got((1L, 3L))._2 < 10000L)
  }
}
