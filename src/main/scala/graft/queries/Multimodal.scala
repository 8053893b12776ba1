package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators — the LLM-pipeline tier for opaque
  * media payloads: a `binary` blob column with typed metadata,
  * magic-byte format sniffing, fixed-stride frame sampling, per-
  * modality statistics, and a partition-preserving decode pipeline.
  *
  * The container has no image/audio codecs, so the *payload* is a
  * deterministic fake — each document's text bytes behind a 4-byte
  * format tag — while the Spark-side plumbing is real: the blob is a
  * genuine `BinaryType` column, sniffing reads its leading bytes,
  * frame sampling slices byte ranges, and the decode stub runs as a
  * typed `mapPartitions` over the binary payload (the Scala analogue
  * of a `mapInPandas` batch UDF: per-partition batch iteration, no
  * shuffle, schema declared up front). Swapping the fake for a real
  * codec changes one function body, no plan shape.
  *
  * Payload bytes are ASCII, which lets the DuckDB oracle mirror every
  * byte operation in string domain (DuckDB 1.x has no blob
  * md5/substring) — byte position == char position by construction.
  *
  * Scale: m01/m02/m04 are map-only (linear in splits, no exchange);
  * m03 is one partial-aggregated shuffle on the 3-value modality key.
  */
object Multimodal {

  /** Pluggable payload decoder. The contract a real deployment swaps
    * in (libjpeg/ffmpeg behind this interface): bytes after the
    * 4-byte magic tag → (width, height). The plumbing around it —
    * typed mapPartitions, schema, partitioning — is codec-agnostic;
    * [[MultimodalSpec]] asserts the physical plan is IDENTICAL
    * (same operator sequence, no exchange) for two different codecs. */
  trait BlobCodec extends Serializable {
    def decode(blob: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake codec (the container ships no media libs):
    * dimensions derived from the first payload bytes. A missing byte
    * (payload shorter than 2 bytes after the magic tag) reads as 0 —
    * the same value DuckDB's `ascii(substr(payload, n, 1))` yields
    * for an out-of-range position, so both engines agree on
    * degenerate documents instead of this side crashing. */
  object StubCodec extends BlobCodec {
    override def decode(blob: Array[Byte]): (Int, Int) = {
      def at(i: Int): Int = if (i < blob.length) blob(i) & 0xff else 0
      (1 + at(4) % 64, 1 + at(5) % 64)
    }
  }

  /** REAL image decoder behind the same seam (r10 verdict #5):
    * `javax.imageio` PNG/JPEG decode — the JDK's built-in codecs, so
    * no external media libs are needed. m04's stub and this codec
    * run the IDENTICAL pipeline; only the function body differs. */
  object ImageIoCodec extends BlobCodec {
    override def decode(blob: Array[Byte]): (Int, Int) = {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      require(im != null, "undecodable image payload")
      (im.getWidth, im.getHeight)
    }
  }

  /** The committed fixture blobs m08 decodes: three formula-pixel
    * PNGs (pixel (x,y) = ((37x+11y)%256, (59x+3y)%256, (17x+29y)%256)
    * — lossless, so the decoded stats are derivable from the formula
    * alone, MultimodalSpec's independent oracle) and one JPEG of the
    * same formula (lossy; dims exact, stats golden-pinned). Bounded:
    * 4 rows, ~1.4 KB total — the blobs parallelize to executors and
    * the decode runs distributed, the m04 plumbing on real bytes. */
  private[graft] def fixtureImages(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0L, "png", "img0.png"), (1L, "png", "img1.png"),
        (2L, "png", "img2.png"), (3L, "jpg", "img3.jpg"))
      .map { case (id, fmt, res) =>
        val in = getClass.getResourceAsStream(s"/graft/fixtures/img/$res")
        try (id, fmt, in.readAllBytes()) finally in.close()
      }.toDF("img_id", "fmt", "blob")
  }

  /** m08's body: decode + one pixel pass per image inside the typed
    * mapPartitions (the mapInPandas batch shape — schema up front, no
    * shuffle, blobs never cross an exchange). mean_rgb_bp = floor of
    * the mean channel byte × 10⁴ — integer, so the gate
    * hash-compares exactly. */
  private[graft] def imageDecodeStats(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("img_id"), col("fmt"), col("blob")).as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, blob) =>
        val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        require(im != null, s"undecodable image payload for img $id")
        val (w, h) = (im.getWidth, im.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = im.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        (id, fmt, w, h, w.toLong * h, sum * 10000 / (3L * w * h))
      })
      .toDF("img_id", "fmt", "width", "height", "n_px", "mean_rgb_bp")
  }

  /** m14's body: decode + one pixel pass builds a 512-bin joint color
    * histogram (8 levels per channel, 512 bins) per image; pairwise similarity
    * is HISTOGRAM INTERSECTION (Swain & Ballard 1991) in integer
    * arithmetic — Σ min(hA, hB) over bins, normalized by the smaller
    * pixel count, in basis points. The near-dup signal that survives
    * resize and re-encode where byte hashes break, and is robust to
    * small occlusion where dHash (m11) flips gradient bits. Scale
    * shape: blobs decode inside the typed mapPartitions and never
    * cross an exchange — 512 longs leave per image; the pair join is
    * |images|² only on the bounded histogram frame (production runs
    * band the histograms LSH-style first; the fixture set is 4). */
  private[graft] def colorHistSim(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val hists = df.select(col("img_id"), col("fmt"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, _, blob) =>
        val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        require(im != null, s"undecodable image payload for img $id")
        val (w, h) = (im.getWidth, im.getHeight)
        val hist = new Array[Long](512)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = im.getRGB(x, y)
            val bin = (((p >> 16) & 0xff) / 32) * 64 +
              ((((p >> 8) & 0xff) / 32) * 8) + ((p & 0xff) / 32)
            hist(bin) += 1
            x += 1
          }
          y += 1
        }
        (id, w.toLong * h, hist)
      }).toDF("img_id", "px", "hist")
    // explicit broadcast: the histogram frame is bounded by the image
    // count and 512 longs/row (the estimate-based static broadcast is
    // globally off — Sessions.scaleDefensive; a cartesian here would
    // fail the plan audit)
    hists.as("a").join(broadcast(hists.as("b")), col("a.img_id") < col("b.img_id"))
      .selectExpr("a.img_id as id_a", "b.img_id as id_b",
        "aggregate(zip_with(a.hist, b.hist, (x, y) -> least(x, y)), 0L, (acc, v) -> acc + v) as inter",
        "least(a.px, b.px) as denom")
      .selectExpr("id_a", "id_b", "inter", "inter * 10000 div denom as inter_bp")
  }

  /** The committed fixture clips m09 decodes: three PCM WAVs (16-bit
    * little-endian; sample i = ((a·i + b·i² + c) mod 65521) − 32760
    * interleaved across channels) covering mono/stereo, three sample
    * rates, and a single-frame edge. Bounded: 3 rows, ~5.7 KB. */
  private[graft] def fixtureWavs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0L, "wav0.wav"), (1L, "wav1.wav"), (2L, "wav2.wav"))
      .map { case (id, res) =>
        val in = getClass.getResourceAsStream(s"/graft/fixtures/wav/$res")
        try (id, in.readAllBytes()) finally in.close()
      }.toDF("wav_id", "blob")
  }

  /** m09's body: container parse + one sample pass per clip inside
    * the typed mapPartitions — javax.sound.sampled runs headless for
    * PCM WAV parsing; peak/mean are exact integers so the gate
    * hash-compares exactly. */
  private[graft] def wavDecodeStats(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("wav_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(blob)))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected PCM layout for clip $id")
        val bytes = try ais.readAllBytes() finally ais.close()
        val sb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        var peak = 0L; var sumAbs = 0L; var i = 0
        val n = sb.remaining()
        while (i < n) {
          val v = math.abs(sb.get(i).toLong)
          if (v > peak) peak = v
          sumAbs += v; i += 1
        }
        (id, fmt.getSampleRate.toInt, fmt.getChannels,
          n.toLong / fmt.getChannels, peak.toInt, sumAbs / n)
      })
      .toDF("wav_id", "sample_rate", "channels", "n_frames", "peak_abs", "mean_abs")
  }

  /** m11's body: difference hash (dHash) over DECODED pixels — the
    * perceptual fingerprint m07 approximates from payload bytes, now
    * computed from real image content: nearest-neighbor sample onto
    * a 9×8 grid, integer grayscale (r+g+b)/3, bit (y,x) set iff the
    * right neighbor is brighter. 64 bits as a 16-hex-char string
    * (hex sidesteps BIGINT sign arithmetic in the oracle compare).
    * Map-only typed mapPartitions; one 17-byte row leaves per image. */
  private[graft] def imageDHash(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("img_id"), col("fmt"), col("blob")).as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, blob) =>
        val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        require(im != null, s"undecodable image payload for img $id")
        val (w, h) = (im.getWidth, im.getHeight)
        def gray(gx: Int, gy: Int): Int = {
          val px = im.getRGB(gx * w / 9, gy * h / 8)
          (((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)) / 3
        }
        var v = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(x + 1, y) > gray(x, y)) v |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (id, fmt, f"$v%016x")
      })
      .toDF("img_id", "fmt", "dhash")
  }

  /** m12's synthetic frame sequences: two "videos" of 8 formula-pixel
    * 64×48 PNG frames each, encoded in-memory (lossless, so every
    * frame's dHash derives from [[framePixel]] alone —
    * MultimodalSpec's decoder-independent oracle). The scene params
    * (a, b) switch at a known cut frame while brightness drifts
    * 3·frame across the whole video — the drift is continuous through
    * the cut, so only the CONTENT change may trip the detector.
    * Bounded: 16 frames, ~10 KB total. */
  private[graft] def framePixel(v: Long, f: Int, x: Int, y: Int): Int = {
    val (a, b) =
      if (v == 0L) { if (f < 4) (7, 3) else (11, 5) }
      else { if (f < 5) (13, 2) else (5, 9) }
    (a * x + b * y + 3 * f) % 256
  }

  private[graft] def fixtureFrameSeq(s: SparkSession): DataFrame = {
    import s.implicits._
    val rows = for (v <- Seq(0L, 1L); f <- 0 until 8) yield {
      val im = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val g = framePixel(v, f, x, y)
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      (v, f, bos.toByteArray)
    }
    rows.toDF("video_id", "frame_idx", "blob")
  }

  /** m12's body: decode each frame inside the typed mapPartitions,
    * compute the m11 9×8 gradient dHash, then ONE per-video lag
    * window for the consecutive-frame Hamming distance — state is a
    * single previous hash per video, never a collected frame
    * history; frame blobs never cross an exchange (17 bytes of hash
    * leave per frame before the video-keyed shuffle). */
  private[graft] def shotBoundaries(df: DataFrame, tau: Int): DataFrame = {
    import df.sparkSession.implicits._
    val hashed = df.select(col("video_id"), col("frame_idx"), col("blob"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (v, f, blob) =>
        val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        require(im != null, s"undecodable frame $v/$f")
        val (w, h) = (im.getWidth, im.getHeight)
        def gray(gx: Int, gy: Int): Int = {
          val px = im.getRGB(gx * w / 9, gy * h / 8)
          (((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)) / 3
        }
        var bits = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(x + 1, y) > gray(x, y)) bits |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (v, f, bits)
      }).toDF("video_id", "frame_idx", "dh")
    val byVid = org.apache.spark.sql.expressions.Window
      .partitionBy("video_id").orderBy("frame_idx")
    hashed.withColumn("prev", lag("dh", 1).over(byVid))
      .selectExpr("video_id", "frame_idx",
        "case when prev is null then -1 else cast(bit_count(dh ^ prev) as int) end as dist",
        s"prev is not null and bit_count(dh ^ prev) > $tau as is_cut")
  }

  /** m10's body: the m09 container parse plus a channel-0 framing
    * pass — frameLen-sample frames, tail dropped; per frame the
    * mean-square energy (integer), zero-crossing count (sign change
    * between consecutive samples), and peak. All exact integers, so
    * the golden-row oracle hash-compares exactly. */
  private[graft] def wavFrameFeatures(df: DataFrame, frameLen: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("wav_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(blob)))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected PCM layout for clip $id")
        val bytes = try ais.readAllBytes() finally ais.close()
        val sb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        val ch = fmt.getChannels
        val n = sb.remaining() / ch
        (0 until n / frameLen).map { f =>
          var k = 0; var energy = 0L; var zcr = 0L; var peak = 0L
          while (k < frameLen) {
            val v = sb.get((f * frameLen + k) * ch).toLong
            if (math.abs(v) > peak) peak = math.abs(v)
            energy += v * v
            if (k > 0 &&
              ((sb.get((f * frameLen + k - 1) * ch) < 0) != (v < 0))) zcr += 1
            k += 1
          }
          (id, f, energy / frameLen, zcr, peak)
        }
      }
      .toDF("wav_id", "frame_id", "energy_ms", "zcr", "peak_abs")
  }

  /** m13's synthetic clips, WAV-encoded in-memory (RIFF header +
    * 16-bit LE mono PCM at 8 kHz — the m09 container, built not
    * committed): three distinct-content clips from the m09 sample
    * formula and one VOLUME-HALVED copy of clip 0 — same content,
    * different bytes, the audio analogue of m11's lossy re-encode.
    * Bounded: 4 clips × 4000 samples ≈ 32 KB. */
  private[graft] def clipSample(c: Long, i: Int): Int = {
    val (a, b, off) = c match {
      case 0L | 3L => (1234L, 7L, 99L)
      case 1L => (2345L, 11L, 17L)
      case _ => (3456L, 13L, 5L)
    }
    val v = ((a * i + b * i.toLong * i + off) % 65521L - 32760L).toInt
    if (c == 3L) v / 2 else v
  }

  private[graft] def fixtureClips(s: SparkSession): DataFrame = {
    import s.implicits._
    val n = 4000
    val rows = (0L to 3L).map { c =>
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
      bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
      (0 until n).foreach(i => bb.putShort(clipSample(c, i).toShort))
      (c, bb.array())
    }
    rows.toDF("clip_id", "blob")
  }

  /** m13's fingerprint: sign-of-delta over the m10 frame energies —
    * bit k set iff frame k+1 is louder than frame k (24 bits from 25
    * frames of 160 samples). Volume scaling multiplies every energy
    * by the same factor, so the DELTA SIGNS — and the fingerprint —
    * survive what byte hashes and absolute-energy features cannot.
    * Per clip the energies reduce to one fingerprint row; the
    * collect is per-CLIP bounded (25 frames), never corpus-wide. */
  private[graft] def audioFingerprints(df: DataFrame): DataFrame =
    wavFrameFeatures(df.selectExpr("clip_id as wav_id", "blob"), 160)
      .groupBy("wav_id")
      .agg(expr("transform(array_sort(collect_list(struct(frame_id, energy_ms)))," +
        " x -> x.energy_ms)").as("es"))
      .selectExpr("wav_id as clip_id",
        """aggregate(sequence(1, size(es) - 1), 0L,
             (acc, k) -> acc + if(element_at(es, k + 1) > element_at(es, k),
                                  shiftleft(1L, cast(k - 1 as int)), 0L)) as fp""")

  /** m13's body: fingerprints → banded candidate pairs (6 bands of
    * 4 bits — pigeonhole: any pair within Hamming 5 shares an exact
    * band, so the τ=4 duplicate cut loses nothing and candidates
    * come from an EQUI-join on (band, value), the d06 simhash
    * topology — never an all-pairs scan) → exact Hamming verify. */
  private[graft] def audioDupPairs(df: DataFrame): DataFrame = {
    val fps = audioFingerprints(df)
    val banded = fps.selectExpr("clip_id", "fp", "explode(sequence(0, 5)) as band")
      .selectExpr("clip_id", "band",
        "(fp div shiftleft(1L, cast(band * 4 as int))) % 16 as bv")
    val cand = banded.select(col("clip_id").as("c1"), col("band"), col("bv"))
      .join(banded.select(col("clip_id").as("c2"), col("band"), col("bv")),
        Seq("band", "bv"))
      .where(col("c1") < col("c2"))
      .select("c1", "c2").distinct()
    cand
      .join(fps.select(col("clip_id").as("c1"), col("fp").as("f1")), "c1")
      .join(fps.select(col("clip_id").as("c2"), col("fp").as("f2")), "c2")
      .selectExpr("c1", "c2", "cast(bit_count(f1 ^ f2) as int) as dist",
        "bit_count(f1 ^ f2) <= 4 as is_dup")
  }

  /** The m04 decode pipeline, parameterized by codec: map-only typed
    * mapPartitions over the binary payload (the Scala analogue of a
    * mapInPandas batch UDF), schema declared up front, no shuffle. */
  def decodePipeline(s: SparkSession, d: String, codec: BlobCodec): DataFrame = {
    import s.implicits._
    blobs(s, d).select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val (w, h) = codec.decode(blob)
        (id, w, h, w * h)
      })
      .toDF("doc_id", "width", "height", "n_px")
  }

  /** doc_id, modality (deterministic 3-way assignment), blob
    * (BinaryType: 4-byte magic + text bytes). */
  private def blobs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents").selectExpr(
      "doc_id",
      "case doc_id % 3 when 0 then 'image' when 1 then 'audio' else 'video' end as modality",
      """encode(concat(case doc_id % 3 when 0 then 'JPG0' when 1 then 'WAV0' else 'MP40' end,
                       text), 'utf-8') as blob""")

  private val duckBlobs =
    """SELECT doc_id,
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
              (CASE doc_id % 3 WHEN 0 THEN 'JPG0' WHEN 1 THEN 'WAV0' ELSE 'MP40' END || text) AS payload
       FROM documents"""

  val all: Map[String, Q] = Map(
    // ── metadata extraction: magic-byte sniff, size, content hash ──
    "m01_blob_meta" -> Q(
      (s, d) => blobs(s, d).selectExpr(
        "doc_id",
        """case decode(substring(blob, 1, 4), 'utf-8')
             when 'JPG0' then 'image' when 'WAV0' then 'audio'
             when 'MP40' then 'video' else 'unknown' end as modality_sniffed""",
        "octet_length(blob) as n_bytes",
        "md5(blob) as content_md5"),
      Some(s"""WITH b AS ($duckBlobs)
               SELECT doc_id,
                      CASE substr(payload, 1, 4)
                        WHEN 'JPG0' THEN 'image' WHEN 'WAV0' THEN 'audio'
                        WHEN 'MP40' THEN 'video' ELSE 'unknown' END AS modality_sniffed,
                      length(payload) AS n_bytes,
                      md5(payload) AS content_md5
               FROM b""")),

    // ── frame sampling: every 3rd 16-byte frame of the payload ──
    "m02_frame_sample" -> Q(
      (s, d) => blobs(s, d)
        .selectExpr("doc_id", "blob",
          "explode(sequence(0, (octet_length(blob) - 1) div 48)) as frame_ix")
        .selectExpr("doc_id", "frame_ix",
          "md5(substring(blob, 1 + frame_ix * 48, 16)) as frame_md5"),
      Some(s"""WITH b AS ($duckBlobs),
               f AS (SELECT doc_id, payload,
                            unnest(generate_series(0, (length(payload) - 1) // 48)) AS frame_ix
                     FROM b)
               SELECT doc_id, frame_ix, md5(substr(payload, 1 + frame_ix * 48, 16)) AS frame_md5
               FROM f"""),
      bench = true),

    // ── per-modality stats: one partial-agg shuffle on a 3-value key ──
    "m03_modality_stats" -> Q(
      (s, d) => blobs(s, d)
        .groupBy("modality")
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("blob"))).as("total_bytes"),
          min("doc_id").as("first_doc")),
      Some(s"""WITH b AS ($duckBlobs)
               SELECT modality, count(*) AS n_docs,
                      CAST(sum(length(payload)) AS BIGINT) AS total_bytes, min(doc_id) AS first_doc
               FROM b GROUP BY modality""")),

    // ── decode pipeline: typed mapPartitions over the binary payload ──
    // STUB codec behind the [[BlobCodec]] seam — a real codec swaps
    // the one function body; partitioning, schema, and batch shape
    // stay identical (plan-equality spec-asserted).
    // ── REAL image decode on real bytes (r10 verdict #5): the m04
    // pipeline with javax.imageio decoding committed PNG/JPEG fixture
    // blobs, plus a per-image pixel-stat pass. Oracle = golden rows
    // (the dwca03 golden-hex pattern): widths/heights/pixel means of
    // the committed files, independently derivable from the PNG
    // pixel formula (MultimodalSpec re-derives them from the formula,
    // not from ImageIO). Ignores sfDir — the inputs ARE the committed
    // artifacts. ──
    "m08_image_decode" -> Q(
      (s, _) => imageDecodeStats(fixtureImages(s)),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 'png', 6, 4, CAST(24 AS BIGINT), CAST(1014444 AS BIGINT)),
                (CAST(1 AS BIGINT), 'png', 16, 9, CAST(144 AS BIGINT), CAST(1211666 AS BIGINT)),
                (CAST(2 AS BIGINT), 'png', 1, 1, CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
                (CAST(3 AS BIGINT), 'jpg', 8, 8, CAST(64 AS BIGINT), CAST(1191302 AS BIGINT)))
              AS t(img_id, fmt, width, height, n_px, mean_rgb_bp)""")),

    // ── REAL audio decode: a second modality through the same
    // BlobCodec-style seam. Committed formula-sample PCM WAVs (16-bit
    // LE, sample i = ((a·i + b·i² + c) mod 65521) − 32760 — lossless
    // container, so every decoded int is derivable from the formula;
    // MultimodalSpec re-derives them independently of javax.sound)
    // decoded distributed via javax.sound.sampled inside the typed
    // mapPartitions: container parse → (rate, channels, frames) +
    // one sample pass (peak, integer mean |amplitude|). The stats a
    // speech-data pipeline filters on (silence/clipping detection,
    // duration bucketing) — blobs never cross an exchange, one stat
    // row leaves per clip. Ignores sfDir — the inputs ARE the
    // committed artifacts. ──
    // ── m14: color-histogram near-dup similarity on DECODED pixels
    // — histogram intersection (Swain & Ballard 1991) over 512-bin
    // joint color histograms, the content-level signal that is
    // robust where m11's dHash is brittle (small occlusions flip
    // gradient bits; they barely dent a histogram) and vice versa.
    // Integer end-to-end: bin counts, Σ min, basis points against
    // the smaller image. The PNG pairs' values are derivable from
    // the fixture pixel formula (the spec re-derives them
    // decoder-independently — img0's grid is a sub-grid of img1's,
    // so their 10000 bp intersection is true CONTAINMENT, not
    // saturation); the JPEG pairs are golden-pinned (lossy). Ignores
    // sfDir — the inputs ARE the committed artifacts. ──
    "m14_color_hist" -> Q(
      (s, _) => colorHistSim(fixtureImages(s)),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(24 AS BIGINT), CAST(10000 AS BIGINT)),
                (CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(10000 AS BIGINT)),
                (CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(9 AS BIGINT), CAST(3750 AS BIGINT)),
                (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(10000 AS BIGINT)),
                (CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(24 AS BIGINT), CAST(3750 AS BIGINT)),
                (CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(10000 AS BIGINT)))
              AS t(id_a, id_b, inter, inter_bp)""")),

    "m09_wav_decode" -> Q(
      (s, _) => wavDecodeStats(fixtureWavs(s)),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 8000, 1, CAST(1200 AS BIGINT), 32744, CAST(16380 AS BIGINT)),
                (CAST(1 AS BIGINT), 16000, 2, CAST(800 AS BIGINT), 32750, CAST(16182 AS BIGINT)),
                (CAST(2 AS BIGINT), 11025, 1, CAST(1 AS BIGINT), 9304, CAST(9304 AS BIGINT)))
              AS t(wav_id, sample_rate, channels, n_frames, peak_abs, mean_abs)""")),

    // ── m10: FRAMED audio features over the decoded PCM — the
    // speech-pipeline front end (VAD energy gating, silence trimming,
    // diarization pre-pass all consume per-frame stats, not per-clip
    // ones). Channel-0 samples are cut into 160-sample frames (20 ms
    // at 8 kHz, the standard VAD hop); per frame: mean-square energy
    // (integer div — exact), zero-crossing count, and peak. The tail
    // partial frame is dropped (each emitted frame aggregates exactly
    // frameLen samples), so wav2's single-frame clip contributes zero
    // rows — the boundary the spec pins. Scale shape: same BlobCodec
    // seam as m09 — the clip bytes decode inside the typed
    // mapPartitions and never cross an exchange; ~n_samples/160
    // fixed-width stat rows leave per clip, linear in audio bytes
    // with a frame-count output bound. Oracle = golden rows derived
    // from the fixtures' sample formula (the m08/m09 pattern);
    // MultimodalSpec re-derives them from the formula independently
    // of javax.sound. ──
    // ── m11: perceptual dHash on DECODED pixels — the real-content
    // twin of m07's payload-byte SimHash: near-dup detection that
    // survives re-encoding, where any byte-level hash breaks. The
    // JPEG fixture is the lossy re-encode of the same pixel formula,
    // and its decoded dHash lands Hamming distance 2 from the
    // formula's lossless 8×8 hash (spec-pinned ≤ 8) while the two
    // FILES share no bytes — exactly the gap between content
    // fingerprints and payload fingerprints. 9×8 nearest-neighbor
    // sample → integer grayscale → 64 brightness-gradient bits,
    // hex-encoded (hex sidesteps BIGINT sign arithmetic in the
    // compare). PNG golden rows derive from the pixel formula
    // independently of ImageIO (spec re-derives); the JPEG row is
    // golden-pinned like m08's mean. Same scale shape as every
    // decode op: blobs never cross an exchange, 17 bytes leave per
    // image. ──
    "m11_image_dhash" -> Q(
      (s, _) => imageDHash(fixtureImages(s)),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 'png', '3636363636363636'),
                (CAST(1 AS BIGINT), 'png', '1b53535353135353'),
                (CAST(2 AS BIGINT), 'png', '0000000000000000'),
                (CAST(3 AS BIGINT), 'jpg', 'ce8e9e9e5e5e5e5e'))
              AS t(img_id, fmt, dhash)""")),

    // ── m12: SHOT-BOUNDARY detection on decoded frame sequences —
    // the keyframe/scene segmentation pass a video training pipeline
    // runs before sampling frames for a VLM (m02 samples at fixed
    // stride; m12 finds where sampling at stride is wrong): per
    // video, consecutive frames' decoded-pixel dHash Hamming
    // distance, a cut flagged where it exceeds τ=10 while
    // within-scene brightness drift stays under it (the fixture's
    // drift is continuous through the cut, so only the content
    // change can trip the detector — MultimodalSpec re-derives every
    // hash from the pixel formula, decoder-independent). Scale
    // shape: decode + hash inside the typed mapPartitions (frame
    // blobs never cross an exchange, 17 bytes leave per frame), then
    // one video-keyed lag window holding a single previous hash per
    // video — never a collected frame history. First frame reports
    // dist = -1, is_cut = false. ──
    "m12_shot_boundary" -> Q(
      (s, _) => shotBoundaries(fixtureFrameSeq(s), 10),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 0, -1, false),
                (CAST(0 AS BIGINT), 1, 2, false),
                (CAST(0 AS BIGINT), 2, 2, false),
                (CAST(0 AS BIGINT), 3, 0, false),
                (CAST(0 AS BIGINT), 4, 26, true),
                (CAST(0 AS BIGINT), 5, 0, false),
                (CAST(0 AS BIGINT), 6, 0, false),
                (CAST(0 AS BIGINT), 7, 4, false),
                (CAST(1 AS BIGINT), 0, -1, false),
                (CAST(1 AS BIGINT), 1, 2, false),
                (CAST(1 AS BIGINT), 2, 1, false),
                (CAST(1 AS BIGINT), 3, 2, false),
                (CAST(1 AS BIGINT), 4, 0, false),
                (CAST(1 AS BIGINT), 5, 23, true),
                (CAST(1 AS BIGINT), 6, 1, false),
                (CAST(1 AS BIGINT), 7, 0, false))
              AS t(video_id, frame_idx, dist, is_cut)""")),

    // ── m13: perceptual AUDIO fingerprint dedup — the audio member
    // of the content-fingerprint family (m11 images, m12 frame
    // sequences): sign-of-delta over frame energies, 24 bits per
    // clip, so a VOLUME-SCALED re-master of the same recording
    // (clip 3 = clip 0 at half gain — zero shared bytes) lands
    // within Hamming τ=4 of its original while distinct content
    // stays far — the robustness no payload hash has. Candidates
    // come from 6×4-bit band collisions (equi-join, the d06 simhash
    // topology; pigeonhole covers every pair within Hamming 5), so
    // the plan is corpus-linear: decode + frame energies map-side,
    // one per-clip bounded energy fold, band-keyed join, exact
    // verify on colliding pairs only. Clips are in-memory formula
    // WAVs; MultimodalSpec re-derives every fingerprint from the
    // sample formula independently of javax.sound. ──
    "m13_audio_fingerprint" -> Q(
      (s, _) => audioDupPairs(fixtureClips(s)),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), CAST(1 AS BIGINT), 14, false),
                (CAST(0 AS BIGINT), CAST(3 AS BIGINT), 0, true),
                (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 8, false),
                (CAST(1 AS BIGINT), CAST(3 AS BIGINT), 14, false))
              AS t(c1, c2, dist, is_dup)""")),

    "m10_audio_features" -> Q(
      (s, _) => wavFrameFeatures(fixtureWavs(s), 160),
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 0, CAST(351981347 AS BIGINT), CAST(8 AS BIGINT), CAST(32319 AS BIGINT)),
                (CAST(0 AS BIGINT), 1, CAST(358872746 AS BIGINT), CAST(26 AS BIGINT), CAST(32744 AS BIGINT)),
                (CAST(0 AS BIGINT), 2, CAST(354880778 AS BIGINT), CAST(43 AS BIGINT), CAST(32374 AS BIGINT)),
                (CAST(0 AS BIGINT), 3, CAST(358039312 AS BIGINT), CAST(60 AS BIGINT), CAST(32498 AS BIGINT)),
                (CAST(0 AS BIGINT), 4, CAST(357488287 AS BIGINT), CAST(77 AS BIGINT), CAST(32654 AS BIGINT)),
                (CAST(0 AS BIGINT), 5, CAST(360349892 AS BIGINT), CAST(94 AS BIGINT), CAST(32576 AS BIGINT)),
                (CAST(0 AS BIGINT), 6, CAST(358314495 AS BIGINT), CAST(111 AS BIGINT), CAST(32513 AS BIGINT)),
                (CAST(1 AS BIGINT), 0, CAST(324031695 AS BIGINT), CAST(10 AS BIGINT), CAST(32517 AS BIGINT)),
                (CAST(1 AS BIGINT), 1, CAST(352730158 AS BIGINT), CAST(28 AS BIGINT), CAST(32750 AS BIGINT)),
                (CAST(1 AS BIGINT), 2, CAST(358231792 AS BIGINT), CAST(47 AS BIGINT), CAST(32630 AS BIGINT)),
                (CAST(1 AS BIGINT), 3, CAST(359862022 AS BIGINT), CAST(66 AS BIGINT), CAST(32573 AS BIGINT)),
                (CAST(1 AS BIGINT), 4, CAST(351167338 AS BIGINT), CAST(85 AS BIGINT), CAST(32479 AS BIGINT)))
              AS t(wav_id, frame_id, energy_ms, zcr, peak_abs)""")),

    "m04_decode_stub" -> Q(
      (s, d) => decodePipeline(s, d, StubCodec),
      Some(s"""WITH b AS ($duckBlobs)
               SELECT doc_id,
                      1 + ascii(substr(payload, 5, 1)) % 64 AS width,
                      1 + ascii(substr(payload, 6, 1)) % 64 AS height,
                      (1 + ascii(substr(payload, 5, 1)) % 64)
                        * (1 + ascii(substr(payload, 6, 1)) % 64) AS n_px
               FROM b""")),

    // ── resize + feature extraction (stub codec, real plumbing) ──
    // "Resize" = 4× byte-stride downsample of the payload (content
    // hash of the result proves the byte selection); features = mean
    // byte in basis points + a 4-bin byte histogram. ASCII payloads
    // let the oracle mirror every byte op in string domain. Map-only,
    // and since r7 a single pass: the native byte_features kernel
    // ([[graft.functions.ByteFeatures]]) replaced four interpreted
    // per-byte SQL-lambda passes (the retired formulation survives as
    // [[resizeFeaturesSqlLambda]], a spec cross-check).
    "m05_resize_features" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        blobs(s, d)
          .where("octet_length(blob) > 4")
          .selectExpr("doc_id", "byte_features(blob) as f")
          .select(col("doc_id"), col("f.resized_md5"), col("f.n_bytes"),
            col("f.mean_byte_bp"), col("f.hist4"))
      },
      Some(s"""WITH b AS ($duckBlobs),
               pp AS (SELECT doc_id, payload AS p FROM b WHERE length(payload) > 4)
               SELECT doc_id,
                      md5(array_to_string(list_transform(generate_series(0, (length(p) - 5) // 4),
                        i -> substr(p, CAST(5 + i * 4 AS INTEGER), 1)), '')) AS resized_md5,
                      length(p) - 4 AS n_bytes,
                      CAST(list_sum(list_transform(generate_series(5, length(p)),
                        i -> ascii(substr(p, CAST(i AS INTEGER), 1)))) * 10000
                        // (length(p) - 4) AS BIGINT) AS mean_byte_bp,
                      array_to_string(list_transform(generate_series(0, 3),
                        b -> CAST(len(list_filter(generate_series(5, length(p)),
                          i -> ascii(substr(p, CAST(i AS INTEGER), 1)) // 64 = b)) AS VARCHAR)), ',') AS hist4
               FROM pp""")),

    // ── cross-media duplicate-frame detection: which sampled frames
    // appear in ≥2 media objects (repeated clips / stock footage /
    // shared intros — the video-corpus dedup primitive). Rides m02's
    // fixed-stride frame sample verbatim (one formulation, one
    // truth), then ONE partial-agg'd shuffle keyed on the 16-byte
    // frame hash; the distinct-doc count is Spark's standard two-
    // phase distinct aggregate, and the payload bytes themselves
    // never cross an exchange — only (frame_md5, doc_id) pairs do.
    // At 100 TB this is the frame-level analogue of d01. ──
    "m06_frame_dedup" -> Q(
      (s, d) => all("m02_frame_sample").fn(s, d)
        .groupBy("frame_md5")
        .agg(countDistinct("doc_id").as("n_docs"), min("doc_id").as("first_doc"))
        .where("n_docs >= 2"),
      Some(s"""WITH b AS ($duckBlobs),
               f AS (SELECT doc_id, payload,
                            unnest(generate_series(0, (length(payload) - 1) // 48)) AS frame_ix
                     FROM b),
               fr AS (SELECT doc_id, md5(substr(payload, 1 + frame_ix * 48, 16)) AS frame_md5 FROM f)
               SELECT frame_md5, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
               FROM fr GROUP BY frame_md5 HAVING count(DISTINCT doc_id) >= 2"""),
      bench = true),

    // ── perceptual NEAR-dup for media blobs: m06 catches exact
    // repeated frames (md5); this is its pHash/PDQ-shaped sibling —
    // a 64-bit SimHash over the payload's byte 4-grams (magic bytes
    // EXCLUDED, so the same content behind different container
    // formats still collides — cross-format near-dup), then d06's
    // banded LSH + hamming<=3 verify verbatim (4x16-bit bands,
    // pigeonhole-exact recall, capped buckets). Payload bytes never
    // cross an exchange: each blob folds map-side to one int64;
    // only (band, bucket) keys and 8-byte hashes shuffle — the
    // media-corpus analogue of d04/d06, and at 100 TB the blob
    // column stays columnar-pruned out of the whole pipeline. A
    // real deployment swaps the byte-gram kernel for a decoded
    // perceptual feature (DCT lowbands); the topology is this one. ──
    "m07_phash_neardup" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val sh = blobs(s, d)
          .selectExpr("doc_id", "decode(substring(blob, 5), 'utf-8') as p")
          // CHARACTER length, mirroring the oracle's length(payload)
          // unit exactly — a byte-length filter would diverge on
          // multi-byte payloads (and sequence(1, n) with n < 1 runs
          // DESCENDING in Spark, yielding garbage grams)
          .where("length(p) >= 4")
          .selectExpr("doc_id",
            "simhash64(transform(sequence(1, length(p) - 3), i -> substring(p, i, 4))) as simhash")
          .persistScoped()
        DedupKernels.simhashPairs(sh).select("d1", "d2", "hamming")
      },
      Some(s"""WITH bl AS ($duckBlobs),
           th AS (SELECT doc_id,
                    list_transform(generate_series(1, length(payload) - 4 - 3),
                      i -> [${graft.functions.Hashing.duck32("substr(payload, CAST(i + 4 AS INTEGER), 4)")},
                            ${graft.functions.Hashing.duck32b("substr(payload, CAST(i + 4 AS INTEGER), 4)")}]) AS th
                  FROM bl WHERE length(payload) >= 8),
           ${DedupKernels.duckSimhashFold},
           ${DedupKernels.duckBandPairs}""")),

    // ── m15: WebDataset-style TAR SHARDS — the container convention
    // multimodal training data actually ships in: a directory of
    // tar files, members paired by basename (`<id>.txt` + `<id>.cls`
    // here; images/audio in production), consumed shard-per-task in
    // one forward pass (tar has no central directory — a shard on
    // object storage costs ONE ranged GET, which is why the format
    // won). The gate writes the corpus into 4 shards with the
    // streaming USTAR writer ([[graft.sources.TarShards]]: O(member)
    // memory, shard-change detection over a (shard, doc_id)-sorted
    // partition — each shard value hashes to exactly one partition,
    // so no concurrent writers on a file), reads every member back
    // through the checksum-validating reader, and aggregates
    // per-(shard, suffix) counts, bytes, and an order-independent
    // content fingerprint (sum of md5-prefix ints over member BYTES
    // as read from the tar). The oracle computes the same stats from
    // the source table — every payload byte must survive the
    // header/padding framing to hash equal. At 100 TB: more shards,
    // not bigger ones (WebDataset sizes shards task-resident);
    // write is one shard-keyed exchange, read is an embarrassingly
    // parallel flatMap over shard paths. TarShardsSpec pins the
    // USTAR header layout against the spec, not just the roundtrip. ──
    "m15_tar_shards" -> Q(
      (s, d) => {
        import s.implicits._
        // per-run scratch (graft.RunScratch): concurrent runs at two
        // scales get disjoint shard dirs — the executor-side write +
        // driver-side listFiles read assumes local mode's shared FS
        val out = graft.RunScratch.freshDir("tar-shards")
        Tables(s, d, "documents")
          .selectExpr("doc_id % 4 as shard", "doc_id", "text", "lang")
          .repartition(col("shard")).sortWithinPartitions("shard", "doc_id")
          .as[(Long, Long, String, String)]
          .foreachPartition { (it: Iterator[(Long, Long, String, String)]) =>
            var cur = -1L
            var w: graft.sources.TarShards.Writer = null
            it.foreach { case (sh, id, text, lang) =>
              if (sh != cur) {
                if (w != null) w.close()
                cur = sh
                w = new graft.sources.TarShards.Writer(s"$out/shard-$sh.tar")
              }
              w.add(s"$id.txt", text.getBytes("UTF-8"))
              w.add(s"$id.cls", lang.getBytes("UTF-8"))
            }
            if (w != null) w.close()
          }
        val paths = new java.io.File(out).listFiles()
          .map(_.getAbsolutePath).toSeq.sorted
        s.createDataset(paths)
          .flatMap { p =>
            val shard = p.split("shard-").last.stripSuffix(".tar").toLong
            graft.sources.TarShards.readAll(p).map { case (n, b) => (shard, n, b) }
          }
          .toDF("shard", "name", "content")
          .selectExpr("shard",
            "substring_index(name, '.', -1) as suffix",
            "octet_length(content) as nb",
            "cast(conv(substring(md5(content), 1, 8), 16, 10) as bigint) as fp")
          .groupBy("shard", "suffix")
          .agg(count(lit(1)).as("n_members"), sum("nb").as("total_bytes"),
            sum("fp").as("content_fp"))
      },
      Some("""WITH m AS (
                SELECT doc_id % 4 AS shard, 'txt' AS suffix,
                       octet_length(encode(text)) AS nb,
                       ('0x' || substr(md5(text), 1, 8))::BIGINT AS fp
                FROM documents
                UNION ALL
                SELECT doc_id % 4, 'cls', octet_length(encode(lang)),
                       ('0x' || substr(md5(lang), 1, 8))::BIGINT
                FROM documents)
              SELECT shard, suffix, count(*) AS n_members,
                     CAST(sum(nb) AS BIGINT) AS total_bytes,
                     CAST(sum(fp) AS BIGINT) AS content_fp
              FROM m GROUP BY 1, 2""")),

    // ── m16: BINARY members through the tar shards — the WebDataset
    // convention's actual point: an image member paired with its
    // text sidecar under one basename (`<id>.png` + `<id>.txt`),
    // consumed together shard-per-task. m15 proved the framing on
    // text; this gate round-trips the committed REAL image bytes
    // (PNG/JPEG fixtures, the m08 decode corpus) and pins each
    // member's full md5 — any byte the USTAR header/padding framing
    // gained or lost is a hash mismatch on that exact member. The
    // oracle is GOLDEN (md5s of the committed fixture files and of
    // the deterministic sidecar strings, computed independently of
    // the JVM) because DuckDB 1.x cannot md5 blobs. Scale shape is
    // m15's: shard-keyed write, embarrassingly parallel read, blobs
    // never cross an exchange — only (name, 16-byte hash) rows do. ──
    "m16_tar_binary" -> Q(
      (s, _) => {
        import s.implicits._
        val out = graft.RunScratch.freshDir("tar-binary")
        fixtureImages(s)
          .selectExpr("img_id % 2 as shard", "img_id", "fmt", "blob")
          .repartition(col("shard")).sortWithinPartitions("shard", "img_id")
          .as[(Long, Long, String, Array[Byte])]
          .foreachPartition { (it: Iterator[(Long, Long, String, Array[Byte])]) =>
            var cur = -1L
            var w: graft.sources.TarShards.Writer = null
            it.foreach { case (sh, id, fmt, blob) =>
              if (sh != cur) {
                if (w != null) w.close()
                cur = sh
                w = new graft.sources.TarShards.Writer(s"$out/shard-$sh.tar")
              }
              w.add(s"$id.$fmt", blob)
              w.add(s"$id.txt", s"img:$id:$fmt".getBytes("UTF-8"))
            }
            if (w != null) w.close()
          }
        val paths = new java.io.File(out).listFiles()
          .map(_.getAbsolutePath).toSeq.sorted
        s.createDataset(paths)
          .flatMap { p =>
            val shard = p.split("shard-").last.stripSuffix(".tar").toLong
            graft.sources.TarShards.readAll(p).map { case (n, b) => (shard, n, b) }
          }
          .toDF("shard", "name", "content")
          .selectExpr("shard", "name",
            "cast(octet_length(content) as bigint) as n_bytes",
            "md5(content) as content_md5")
      },
      Some("""SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), '0.png', CAST(144 AS BIGINT), '76423f78519c4a3523887025e5c941ff'),
                (CAST(0 AS BIGINT), '0.txt', CAST(9 AS BIGINT), '0406e1e2ca8d2ef68491d7aa9a254459'),
                (CAST(0 AS BIGINT), '2.png', CAST(69 AS BIGINT), '3680f788c0ad5e71b91a5e61544a7d80'),
                (CAST(0 AS BIGINT), '2.txt', CAST(9 AS BIGINT), '2e043c8c81de78d5c47c39e1f091b934'),
                (CAST(1 AS BIGINT), '1.png', CAST(509 AS BIGINT), 'b8f6ff8b436c1ad767c8bb17705d2106'),
                (CAST(1 AS BIGINT), '1.txt', CAST(9 AS BIGINT), '3795ba20e262ea94d359bf6e16ca19a3'),
                (CAST(1 AS BIGINT), '3.jpg', CAST(679 AS BIGINT), '9e6df4d0861f12599cdd07119f4885bb'),
                (CAST(1 AS BIGINT), '3.txt', CAST(9 AS BIGINT), '2b9df978ada3d0ab856150e724938a7e'))
              AS t(shard, name, n_bytes, content_md5)"""))
  )

  /** The retired four-pass SQL-lambda formulation of m05 — NOT the
    * shipped shape (every per-byte lambda ran interpreted); kept as
    * MultimodalSpec's cross-check pinning the native kernel's byte
    * semantics against Spark's own string builtins. */
  private[graft] def resizeFeaturesSqlLambda(s: SparkSession, d: String): DataFrame =
    blobs(s, d)
      .selectExpr("doc_id", "decode(blob, 'utf-8') as p")
      .where("char_length(p) > 4")
      .selectExpr(
        "doc_id",
        """md5(array_join(transform(sequence(0, (char_length(p) - 5) div 4),
             i -> substring(p, 5 + i * 4, 1)), '')) as resized_md5""",
        "cast(char_length(p) - 4 as bigint) as n_bytes",
        """cast(aggregate(transform(sequence(5, char_length(p)),
             i -> cast(ascii(substring(p, i, 1)) as bigint)),
             cast(0 as bigint), (a, x) -> a + x) * 10000
           div (char_length(p) - 4) as bigint) as mean_byte_bp""",
        """array_join(transform(sequence(0, 3),
             b -> cast(size(filter(sequence(5, char_length(p)),
               i -> ascii(substring(p, i, 1)) div 64 = b)) as string)), ',') as hist4""")
}
