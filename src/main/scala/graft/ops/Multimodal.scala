package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media travels as an
  * opaque `binary` column plus typed metadata; decode / feature-extract
  * / frame-sample run as `mapPartitions` over typed Datasets so each
  * task amortizes per-batch setup (the JVM analog of a batched Pandas
  * UDF).
  *
  * The actual byte decoding is a clearly-marked STUB — this container
  * ships no image/audio codecs — but everything Spark-side is real:
  * schemas, encoders, batch iteration, partition sizing. A production
  * build swaps `stubDecode*` for a real codec call per batch.
  */
object Multimodal {

  /** One media object: id, modality tag, raw bytes, typed metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      embedding: Array[Float])

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      duration_ms: Long,
      mfcc: Array[Float])

  final case class VideoFrame(
      media_id: Long,
      frame_index: Int,
      timestamp_ms: Long,
      frame_bytes: Array[Byte])

  /** STUB: deterministic pseudo-decode of an image payload. A real
    * implementation calls the codec ONCE PER BATCH inside
    * [[decodeImages]]'s mapPartitions. */
  private def stubDecodeImage(id: Long, bytes: Array[Byte],
      dim: Int): ImageFeatures = {
    val h = java.util.Arrays.hashCode(bytes)
    // seed from the CONTENT only (like a real decoder): byte-identical
    // payloads must produce identical features whatever their id —
    // the property image near-dedup relies on
    val rnd = new scala.util.Random(h.toLong)
    ImageFeatures(
      media_id = id,
      width = 64 + math.abs(h % 1920),
      height = 64 + math.abs((h / 7) % 1080),
      channels = 3,
      embedding = Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  private def stubDecodeAudio(id: Long,
      bytes: Array[Byte]): AudioFeatures = {
    val h = java.util.Arrays.hashCode(bytes)
    val rnd = new scala.util.Random(h.toLong ^ id)
    AudioFeatures(id, 16000, math.abs(h % 60000L),
      Array.fill(13)(rnd.nextFloat()))
  }

  /** Magic-number sniff for the formats the in-JDK codec handles. */
  private def looksDecodable(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && (
      // PNG: \x89 P N G
      ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte) ||
      // BMP: B M
      (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) ||
      // GIF: G I F
      (bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte) ||
      // JPEG: \xFF \xD8
      ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8))

  /** REAL decode for PNG/BMP/GIF/JPEG via the in-JDK `javax.imageio`
    * (no external codec dependency): true width/height/channels and a
    * deterministic grid-mean-RGB embedding. Payloads the JDK codec
    * can't read (or that aren't images at all) fall back to the
    * deterministic stub, so the pipeline shape never depends on codec
    * availability. */
  private def realDecodeImage(id: Long, bytes: Array[Byte],
      dim: Int): Option[ImageFeatures] = {
    if (!looksDecodable(bytes)) return None
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        // grid-mean embedding: dim cells tile the image row-major; each
        // contributes the mean of one RGB channel, normalized to [-1, 1]
        val cells = math.max(1, (dim + 2) / 3)
        val g = math.max(1, math.ceil(math.sqrt(cells.toDouble)).toInt)
        val emb = Array.tabulate(dim) { i =>
          val cell = i / 3
          val gx = math.min(w - 1, (cell % g) * w / g)
          val gy = math.min(h - 1, (cell / g) * h / g)
          val rgb = img.getRGB(gx, gy)
          val channel = (rgb >> ((i % 3) * 8)) & 0xFF
          channel / 127.5f - 1f
        }
        ImageFeatures(id, w, h,
          channels = img.getColorModel.getNumComponents, emb)
      }
    } catch { case _: Exception => None }
  }

  /** Batched image decode + feature extraction. Partition-level loop so
    * per-batch state (a real decoder context) initializes once. Real
    * decode where the JDK codec can read the payload; stub otherwise. */
  def decodeImages(media: Dataset[MediaRow],
      embeddingDim: Int = 64): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "image").mapPartitions { rows =>
      rows.map(r => realDecodeImage(r.media_id, r.content, embeddingDim)
        .getOrElse(stubDecodeImage(r.media_id, r.content, embeddingDim)))
    }
  }

  /** Image near-duplicate edges: decode → grid-mean embedding →
    * hyperplane-LSH bucketing → exact-cosine verify — the multimodal
    * twin of text near-dedup, composed from [[decodeImages]] and
    * [[Dedup.embeddingEdges]] (bucketed, never all-pairs). Identical
    * payloads decode to identical embeddings, so exact copies are
    * guaranteed edges; near-dups (resizes, small edits) cluster by the
    * cosine threshold. With the decode stubbed for exotic codecs the
    * stub's deterministic features still make byte-identical payloads
    * dedup correctly. */
  def imageNearDupEdges(media: Dataset[MediaRow],
      embeddingDim: Int = 64, planes: Int = 16,
      threshold: Double = 0.98): DataFrame = {
    val feats = decodeImages(media, embeddingDim)
    Dedup.embeddingEdges(feats.toDF(), vecCol = "embedding",
      idCol = "media_id", planes = planes, threshold = threshold)
  }

  /** Audio near-duplicate edges: decode → windowed-energy features →
    * hyperplane-LSH bucketing → exact-cosine verify — the audio twin
    * of [[imageNearDupEdges]], composed from [[extractAudioFeatures]]
    * and [[Dedup.embeddingEdges]] (bucketed, never all-pairs).
    * Byte-identical payloads decode to identical feature vectors, so
    * exact copies are guaranteed edges; re-encodes with the same
    * energy envelope cluster by the cosine threshold. */
  def audioNearDupEdges(media: Dataset[MediaRow],
      planes: Int = 16, threshold: Double = 0.98): DataFrame = {
    val feats = extractAudioFeatures(media)
    Dedup.embeddingEdges(feats.toDF(), vecCol = "mfcc",
      idCol = "media_id", planes = planes, threshold = threshold)
  }

  /** Render a solid-color PNG via the in-JDK encoder. Executor-safe
    * and fully deterministic (the JDK PNG writer emits no timestamps),
    * so gates and tests can plant image payloads whose decoded
    * `(width, height, channels)` and grid-mean embedding are
    * arithmetically predictable by an engine that cannot decode
    * images at all (the d30/e14 DuckDB oracles). */
  def solidPng(width: Int, height: Int, r: Int, g: Int,
      b: Int): Array[Byte] = solidImage(width, height, r, g, b, "png")

  /** Shared solid-color render for the planting writers — one body so
    * PNG and JPEG planting can never drift apart. */
  private def solidImage(width: Int, height: Int, r: Int, g: Int,
      b: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Wrap raw 8-bit unsigned PCM mono samples as a WAV payload via the
    * in-JDK writer — deterministic, executor-safe. One byte per
    * sample, so [[realDecodeAudio]]'s window boundaries align exactly
    * with sample indices (the property the d31/e16 gates predict). */
  def pcm8Wav(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 8, 1, false, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt,
      samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAV/AIFF/AU magic sniff for the in-JDK sampled-audio reader. */
  private def looksAudioDecodable(bytes: Array[Byte]): Boolean =
    bytes.length > 12 && (
      // WAV: R I F F ... W A V E
      (bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte &&
        bytes(8) == 'W'.toByte && bytes(9) == 'A'.toByte &&
        bytes(10) == 'V'.toByte && bytes(11) == 'E'.toByte) ||
      // AIFF: F O R M
      (bytes(0) == 'F'.toByte && bytes(1) == 'O'.toByte &&
        bytes(2) == 'R'.toByte && bytes(3) == 'M'.toByte) ||
      // AU: . s n d
      (bytes(0) == '.'.toByte && bytes(1) == 's'.toByte &&
        bytes(2) == 'n'.toByte && bytes(3) == 'd'.toByte))

  /** REAL decode for WAV/AIFF/AU via the in-JDK `javax.sound.sampled`
    * (round-3 verdict #7): true sample rate and frame-count-derived
    * duration, plus per-window RMS-energy features in the `mfcc` slot
    * (a real MFCC needs an FFT library this container doesn't ship;
    * windowed energy is the deterministic stand-in with the same
    * shape). Undecodable payloads fall back to the stub. */
  private def realDecodeAudio(id: Long,
      bytes: Array[Byte]): Option[AudioFeatures] = {
    if (!looksAudioDecodable(bytes)) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durationMs =
          if (frames >= 0 && fmt.getFrameRate > 0)
            (frames * 1000L / fmt.getFrameRate.toLong)
          else 0L
        val pcm = in.readAllBytes()
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val nSamples = pcm.length / bytesPerSample
        val nWindows = 13
        val energy = Array.tabulate(nWindows) { w =>
          val from = w * nSamples / nWindows
          val until = math.max(from + 1, (w + 1) * nSamples / nWindows)
          var acc = 0.0
          var i = from
          while (i < until) {
            // first byte of each sample as a crude amplitude proxy —
            // deterministic and endianness-stable for the feature shape
            val v = pcm(i * bytesPerSample) / 128.0
            acc += v * v
            i += 1
          }
          math.sqrt(acc / (until - from)).toFloat
        }
        Some(AudioFeatures(id, fmt.getSampleRate.toInt, durationMs, energy))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Batched audio decode: real WAV/AIFF/AU via the JDK, stub for
    * formats needing external codecs (mp3/ogg/flac). */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "audio")
      .mapPartitions(rows => rows.map(r =>
        realDecodeAudio(r.media_id, r.content)
          .getOrElse(stubDecodeAudio(r.media_id, r.content))))
  }

  /** Parsed MJPEG-AVI payload: true dims/rate plus the raw per-frame
    * JPEG payloads (each decodable by `javax.imageio`). */
  final case class ParsedAvi(width: Int, height: Int, usPerFrame: Int,
      frames: IndexedSeq[Array[Byte]])

  /** `fps_milli` is the frame rate in MILLI-frames-per-second
    * (fps · 1000, integer-truncated): an integer stays engine-portable
    * for the d33 gate, and unlike a plain truncated fps it does not
    * collapse sub-1fps timelapse rates to 0 (0.5 fps → 500). */
  final case class VideoMeta(media_id: Long, width: Int, height: Int,
      fps_milli: Int, n_frames: Int, duration_ms: Long)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL video decode for MJPEG-in-AVI via a pure-JDK RIFF walk (the
    * one video format this container CAN handle end-to-end: the AVI
    * container is plain RIFF structure and every frame is a JPEG the
    * in-JDK `javax.imageio` decodes — no external codec). Returns
    * None for anything that isn't a well-formed MJPEG AVI, so callers
    * fall back to the documented stub exactly as before. The walk is
    * bounds-checked throughout — a truncated or hostile payload
    * parses to None, never throws. */
  private[ops] def parseMjpegAvi(bytes: Array[Byte]): Option[ParsedAvi] = {
    if (bytes.length < 24 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    var width = 0
    var height = 0
    var usPerFrame = 0
    val frames = scala.collection.immutable.IndexedSeq.newBuilder[Array[Byte]]
    // walk chunks; LIST payloads are walked recursively (their first 4
    // bytes are the list type). Recursion depth is capped — a hostile
    // payload of nothing but nested 12-byte LIST headers would
    // otherwise overflow the stack (StackOverflowError is an Error, so
    // no downstream Exception handler would contain it). Real AVIs
    // nest 2–3 levels.
    def walk(from: Int, until: Int, depth: Int): Unit = {
      if (depth > 16) return
      var off = from
      while (off + 8 <= until) {
        val id = fourcc(bytes, off)
        // chunk size is an UNSIGNED 32-bit field: widen to Long before
        // bounds arithmetic — as a signed Int, `body + size` wraps
        // negative for sizes near 2³¹, slipping past the guard and
        // crashing copyOfRange/le32 on hostile payloads
        val size = le32(bytes, off + 4).toLong & 0xFFFFFFFFL
        val body = off + 8
        if (body + size > until) return // truncated (or size overflow)
        val sz = size.toInt // safe: size <= until - body <= bytes.length
        id match {
          case "LIST" if sz >= 4 =>
            walk(body + 4, body + sz, depth + 1) // skip list-type fourcc
          case "avih" if sz >= 40 =>
            usPerFrame = le32(bytes, body)
            width = le32(bytes, body + 32)
            height = le32(bytes, body + 36)
          case c if c.endsWith("dc") || c.endsWith("db") =>
            // '00dc'/'00db': one compressed/uncompressed frame chunk
            frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
          case _ => ()
        }
        off = body + sz + (sz & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length, 0)
    val fs = frames.result()
    // MJPEG: every frame must start with the JPEG SOI marker
    val allJpeg = fs.nonEmpty && fs.forall(f =>
      f.length > 2 && (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8)
    if (width > 0 && height > 0 && usPerFrame > 0 && allJpeg)
      Some(ParsedAvi(width, height, usPerFrame, fs))
    else None
  }

  /** Encode JPEG frames as a minimal MJPEG AVI (RIFF/hdrl/movi) — the
    * planting writer for gates and tests, deterministic byte-for-byte.
    * Standard layout readable by common players; [[parseMjpegAvi]] is
    * the product-side reader. */
  def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty, "mjpegAvi: need fps > 0 and frames")
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
    }
    def wcc(s: String): Unit = bos.write(
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val usPerFrame = 1000000 / fps
    // strl list: strh (56) + strf (40) with their chunk headers + 'strl'
    val strlSize = 4 + (8 + 56) + (8 + 40)
    // hdrl list: avih (56) + the strl LIST
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + moviBody
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    wcc("RIFF"); w32(riffSize); wcc("AVI ")
    wcc("LIST"); w32(hdrlSize); wcc("hdrl")
    wcc("avih"); w32(56)
    w32(usPerFrame); w32(0); w32(0); w32(0) // rate, maxBps, pad, flags
    w32(frames.size); w32(0); w32(1); w32(0)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    wcc("LIST"); w32(strlSize); wcc("strl")
    wcc("strh"); w32(56)
    wcc("vids"); wcc("MJPG"); w32(0); w32(0)
    w32(0); w32(1); w32(fps); w32(0)
    w32(frames.size); w32(0); w32(-1); w32(0)
    w32(0); w32(0)
    wcc("strf"); w32(40)
    w32(40); w32(width); w32(height); bos.write(1); bos.write(0)
    bos.write(24); bos.write(0); wcc("MJPG")
    w32(width * height * 3); w32(0); w32(0); w32(0); w32(0)
    wcc("LIST"); w32(moviSize); wcc("movi")
    frames.foreach { f =>
      wcc("00dc"); w32(f.length); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** Solid-color JPEG via the in-JDK encoder — the frame twin of
    * [[solidPng]] (JPEG is lossy, so gates assert frame DIMS, which
    * survive encoding exactly, not pixel values). */
  def solidJpeg(width: Int, height: Int, r: Int, g: Int,
      b: Int): Array[Byte] = solidImage(width, height, r, g, b, "jpg")

  /** Per-video metadata through the real MJPEG-AVI parse (true dims,
    * rate, frame count, duration); non-AVI payloads fall back to the
    * deterministic content-hash stub so the pipeline shape never
    * depends on the codec, mirroring image/audio decode. */
  def videoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").mapPartitions(rows => rows.map { r =>
      parseMjpegAvi(r.content) match {
        case Some(p) =>
          val fpsMilli = (1000000000L / p.usPerFrame).toInt
          VideoMeta(r.media_id, p.width, p.height, fpsMilli,
            p.frames.size,
            p.frames.size.toLong * p.usPerFrame / 1000L)
        case None =>
          val h = java.util.Arrays.hashCode(r.content)
          VideoMeta(r.media_id, 0, 0, 0, 0,
            math.abs(h % 15000L) + 1000L)
      }
    })
  }

  /** Frame sampling: every `everyMs` milliseconds, emit a frame row.
    * MJPEG-AVI payloads get REAL frames — the RIFF walk yields each
    * frame's JPEG bytes (decodable downstream by [[decodeImages]],
    * closing the container → frame-codec chain in-JDK); other
    * payloads keep the deterministic stub slices, preserving the
    * fan-out shape for formats this container has no codec for. */
  def sampleFrames(media: Dataset[MediaRow],
      everyMs: Long = 1000L, maxFrames: Int = 16): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      parseMjpegAvi(r.content) match {
        case Some(p) =>
          // sample the nearest stored frame at each everyMs tick
          val frameMs = p.usPerFrame / 1000.0
          val durationMs = (p.frames.size * frameMs).toLong
          val ticks = Iterator.iterate(0L)(_ + everyMs)
            .takeWhile(_ < math.max(durationMs, 1L)).take(maxFrames)
          ticks.zipWithIndex.map { case (ts, i) =>
            val idx = math.min(p.frames.size - 1, (ts / frameMs).toInt)
            VideoFrame(r.media_id, i, ts, p.frames(idx))
          }.toSeq
        case None =>
          val durationMs = math.abs(
            java.util.Arrays.hashCode(r.content) % 15000L) + 1000L
          val n = math.min(maxFrames, (durationMs / everyMs).toInt + 1)
          (0 until n).map { i =>
            val ts = i * everyMs
            val start = ((ts.toDouble / durationMs) * r.content.length).toInt
            val end = math.min(r.content.length, start + 256)
            VideoFrame(r.media_id, i, ts,
              java.util.Arrays.copyOfRange(r.content, start,
                math.max(start, end)))
          }
      }
    }
  }

  /** Deterministic synthetic media table for tests/benchmarks. */
  def syntheticMedia(spark: SparkSession, n: Int,
      payloadBytes: Int = 4096): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val modality = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val rnd = new scala.util.Random(i)
      val bytes = new Array[Byte](payloadBytes)
      rnd.nextBytes(bytes)
      MediaRow(i, modality, bytes,
        Map("source" -> s"src${i % 5}", "len" -> payloadBytes.toString))
    }
  }

  /** Size-aware repartition: media payloads are orders of magnitude
    * bigger than metadata rows, so partition count derives from total
    * payload bytes, not row count — keeps executor memory bounded at
    * 100 TB. */
  def repartitionBySize(df: DataFrame, contentCol: String = "content",
      targetBytesPerPartition: Long = 128L * 1024 * 1024): DataFrame = {
    val total = df.agg(sum(length(col(contentCol)))).head.getLong(0)
    val parts = math.max(1, (total / targetBytesPerPartition).toInt)
    df.repartition(parts)
  }
}
