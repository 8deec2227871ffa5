package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch feature-extraction paths.
  *
  * The IMAGE codec path is REAL: [[decodeImages]] and [[resizeImages]]
  * decode/resample/re-encode PNG/JPEG/GIF/BMP through the JDK's own
  * `javax.imageio` — no external dependency — with graceful None for
  * unparseable payloads (mixed corpora always contain junk bytes).
  * The AUDIO path is REAL too: [[decodeAudio]] parses WAV/AIFF/AU
  * through the JDK's `javax.sound.sampled` to true sample rate,
  * channel count, duration, and RMS/peak amplitude features. The
  * VIDEO path is REAL as well: [[demuxAvi]] walks the RIFF/AVI
  * container (pure byte arithmetic — `avih` header for frame cadence
  * and dimensions, `movi` chunk list for per-frame payloads), and
  * MJPEG frames come out as plain JPEGs that [[decodeImages]] already
  * handles; [[buildAvi]] is the matching MJPEG sink. Codecs that need
  * an inter-frame decoder (H.264 etc.) are out of scope with no AV
  * library in the container — such payloads degrade to zero frames,
  * never an error. Everything rides the production plumbing: binary
  * column schema, metadata projection as codegen'd expressions, and
  * partition-batched typed extraction via `mapPartitions` (the Scala
  * analog of `mapInPandas`: per-partition batch processing with a
  * typed row contract).
  *
  * No binary testdata ships in the harness, so [[mediaFromDocuments]]
  * fabricates the media table from document text bytes; the
  * image/audio codec specs generate real PNG/JPEG payloads via
  * `BufferedImage` and real WAV payloads via `AudioSystem.write`.
  */
object Multimodal {

  /** Opaque media row: the wire shape a real pipeline lands. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Extracted feature row (fixed-width embedding per media item). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

  /** Fabricate a binary media table (documents text → UTF-8 bytes). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        col("text").cast("binary").as("content"))

  /** Typed-metadata projection over the binary column — byte length,
    * content hash, and stub dimensions derived deterministically from
    * the payload (a real pipeline reads these from the container
    * header; the schema and plan shape are identical).
    */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"),
      (length(col("content")).cast("long") % 640 + 1).cast("int").as("width"),
      (length(col("content")).cast("long") % 480 + 1).cast("int").as("height"))

  /** Kind-agnostic fallback featurizer: folds raw bytes into a
    * fixed-width histogram — the cheap content fingerprint used when a
    * payload's kind is unknown or its codec path doesn't apply. The
    * typed decode paths ([[decodeImages]], [[decodeAudio]],
    * [[demuxAvi]]) are where per-kind features come from; this keeps
    * the same encoder schema, partition batching, and fixed feature
    * width for everything else.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // byte-fold histogram: deterministic, codec-free
        val acc = new Array[Float](dim)
        var i = 0
        while (i < r.content.length) {
          acc(i % dim) += (r.content(i) & 0xff) / 255.0f
          i += 1
        }
        MediaFeatures(r.media_id, r.content.length.toLong, acc)
      }
    }
  }

  /** A really-decoded image: true dimensions + mean channel values. */
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          n_px: Long, mean_rgb: Array[Float])

  /** REAL image decode (JDK `javax.imageio` — PNG/JPEG/GIF/BMP, zero
    * external dependencies): per-partition batch decode to true
    * dimensions and per-channel means (the cheap global feature real
    * pipelines compute for brightness/color filters). Payloads ImageIO
    * cannot parse yield no row — a mixed corpus degrades gracefully
    * instead of failing the job. Narrow (no shuffle); decode cost is
    * per-partition batch work exactly where a native codec would sit.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val acc = new Array[Double](3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                acc(0) += (rgb >> 16) & 0xff
                acc(1) += (rgb >> 8) & 0xff
                acc(2) += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Some(DecodedImage(r.media_id, w, h, n,
              acc.map(s => (s / n / 255.0).toFloat)))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** REAL image resize: decode → `Graphics2D` bilinear resample into
    * the target dimensions → re-encode as PNG. Same graceful-None
    * contract and narrow per-partition shape as [[decodeImages]].
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(ResizedRow(r.media_id, w, h, bos.toByteArray))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** A really-decoded audio clip: true container metadata plus the
    * cheap global amplitude features (RMS, peak) a pipeline filters
    * on before any expensive model runs.
    */
  case class DecodedAudio(media_id: Long, sample_rate: Int, channels: Int,
                          n_frames: Long, duration_ms: Long,
                          rms: Float, peak: Float)

  /** REAL audio decode (JDK `javax.sound.sampled` — WAV/AIFF/AU, zero
    * external dependencies): per-partition batch parse to true sample
    * rate / channels / frame count, then a pass over the samples
    * (converted to signed 16-bit PCM when the container isn't already)
    * for RMS and peak amplitude in [-1, 1]. Payloads the JDK cannot
    * parse yield no row — the same graceful-degradation contract as
    * [[decodeImages]]. Narrow (no shuffle); decode cost sits in the
    * partition function exactly where a native codec would.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val fmt = src.getFormat
          val nFrames = src.getFrameLength
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            2 * fmt.getChannels, fmt.getSampleRate, false)
          val pcm =
            if (fmt.matches(target)) src
            else javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
          val buf = new Array[Byte](8192)
          var sumSq = 0.0
          var peak = 0.0
          var nSamples = 0L
          var read = pcm.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val s = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort / 32768.0
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              nSamples += 1
              i += 2
            }
            read = pcm.read(buf)
          }
          if (nSamples == 0) None
          else Some(DecodedAudio(r.media_id, fmt.getSampleRate.toInt,
            fmt.getChannels, nFrames,
            (nFrames * 1000.0 / fmt.getSampleRate).toLong,
            math.sqrt(sumSq / nSamples).toFloat, peak.toFloat))
        } catch { case _: Exception => None }
      }
    }
  }

  /** Resized media row: payload re-encoded at target dimensions. */
  case class ResizedRow(media_id: Long, width: Int, height: Int, content: Array[Byte])

  /** One sampled frame from a video payload. */
  case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long, content: Array[Byte])

  /** Byte-window resize fixture for unknown kinds: a deterministic
    * slice proportional to the target area, keeping the typed-dims +
    * binary-payload output schema. The REAL image resample is
    * [[resizeImages]] (ImageIO decode → bilinear → PNG re-encode);
    * this exists so plumbing tests can assert the 1:1 shape without a
    * decodable payload.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = math.max(1, math.min(r.content.length, w * h / 64))
        ResizedRow(r.media_id, w, h, r.content.take(n))
      }
    }
  }

  // ---------------------------------------------------------------------
  // REAL video container path: RIFF/AVI demux + MJPEG AVI sink.
  // The AVI container is pure byte arithmetic (no codec library needed):
  // little-endian chunk sizes, an `avih` header carrying the frame
  // cadence and dimensions, and a `movi` LIST whose ##dc/##db chunks are
  // the per-frame payloads. With the conventional MJPEG codec each chunk
  // is a standalone JPEG, which the JDK's ImageIO already decodes — so
  // demux + [[decodeImages]] is a complete, dependency-free video path.
  // ---------------------------------------------------------------------

  /** A demuxed video clip: frame cadence + dimensions from `avih`,
    * per-frame payload bytes from the `movi` chunk list, in stream order.
    */
  case class AviClip(usPerFrame: Long, width: Int, height: Int,
                     frames: IndexedSeq[Array[Byte]]) {
    def tsMs(idx: Int): Long = idx * usPerFrame / 1000L
  }

  private def readU32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def tag4(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL AVI demux: walks the RIFF chunk tree — `LIST hdrl → avih`
    * for microseconds-per-frame and dimensions, `LIST movi` for the
    * `##dc`/`##db` frame chunks (sizes little-endian, chunks padded to
    * even offsets). Returns None for anything that is not a
    * well-formed AVI — the same graceful-degradation contract as
    * [[decodeImages]]: a mixed corpus never fails the job. Bounds are
    * checked against the actual payload length, so truncated files
    * yield the frames that fit rather than throwing.
    */
  def demuxAvi(bytes: Array[Byte]): Option[AviClip] = {
    try {
      if (bytes.length < 12 || tag4(bytes, 0) != "RIFF" || tag4(bytes, 8) != "AVI ")
        return None
      var usPerFrame = 0L
      var w = 0
      var h = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def isFrameChunk(cc: String): Boolean =
        cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
          cc(2) == 'd' && (cc(3) == 'c' || cc(3) == 'b')
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val cc = tag4(bytes, p)
          val sz = readU32(bytes, p + 4).toInt
          val body = p + 8
          if (sz < 0 || body > end) return
          val bodyEnd = math.min(body + sz, end)
          if (cc == "LIST" && body + 4 <= end) {
            val listType = tag4(bytes, body)
            if (listType == "hdrl" || listType == "strl" || listType == "movi" ||
                listType == "rec ")
              walk(body + 4, bodyEnd)
          } else if (cc == "avih" && sz >= 40 && body + 40 <= end) {
            usPerFrame = readU32(bytes, body)
            w = readU32(bytes, body + 32).toInt
            h = readU32(bytes, body + 36).toInt
          } else if (isFrameChunk(cc)) {
            frames += java.util.Arrays.copyOfRange(bytes, body, bodyEnd)
          }
          p = body + sz + (sz & 1) // chunks pad to even boundaries
        }
      }
      val riffEnd = math.min(12 + readU32(bytes, 4).toInt - 4, bytes.length)
      walk(12, math.max(12, riffEnd))
      if (usPerFrame <= 0L) None
      else Some(AviClip(usPerFrame, w, h, frames.toIndexedSeq))
    } catch { case _: Exception => None }
  }

  /** MJPEG AVI sink: wraps per-frame payloads (conventionally JPEGs)
    * into a standards-shaped RIFF/AVI — `hdrl` (avih + vids/MJPG strh
    * + BITMAPINFOHEADER strf), `movi` with one `00dc` chunk per frame,
    * and an `idx1` keyframe index. Round-trips byte-exactly through
    * [[demuxAvi]]; players/demuxers that read MJPEG accept the output.
    */
  def buildAvi(frames: Seq[Array[Byte]], usPerFrame: Long = 33333L,
               width: Int = 16, height: Int = 16): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val n = frames.length
    def pad(sz: Int): Int = sz + (sz & 1)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' avih LIST(strl strh strf)
    val moviSize = 4 + frames.map(f => 8 + pad(f.length)).sum
    val idx1Size = 16 * n
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    cc("RIFF"); u32(riffSize); cc("AVI ")
    cc("LIST"); u32(hdrlSize); cc("hdrl")
    cc("avih"); u32(56)
    u32(usPerFrame); u32(0); u32(0); u32(0x10 /* AVIF_HASINDEX */)
    u32(n); u32(0); u32(1 /* streams */); u32(0)
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); u32(56)
    cc("vids"); cc("MJPG"); u32(0); u32(0); u32(0)
    u32(usPerFrame /* dwScale */); u32(1000000L /* dwRate */)
    u32(0); u32(n /* dwLength */); u32(0); u32(0xffffffffL /* quality */); u32(0)
    u32(0L); u32((height.toLong << 16) | (width.toLong & 0xffff)) // rcFrame {0,0,w,h}
    cc("strf"); u32(40)
    u32(40); u32(width); u32(height); u32((24L << 16) | 1L /* planes+bits */)
    cc("MJPG"); u32(width.toLong * height * 3); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(moviSize); cc("movi")
    val offsets = new Array[Long](n)
    var off = 4L // relative to the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = off
      cc("00dc"); u32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
      off += 8 + pad(f.length)
    }
    cc("idx1"); u32(idx1Size)
    frames.zipWithIndex.foreach { case (f, i) =>
      cc("00dc"); u32(0x10 /* AVIIF_KEYFRAME */); u32(offsets(i)); u32(f.length)
    }
    out.toByteArray
  }

  /** REAL frame demux over a media table: every frame of every
    * parseable AVI payload, with container-true timestamps
    * (`frame_idx × µs-per-frame`). Non-AVI payloads yield no rows.
    * `flatMap` over partition batches — 1→N rows, still narrow.
    */
  def videoFrames(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      demuxAvi(r.content).toSeq.flatMap { clip =>
        clip.frames.zipWithIndex.map { case (f, i) =>
          FrameRow(r.media_id, i, clip.tsMs(i), f)
        }
      }
    }
  }

  /** REAL frame sampler — the one multimodal op that changes
    * cardinality: each video row explodes into ≈`everyNthMs`-spaced
    * frames, up to `maxFrames`. The stride is derived from the
    * container's own cadence (`avih` µs-per-frame), timestamps are
    * container-true, and frame payloads are the raw `movi` chunk bytes
    * (JPEGs under MJPEG — feed them to [[decodeImages]]). Non-AVI
    * payloads degrade to zero frames.
    */
  def frameSample(media: Dataset[MediaRow], everyNthMs: Long = 1000L,
                  maxFrames: Int = 8): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      demuxAvi(r.content).toSeq.flatMap { clip =>
        val stride = math.max(1L, math.round(everyNthMs * 1000.0 / clip.usPerFrame))
        Iterator.iterate(0L)(_ + stride)
          .takeWhile(_ < clip.frames.length)
          .take(maxFrames)
          .map { i => FrameRow(r.media_id, i.toInt, clip.tsMs(i.toInt), clip.frames(i.toInt)) }
          .toSeq
      }
    }
  }

  /** Deterministic byte-window sampler FIXTURE (the pre-demux shape,
    * kept for the `mm_frame_index` oracle row): explodes each payload
    * into `everyNthMs`-spaced byte windows so the DuckDB oracle can
    * replay the 1→N `flatMap` plumbing byte-exactly on payloads that
    * are not videos at all (the fabricated text-bytes media table).
    * The REAL video path is [[videoFrames]]/[[frameSample]], checked
    * by the `mm_video_frames` oracle row and VideoCodecSpec.
    */
  def frameSampleFixture(media: Dataset[MediaRow], everyNthMs: Long = 1000L,
                         maxFrames: Int = 8): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val durationMs = r.content.length.toLong
      val n = math.min(maxFrames, (durationMs / everyNthMs + 1).toInt)
      (0 until n).map { i =>
        val ts = i * everyNthMs
        val off = (ts % math.max(1, r.content.length)).toInt
        FrameRow(r.media_id, i, ts, r.content.slice(off, math.min(off + 16, r.content.length)))
      }
    }
  }

  /** The driver-checkable query: metadata extraction over the
    * fabricated media table.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(mediaFromDocuments(spark, dir)).orderBy("media_id")

  /** Driver-checkable frame-sampling query: the 1→N cardinality change
    * of [[frameSample]] reduced to a verifiable index (frame position,
    * timestamp, payload hash) — the stub codec is deterministic, so the
    * DuckDB oracle replays the byte-window arithmetic exactly and the
    * hash gate covers the whole mapPartitions/flatMap plumbing, not
    * just row counts.
    */
  def frameIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRow]
    frameSampleFixture(media).toDF()
      .select(col("media_id"), col("frame_idx"), col("ts_ms"),
        hex(col("content")).as("frame_hex"))
      .orderBy("media_id", "frame_idx")
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Fabricate a VIDEO media table: each document becomes a real
    * RIFF/AVI payload (via [[buildAvi]], 4 fps) whose `1 + doc_id % 5`
    * frame chunks carry `md5(text#i)` hex bytes — content a SQL engine
    * can derive, wrapped in a container only the real demuxer can
    * open. No binary video testdata ships in the harness; this is the
    * video analog of [[mediaFromDocuments]].
    */
  def videoFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val n = (1L + id % 5L).toInt
        val frames = (0 until n).map(i =>
          md5Hex(s"$text#$i").getBytes(java.nio.charset.StandardCharsets.US_ASCII): Array[Byte])
        MediaRow(id, "video", buildAvi(frames, usPerFrame = 250000L, width = 16, height = 16))
      }
  }

  /** Driver-checkable REAL-demux query: documents → AVI payloads →
    * [[videoFrames]] (the real RIFF chunk walk) → per-frame index with
    * container-true timestamps. The DuckDB oracle regenerates each
    * frame's content (`md5(text#i)`) and timestamp (`i × 250 ms` from
    * the 4 fps cadence) directly, so a hash match proves the demuxer's
    * offset arithmetic, chunk sizes, padding, and `avih` cadence parse
    * are all byte-exact end-to-end.
    */
  def videoFrameIndex(spark: SparkSession, dir: String): DataFrame = {
    videoFrames(videoFromDocuments(spark, dir)).toDF()
      .select(col("media_id"), col("frame_idx"), col("ts_ms"),
        col("content").cast("string").as("frame_md5"))
      .orderBy("media_id", "frame_idx")
  }

  // ——— audio feature certification (real WAV codec) ————————————————

  /** Audio fixture cadence: PCM16 mono at 8 kHz, `8 + doc_id % 5`
    * blocks of 8 samples per document.
    */
  val audioRateHz = 8000

  /** Fabricate an AUDIO media table: each document becomes a REAL WAV
    * payload (PCM16 mono little-endian, [[audioRateHz]]) whose
    * samples derive from md5 chains — block j's 16 digest bytes of
    * `md5(text ‖ '@' ‖ j)` are 8 little-endian int16 samples. Content
    * a SQL engine can derive, wrapped in a container only the real
    * codec parses: the audio analog of [[videoFromDocuments]].
    */
  def audioFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val k = (8L + id % 5L).toInt
        val pcm = new Array[Byte](k * 16)
        val mdig = java.security.MessageDigest.getInstance("MD5")
        var j = 0
        while (j < k) {
          val d = mdig.digest(
            s"$text@$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.arraycopy(d, 0, pcm, j * 16, 16)
          j += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          audioRateHz.toFloat, 16, 1, true, false) // signed, little-endian
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, k * 8L)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio", bos.toByteArray)
      }
  }

  /** Integer-exact audio features off a REAL codec decode. */
  case class AudioFeatures(media_id: Long, sample_rate: Int, n_samples: Long,
                           duration_ms: Long, peak: Int, zero_crossings: Long,
                           rms: Double)

  /** Feature extraction through the true WAV parse: container-true
    * sample rate and frame count from `javax.sound`, then ONE
    * sequential pass over the decoded int16 samples accumulating
    * ONLY integer state — sum of squares (exact in a long), peak
    * |amplitude|, and sign-change count (classes `< 0` vs `≥ 0`) —
    * so every downstream value is order-free exact arithmetic; the
    * lone float is the final `sqrt(sum_sq/n)/32768` rounded at 6.
    * PCM16-in-WAV is lossless, which is what lets a SQL oracle replay
    * the features from the md5 byte arithmetic and certify the codec
    * path. Undecodable payloads yield no row ([[decodeImages]]'s
    * contract), and so does a payload whose decoded sample count
    * disagrees with the header's frame length (a truncated or
    * header-inconsistent WAV would otherwise skew RMS/duration
    * silently); narrow per-partition work, no shuffle.
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val fmt = src.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              fmt.isBigEndian) None
          else {
            val nFrames = src.getFrameLength
            var sumSq = 0L
            var peak = 0
            var zc = 0L
            var nSamples = 0L
            var prevNeg = false
            var first = true
            val buf = new Array[Byte](8192)
            var read = src.read(buf)
            while (read > 0) {
              var i = 0
              while (i + 1 < read) {
                val v = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort.toInt
                sumSq += v.toLong * v
                val a = math.abs(v)
                if (a > peak) peak = a
                val neg = v < 0
                if (!first && neg != prevNeg) zc += 1
                prevNeg = neg
                first = false
                nSamples += 1
                i += 2
              }
              read = src.read(buf)
            }
            if (nFrames <= 0 || nSamples != nFrames) None
            else Some(AudioFeatures(r.media_id, fmt.getSampleRate.toInt,
              nFrames, nFrames * 1000L / fmt.getSampleRate.toLong,
              peak, zc,
              BigDecimal(math.sqrt(sumSq.toDouble / nFrames) / 32768.0)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** Spectral probe row: per-probe signal power plus the dominant bin. */
  case class AudioSpectral(media_id: Long, sample_rate: Int,
                           dominant_hz: Int, dominant_power: Double,
                           powers: Array[Double])

  /** Default probe bank: two octaves around concert pitch plus the
    * low-frequency bins voice/music energy concentrates in.
    */
  val spectralProbesHz: Seq[Int] = Seq(110, 220, 440, 880, 1760)

  /** Frequency-domain features via the Goertzel algorithm — single-bin
    * DFT power at a fixed probe bank, the classic tone-detection
    * kernel: O(n) per probe with three running registers, no FFT
    * buffer, so the whole bank is one sequential pass per payload
    * (narrow, zero shuffle — the same partition-batch shape as every
    * codec path here). Powers are normalized by n² (so a unit-amplitude
    * sine reads ~0.25 at its bin regardless of clip length) and the
    * dominant bin is the argmax with the lowest-frequency tie rule.
    * Floating-point: per-sample recurrence, deterministic on a fixed
    * JVM but NOT replayable in SQL — this row is spec-certified
    * against synthesized sine physics instead of a DuckDB oracle.
    */
  def audioSpectral(media: Dataset[MediaRow],
                    probesHz: Seq[Int] = spectralProbesHz): Dataset[AudioSpectral] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val fmt = src.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              fmt.isBigEndian) None
          else {
            val rate = fmt.getSampleRate.toDouble
            val coeffs = probesHz.map { f =>
              2.0 * math.cos(2.0 * math.Pi * f / rate)
            }.toArray
            val s1 = new Array[Double](coeffs.length)
            val s2 = new Array[Double](coeffs.length)
            var n = 0L
            val buf = new Array[Byte](8192)
            var read = src.read(buf)
            while (read > 0) {
              var i = 0
              while (i + 1 < read) {
                val v = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort / 32768.0
                var p = 0
                while (p < coeffs.length) {
                  val s0 = v + coeffs(p) * s1(p) - s2(p)
                  s2(p) = s1(p); s1(p) = s0
                  p += 1
                }
                n += 1
                i += 2
              }
              read = src.read(buf)
            }
            if (n == 0) None
            else {
              val powers = Array.tabulate(coeffs.length) { p =>
                (s1(p) * s1(p) + s2(p) * s2(p) - coeffs(p) * s1(p) * s2(p)) /
                  (n.toDouble * n)
              }
              var best = 0
              var i = 1
              while (i < powers.length) {
                if (powers(i) > powers(best)) best = i
                i += 1
              }
              Some(AudioSpectral(r.media_id, fmt.getSampleRate.toInt,
                probesHz(best), powers(best), powers))
            }
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** Driver-checkable REAL-codec audio query: documents → WAV payloads
    * → [[audioFeatures]] (true `javax.sound` parse) → integer-exact
    * feature index. A hash match certifies the WAV writer's header
    * arithmetic, the reader's rate/frame parse, and the PCM16
    * little-endian sample walk end-to-end against pure md5 byte
    * arithmetic in the oracle.
    */
  def audioFeatureIndex(spark: SparkSession, dir: String): DataFrame =
    audioFeatures(audioFromDocuments(spark, dir)).toDF().orderBy("media_id")

  // ——— perceptual-hash image dedup (dHash) ———————————————————————————

  /** dHash geometry: the canonical 9×8 grayscale grid — 8 rows of 8
    * "is the left pixel darker than its right neighbour" bits = a
    * 64-bit perceptual fingerprint (Krawetz's difference hash). Split
    * into two 32-bit halves so neither side of the oracle ever sums
    * into a sign bit.
    */
  val dhashW = 9
  val dhashH = 8

  /** Hamming-candidate banding: the 64 bits split into 4 × 16-bit
    * substrings (multi-index hashing, Norouzi et al. 2012) — images
    * sharing any exact 16-bit substring become a candidate pair. By
    * pigeonhole this is exact for Hamming ≤ 3; beyond that recall is
    * probabilistic exactly like MinHash-LSH banding. At 100 TB the
    * bucket population per 16-bit key is N/65536 per band — for
    * billion-image corpora widen to 8 × 16-bit substrings over a
    * 128-bit hash (the same plan shape, more bands) rather than
    * enlarging buckets.
    */
  val dhashBands = 4

  /** Verify threshold on the full 64-bit Hamming distance: ≤ 16 keeps
    * pairs whose source documents share ≳ 12 of their 16 MinHash
    * slices (each differing slice-pair rerolls one 8-bit pixel row ≈ 4
    * expected bit flips); exact duplicates land at distance 0.
    */
  val dhashHammingMax = 16

  /** Synthesize a REAL 9×8 grayscale PNG per document whose pixel rows
    * derive from the doc's MinHash slices: row r's 9 bytes are the
    * leading bytes of `md5(h(2r) ‖ h(2r+1))` over the k=16 signature
    * of [[Dedup.minhashSignatures]]. Near-duplicate texts share most
    * slices, so their images share most pixel rows — a faithful
    * simulation of "visually similar images" that a SQL oracle can
    * still derive arithmetically. PNG is lossless and 8-bit grayscale
    * round-trips byte-exact through `javax.imageio`, so the REAL
    * encode→decode below preserves oracle parity. No binary image
    * testdata ships in the harness; this is the perceptual-hash analog
    * of [[videoFromDocuments]].
    */
  def imagesFromSignatures(sigs: DataFrame): Dataset[MediaRow] = {
    import sigs.sparkSession.implicits._
    val rowDigests = (0 until dhashH).map { r =>
      md5(concat(col(s"h${2 * r}"), col(s"h${2 * r + 1}"))).as(s"d$r")
    }
    sigs.select(col("doc_id") +: rowDigests: _*)
      .as[(Long, String, String, String, String, String, String, String, String)]
      .mapPartitions { rows =>
        rows.map { t =>
          val digests = Array(t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9)
          val img = new java.awt.image.BufferedImage(
            dhashW, dhashH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var r = 0
          while (r < dhashH) {
            var c = 0
            while (c < dhashW) {
              val hexPair = digests(r).substring(2 * c, 2 * c + 2)
              raster.setSample(c, r, 0, Integer.parseInt(hexPair, 16))
              c += 1
            }
            r += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          // explicit memory-cached stream: ImageIO's default write path
          // spools every call through a disk-backed cache file — per-row
          // temp-file churn that costs more than the codec itself
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          javax.imageio.ImageIO.write(img, "png", ios)
          ios.flush()
          MediaRow(t._1, "image", bos.toByteArray)
        }
      }
  }

  /** A 64-bit perceptual hash as two sign-safe 32-bit halves. */
  case class DhashRow(media_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** REAL-codec dHash: ImageIO decode → (if not already 9×8) bilinear
    * resample to the dHash grid → difference bits off the raster. Bit
    * (r,c) = 1 iff pixel (r,c) < pixel (r,c+1); bits 0–31 (rows 0–3)
    * pack into `lo`, bits 32–63 (rows 4–7) into `hi`, each a
    * non-negative 32-bit value in a long. Undecodable payloads yield
    * None — the same graceful-degradation contract as
    * [[decodeImages]]. Narrow per-partition work, no shuffle.
    */
  def dhash64(content: Array[Byte]): Option[(Long, Long)] = {
    try {
      // memory-cached input stream for the same reason as the encode
      // side: the InputStream overload spools through a temp FILE per
      // call when ImageIO's disk cache is enabled (the default)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val src = javax.imageio.ImageIO.read(iis)
      if (src == null) return None
      val gray =
        if (src.getWidth == dhashW && src.getHeight == dhashH &&
            src.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) src
        else {
          val out = new java.awt.image.BufferedImage(
            dhashW, dhashH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, dhashW, dhashH, null)
          g.dispose()
          out
        }
      val raster = gray.getRaster
      var lo = 0L
      var hi = 0L
      var r = 0
      while (r < dhashH) {
        var c = 0
        while (c < dhashW - 1) {
          if (raster.getSample(c, r, 0) < raster.getSample(c + 1, r, 0)) {
            val idx = r * 8 + c
            if (idx < 32) lo |= 1L << idx
            else hi |= 1L << (idx - 32)
          }
          c += 1
        }
        r += 1
      }
      Some((lo, hi))
    } catch { case _: Exception => None }
  }

  /** Per-image perceptual hashes over the synthesized corpus: MinHash
    * signatures (codegen'd kernel, one shuffle) → PNG encode → REAL
    * ImageIO decode → dHash — the encode AND decode both run the true
    * codec, and PNG losslessness is what carries oracle parity.
    */
  private def dhashTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imagesFromSignatures(Dedup.signaturesUnsorted(spark, dir))
      .mapPartitions { rows =>
        rows.flatMap { m =>
          dhash64(m.content).map { case (lo, hi) => DhashRow(m.media_id, hi, lo) }
        }
      }.toDF()
  }

  /** Driver-checkable dHash index: `media_id, dhash_hi, dhash_lo`. The
    * DuckDB oracle rebuilds both halves from the MinHash-slice md5
    * arithmetic — hex-pair lexicographic comparison equals byte
    * comparison because lowercase hex encoding is order-preserving —
    * so a hash match certifies the full PNG encode→decode→raster-walk
    * path bit-for-bit.
    */
  def dhashIndex(spark: SparkSession, dir: String): DataFrame =
    dhashTable(spark, dir).orderBy("media_id")

  /** Near-duplicate image pairs: multi-index banding (4 × 16-bit
    * substrings → equi-join, never all-pairs) then exact 64-bit
    * Hamming verify ≤ [[dhashHammingMax]]. The same
    * candidates-then-verify shape as [[Dedup.lshCandidatePairs]]:
    * bucket join scales as Σ bucket², the verify is O(candidates).
    */
  def dhashPairs(spark: SparkSession, dir: String): DataFrame =
    dhashPairsUnsorted(spark, dir).orderBy("a_id", "b_id")

  private def dhashPairsUnsorted(spark: SparkSession, dir: String): DataFrame =
    dhashPairsOf(dhashTable(spark, dir).localCheckpoint())

  /** Banded multi-index candidates + Hamming verify over an already
    * materialized hash frame — shared so composed pipelines
    * ([[dhashSurvivors]]) pay for the codec pass ONCE.
    */
  private def dhashPairsOf(hsh: DataFrame): DataFrame = {
    val bands = dhashBandsOf(hsh)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        dhashHamming("a", "b"))
      .distinct()
      .filter(col("hamming") <= dhashHammingMax)
  }

  /** Duplicate-image clusters over the verified dHash pair graph —
    * the image pipeline reaching the same end state as the text one:
    * candidates ([[dhashPairs]]) → connected components
    * ([[Dedup.clusters]]: distributed pointer jumping, union-find
    * under the small-graph guard) → per-cluster survivors are one
    * `max_by` away. Cluster = smallest media_id in the component,
    * exactly the text convention, so downstream tooling is shared.
    */
  def dhashClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.clusters(dhashPairsUnsorted(spark, dir).select("a_id", "b_id"))
      .orderBy("id")

  /** Surviving image set after perceptual dedup — keep ONE image per
    * dHash cluster plus every singleton. Unlike text (where the
    * highest-quality copy wins), perceptually-near images carry no
    * quality signal the hash sees, so the representative is the
    * cluster label itself (smallest media_id — first-ingested wins,
    * deterministic). One left anti-join of the hashed domain against
    * the non-representative labels; no window, no collect.
    */
  def dhashSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val hsh = dhashTable(spark, dir).localCheckpoint() // codec pass ONCE
    val labels = Dedup.clusters(dhashPairsOf(hsh).select("a_id", "b_id"))
    val removed = labels.filter(col("id") =!= col("cluster")).select("id")
    hsh.select(col("media_id"))
      .join(removed, col("media_id") === col("id"), "left_anti")
      .orderBy("media_id")
  }

  /** 4 × 16-bit multi-index band rows for a dHash frame. */
  private def dhashBandsOf(hsh: DataFrame): DataFrame =
    (0 until dhashBands).map { b =>
      val half = if (b < 2) col("dhash_lo") else col("dhash_hi")
      hsh.select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
        lit(b).as("band"),
        shiftright(half, (b % 2) * 16).bitwiseAND(lit(65535L)).as("key"))
    }.reduce(_.unionAll(_))

  private def dhashHamming(a: String, b: String) =
    (bit_count(col(s"$a.dhash_hi").bitwiseXOR(col(s"$b.dhash_hi"))) +
     bit_count(col(s"$a.dhash_lo").bitwiseXOR(col(s"$b.dhash_lo"))))
      .cast("int").as("hamming")

  /** Incremental image-dedup ingest — the production daily shape (the
    * image analog of [[Dedup.lshIncrementalPairs]]): only the DELTA
    * (odd media_ids, the "today" batch) probes the standing BASE index
    * (even media_ids); base×base pairs were found on their own ingest
    * day and delta×delta within-batch dups are [[dhashPairs]]' job, so
    * the join is delta-sized — at 100 TB the base band index is a
    * bucketed table the delta equi-joins into, and the day's cost is
    * O(delta · bucket occupancy), independent of corpus history.
    */
  def dhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val hsh = dhashTable(spark, dir).localCheckpoint()
    val base = dhashBandsOf(hsh.filter(col("media_id") % 2 === 0))
    val delta = dhashBandsOf(hsh.filter(col("media_id") % 2 === 1))
    delta.as("d").join(base.as("b"),
        col("d.band") === col("b.band") && col("d.key") === col("b.key"))
      .select(col("d.media_id").as("delta_id"), col("b.media_id").as("base_id"),
        dhashHamming("d", "b"))
      .distinct()
      .filter(col("hamming") <= dhashHammingMax)
      .orderBy("delta_id", "base_id")
  }
}
