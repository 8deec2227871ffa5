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
  * channel count, duration, and RMS/peak amplitude features. VIDEO
  * demuxing has no in-container library, so `frameSample` (and the
  * generic `decodeFeatures`) remain clearly-marked deterministic
  * stubs around the production plumbing: binary column schema,
  * metadata projection as codegen'd expressions, and partition-batched
  * typed extraction via `mapPartitions` (the Scala analog of
  * `mapInPandas`: per-partition batch processing with a typed row
  * contract).
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

  /** STUB DECODER — deterministic fake. A real deployment replaces the
    * body of the partition function with calls into an image/audio
    * library over each batch; everything around it (encoder schema,
    * partition batching, fixed feature width) is the production shape.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // ??? real codec goes here; fake: bytes folded into `dim` floats
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

  /** STUB RESIZE — per-partition batch transform to fixed target
    * dimensions. A real deployment decodes each batch, resamples, and
    * re-encodes inside the partition function; the fake keeps a
    * deterministic byte slice proportional to the target area so output
    * size scales the way a real resize does. Narrow (no shuffle); the
    * output schema (typed dims + binary payload) is the production shape.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // ??? real resample goes here; fake: slice bytes to ~area/64
        val n = math.max(1, math.min(r.content.length, w * h / 64))
        ResizedRow(r.media_id, w, h, r.content.take(n))
      }
    }
  }

  /** STUB FRAME SAMPLER — the one multimodal op that changes
    * cardinality: each video row explodes into `everyNthMs`-spaced
    * frames. Implemented as `flatMap` over partition batches (1→N rows,
    * still narrow); a real build hands the container to a demuxer and
    * yields decoded frames. Frame count is derived deterministically
    * from payload size so tests can assert the contract.
    */
  def frameSample(media: Dataset[MediaRow], everyNthMs: Long = 1000L,
                  maxFrames: Int = 8): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      // ??? real demux/decode goes here; fake duration: 1 ms per byte
      val durationMs = r.content.length.toLong
      val n = math.min(maxFrames, (durationMs / everyNthMs + 1).toInt)
      (0 until n).map { i =>
        val ts = i * everyNthMs
        // fake frame payload: a window into the source bytes at `ts`
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
    frameSample(media).toDF()
      .select(col("media_id"), col("frame_idx"), col("ts_ms"),
        hex(col("content")).as("frame_hex"))
      .orderBy("media_id", "frame_idx")
  }
}
