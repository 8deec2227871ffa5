package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a batch feature-extraction path.
  *
  * The actual codecs (JPEG decode, resampling, frame sampling) are NOT
  * in this container, so `decodeFeatures` is a clearly-marked
  * deterministic stub — but the Spark-side plumbing is real and tested:
  * binary column schema, metadata projection as codegen'd expressions,
  * and partition-batched typed extraction via `mapPartitions` (the
  * Scala analog of `mapInPandas`: per-partition batch processing with a
  * typed row contract, where a real implementation would hand each
  * batch to a native decoder).
  *
  * No binary testdata ships in the harness, so [[mediaFromDocuments]]
  * fabricates the media table from document text bytes.
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
