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

  /** The driver-checkable query: metadata extraction over the
    * fabricated media table.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(mediaFromDocuments(spark, dir)).orderBy("media_id")
}
