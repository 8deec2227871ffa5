package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch corpus ingestion: JSONL documents with an EXPLICIT schema and a
  * dead-letter side channel for corrupt records — the batch analog of
  * the CDC path's schema-event dead-lettering (T7), and the shape a
  * 100 TB web-corpus landing zone actually has (crawler output is never
  * clean; silently dropping bad lines loses data, failing the job on
  * them loses the day).
  *
  * Discipline mirrors the change stream: schema is DECLARED, never
  * inferred (inference over 100 TB both costs a pass and drifts with
  * the data); parsing runs PERMISSIVE with `_corrupt_record` captured,
  * so one narrow scan splits clean rows from quarantined raw lines.
  */
object CorpusIngest {

  val corruptCol = "_corrupt_record"

  /** Read JSONL at `path` against `schema`; returns the full frame with
    * the corrupt-record column attached (null = parsed cleanly).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Clean rows only (typed columns, corrupt column dropped). */
  def clean(ingested: DataFrame): DataFrame =
    ingested.filter(col(corruptCol).isNull).drop(corruptCol)

  /** Quarantined raw lines, for repair/audit — the dead-letter output.
    * Spark requires caching the parsed frame before filtering on the
    * corrupt column (it refuses the query otherwise, since a
    * corrupt-only projection could skip parsing entirely).
    */
  def deadLetter(ingested: DataFrame): DataFrame =
    ingested.cache().filter(col(corruptCol).isNotNull).select(corruptCol)

  /** Streaming JSONL landing: tail a directory of corpus files with the
    * SAME declared schema + PERMISSIVE corrupt-record discipline as the
    * batch path — new crawler drops become micro-batches, corrupt
    * lines stay quarantined per batch, and the whole stream is
    * checkpointable (exactly-once landing). [[clean]] / [[deadLetter]]
    * apply unchanged to the returned frame.
    */
  def streamJsonl(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add(StructField(corruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Running per-language corpus totals over a streaming document
    * frame — the live ingestion dashboard every corpus build watches
    * (docs and tokens per language so far). Update-mode aggregate:
    * state is O(languages), each micro-batch revises only the
    * languages it touched — the streaming form of
    * [[graft.operators.TextAnalysis.tokenStats]].
    */
  def runningLangTotals(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Streaming first-occurrence dedup: emit each distinct document text
    * ONCE across the whole stream, suppressing later copies — the
    * streaming form of [[graft.operators.Dedup.exact]], and the online
    * half of the incremental-dedup story: a live ingest keeps the
    * corpus exact-deduped as drops arrive instead of re-running a batch
    * pass. Keyed by the md5 fingerprint, never the body, so the state
    * store holds 16-byte digests.
    *
    * With `lateness` set (and an event-time column on the stream),
    * state is bounded by the replay horizon
    * (`dropDuplicatesWithinWatermark` — a duplicate arriving later than
    * the watermark delay can slip through, the at-least-once trade
    * every bounded-state dedup makes); with `lateness = None` the dedup
    * is exact and state grows O(distinct fingerprints) — 16 bytes per
    * distinct doc, ~1.6 GB per 100M docs, the documented cost of
    * exactness.
    */
  def streamingFirstOccurrence(docs: DataFrame,
                               eventTimeCol: String = "ingest_ts",
                               lateness: Option[String] = Some("10 minutes")): DataFrame = {
    val fingerprinted = docs.withColumn("fp", md5(col("text").cast("binary")))
    lateness match {
      case Some(l) => fingerprinted
        .withWatermark(eventTimeCol, l)
        .dropDuplicatesWithinWatermark("fp")
      case None => fingerprinted.dropDuplicates("fp")
    }
  }
}
