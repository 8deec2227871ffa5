package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of [[graft.operators.Dedup.bloomIncremental]]: the
  * live-ingest duplicate gate. The batch job builds the corpus Bloom
  * once ([[graft.operators.Dedup.bloomArtifact]] — an m-bit bitmap,
  * megabytes at billions of documents); the stream probes it as a
  * NARROW per-row projection: fingerprint → k 16-bit digest positions
  * → bitmap tests against the filter words riding the plan as a
  * literal array. No state store, no shuffle, any output mode,
  * arbitrarily late data — the same frozen-artifact serve shape as
  * the anomaly baseline and the IVF cell scorer.
  *
  * Contract carried over from the batch row: NO false negatives — a
  * document whose fingerprint is in the corpus always reads
  * `maybe_dup = true`; false positives are the tunable Bloom residue
  * a downstream exact check clears.
  */
object StreamingDedup {

  /** Probe a document stream (needs a `text` column) against the
    * frozen filter; passes every input column through and appends
    * `maybe_dup`.
    */
  def maybeDupStream(stream: DataFrame, m: Long, words: Array[Long]): DataFrame = {
    val wordArr = array(words.map(lit): _*)
    val f = md5(col("text").cast("binary"))
    val checks = (0 until graft.operators.Dedup.bloomProbes).map { j =>
      val bit = conv(substring(f, 8 * j + 1, 4), 16, 10).cast("long") % m
      element_at(wordArr, (bit / 64L).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (bit % 64L).cast("int"))) =!= 0L
    }
    stream.withColumn("maybe_dup", checks.reduce(_ && _))
  }
}
