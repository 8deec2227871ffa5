package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and filtering for training-data
  * pipelines.
  *
  * Splits must be a pure function of content identity — never `rand()`
  * — so re-runs, replays, and incremental additions land every document
  * in the same split, on any cluster, at any parallelism. The bucket is
  * derived from the md5 of the key (the one hash primitive shared
  * bit-for-bit with the DuckDB oracle), taking 28 bits of hex → a
  * uniform integer mod 100.
  */
object Sampling {

  /** Percent bucket 0-99, deterministic per key. */
  def pctBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("binary")), 1, 7), 16, 10).cast("long"),
      lit(100))

  /** Train/val/test assignment: 90/5/5 by content-hash bucket. */
  def splitAssign(key: Column): Column = {
    val b = pctBucket(key)
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  /** Driver-checkable query: split sizes and token volume per split and
    * language — the reproducibility audit every corpus build ships.
    */
  def splitSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("split", splitAssign(col("text")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " "))).cast("long").as("n_tokens"))
      .orderBy("split", "lang")

  /** Quality-gate filter: keep documents passing the pretraining-corpus
    * heuristics (enough tokens, sane token length, some stopword mass —
    * the thresholds are illustrative; the shape is a conjunctive
    * predicate pushed into one narrow scan).
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val nTok = size(toks)
    val avgLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio = size(filter(toks, t =>
      t.isInCollection(Seq("the", "a", "of", "and", "in", "to", "is"))))
      .cast("double") / nTok
    Tables(spark, dir, "documents")
      .filter(nTok >= 5 && avgLen >= 2.0 && avgLen <= 12.0 && stopRatio >= 0.05)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }
}
