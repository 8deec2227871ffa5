package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every document by the log importance
  * weight log p_target(doc) / p_raw(doc) under hashed-unigram bag
  * models of a target domain vs the raw corpus — the standard
  * "select web data that looks like the quality domain" pass of a
  * training-data pipeline.
  *
  * Determinism contract with the oracle: the only float steps are the
  * 256 per-bucket log-ratios, each a fixed-shape expression over exact
  * integer counts, rounded to 4 decimals and SCALED TO AN INTEGER
  * (×10⁴) before they ever meet an aggregation — the per-document
  * score is then an exact integer dot product Σ c_b · lwi_b, immune to
  * float summation order. The reported weight divides once at the end.
  *
  * Scale shape (100 TB): one corpus scan explodes tokens into a
  * map-side-combined (doc, source, bucket) count — the only
  * corpus-sized shuffle, on that composite key. Bucket marginals,
  * corpus totals, and the 256-row log-weight table all aggregate FROM
  * that reduction and come back as broadcasts; the per-document score
  * is a broadcast join + one more map-side-combined sum. The hashed
  * feature space (256 buckets) is constant-size regardless of
  * vocabulary, which is the point of hashed DSIR.
  */
object Dsir {

  /** Hashed-unigram feature width. */
  val numBuckets = 256

  /** The stand-in "quality/target domain": a fixed source allowlist
    * (the synthetic corpus has no real quality tiers; any fixed subset
    * exercises the estimator end-to-end).
    */
  val targetSources = Seq("src1", "src2", "src3")

  /** Token → bucket: first 4 hex chars of md5, mod [[numBuckets]] —
    * the md5-prefix integer hash every cross-engine kernel here uses.
    */
  private def bucketOf(token: Column): Column =
    conv(substring(md5(token.cast("binary")), 1, 4), 16, 10)
      .cast("long") % numBuckets

  /** The per-(doc, source, bucket) token-count reduction — the single
    * corpus-sized pass everything else aggregates from (source rides
    * along for free; it is functionally dependent on doc_id).
    */
  private def bucketCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), " ")).as("token"))
      .withColumn("bucket", bucketOf(col("token")))
      .groupBy("doc_id", "source", "bucket").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds 4 aggregates; one explode, not four

  /** The trained estimator: 256 rows of (bucket, lwi) — the add-1
    * smoothed log-ratio per bucket, rounded then ×10⁴ into an exact
    * integer weight (see class doc). The O(buckets) artifact a
    * pipeline stores and every scorer broadcasts.
    */
  private def bucketWeights(cnt: DataFrame): DataFrame = {
    val b = lit(numBuckets.toDouble)
    val isTarget = col("source").isInCollection(targetSources)
    val raw = cnt.groupBy("bucket").agg(sum(col("c")).as("r_cnt"))
    val tgt = cnt.filter(isTarget)
      .groupBy("bucket").agg(sum(col("c")).as("t_cnt"))
    val totals = cnt.agg(
      sum(col("c")).as("n_r"),
      sum(when(isTarget, col("c")).otherwise(0L)).as("n_t"))
    raw
      .join(tgt, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(round(
          log((coalesce(col("t_cnt"), lit(0L)) + 1.0) / (col("n_t") + b)) -
            log((col("r_cnt") + 1.0) / (col("n_r") + b)), 4) * 10000)
          .cast("long").as("lwi"))
  }

  /** Per-document DSIR log importance weight over the whole corpus:
    * (doc_id, n_tokens, dsir_logw, selected) — `selected` is the
    * importance-resampling acceptance direction (weight > 0 ⇔ doc
    * looks more target-like than raw-average).
    */
  def weights(spark: SparkSession, dir: String): DataFrame = {
    val cnt = bucketCounts(spark, dir)
    cnt.join(broadcast(bucketWeights(cnt)), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("lwi")).as("sc"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sc").cast("double") / 10000.0).as("dsir_logw"),
        (col("sc") > 0L).as("selected"))
      .orderBy("doc_id")
  }

  /** The trained weights as a dense array indexed by bucket (0 for a
    * bucket no corpus token hashed into) — the driver-side artifact
    * [[streamingScores]] serves, mirroring the perceptron's
    * train-batch/serve-stream split.
    */
  def trainedWeights(spark: SparkSession, dir: String): Array[Long] = {
    val w = new Array[Long](numBuckets)
    bucketWeights(bucketCounts(spark, dir)).collect().foreach { r =>
      w(r.getLong(0).toInt) = r.getLong(1)
    }
    w
  }

  /** The "R" of DSIR — importance RESAMPLING: accept each document
    * with probability min(1, exp(logw)) (positive-weight documents
    * always; the rest in proportion to how target-like they look),
    * decided DETERMINISTICALLY by comparing a 28-bit content-hash
    * uniform against the acceptance probability — the same
    * never-`rand()` discipline as [[Sampling.splitAssign]], so re-runs
    * and incremental rebuilds accept exactly the same documents.
    *
    * Cross-engine contract: the only float step is one `exp`, rounded
    * to an integer at 10⁻⁶; the acceptance test is then a pure
    * integer comparison u·10⁶ < p·2²⁸ (no float ever meets the
    * hash). Map-only on top of [[weights]]' aggregation.
    */
  def resample(spark: SparkSession, dir: String): DataFrame = {
    val sc = round(col("dsir_logw") * 10000).cast("long")
    val u28 = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit("#dsir-u")).cast("binary")), 1, 7), 16, 10).cast("long")
    val pScaled = round(exp(least(sc, lit(0L)).cast("double") / 10000.0)
      * 1000000).cast("long")
    weights(spark, dir)
      .select(col("doc_id"), col("dsir_logw"), pScaled.as("p_scaled"),
        u28.as("u28"))
      .select(col("doc_id"), col("dsir_logw"),
        (col("p_scaled").cast("double") / 1000000.0).as("p_accept"),
        col("u28"),
        (col("u28") * 1000000L < col("p_scaled") * 268435456L)
          .as("accepted"))
      .orderBy("doc_id")
  }

  /** Batch-trained model → streaming inference: score arriving
    * documents with the stored bucket weights — a stateless narrow
    * projection (hash, look up, integer-sum per row; no shuffle, no
    * state), so it runs identically on a stream or a batch frame.
    * Per-document scores are exactly [[weights]]' `sc` (the integer
    * dot product commutes with per-row accumulation).
    */
  def streamingScores(docs: DataFrame, lwi: Array[Long]): DataFrame = {
    require(lwi.length == numBuckets, s"expected $numBuckets weights")
    val perTok = transform(split(trim(col("text")), " "),
      t => element_at(typedLit(lwi), (bucketOf(t) + 1).cast("int")))
    val sc = aggregate(perTok, lit(0L), (acc, x) => acc + x)
    docs.select(col("doc_id"), sc.as("sc_scaled"))
      .withColumn("dsir_logw", col("sc_scaled").cast("double") / 10000.0)
      .withColumn("selected", col("sc_scaled") > 0L)
  }
}
