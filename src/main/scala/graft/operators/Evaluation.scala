package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics for the trained quality classifier — the
  * report a corpus pipeline runs after every retrain, before swapping
  * the gating model: threshold-free ranking quality (AUC) and the
  * thresholded confusion-matrix family (precision / recall / F1 /
  * Cohen's κ) of [[Perceptron.classifier]] against its `is_en` labels.
  *
  * Float discipline: the perceptron's score is an exact BIGINT margin
  * and the labels are booleans, so EVERY count here is an exact
  * integer; the metrics are single divisions of exact int64s evaluated
  * in double only at the final projection, rounded at 6 — no
  * accumulation of doubles anywhere, so the oracle replay (which
  * re-trains the model through the unrolled-epoch CTEs) is exact.
  *
  * Scale shape (100 TB): both operators reduce the corpus-sized scored
  * frame immediately — [[confusion]] to ONE row in one
  * map-side-combined aggregate; [[auc]] to the per-distinct-score
  * (n_pos, n_neg) histogram (one shuffle), whose exclusive
  * running-negative count is the distributed two-pass
  * [[Ranks.prefixSum]] — never a single-partition window over scores.
  */
object Evaluation {

  /** Exact Mann–Whitney AUC of the quality score against the `is_en`
    * label, with the standard tie treatment (ties count half):
    *
    *   AUC = (#{(p,n) : score_p > score_n} + ½·#ties) / (n⁺·n⁻)
    *
    * computed from the distinct-score histogram: for each score group,
    * its positives beat every negative STRICTLY below (the exclusive
    * prefix-sum of group negative counts over score order) and tie its
    * own negatives. The numerator is kept as the INTEGER 2·wins + ties
    * so the only float op is the final division (exact rational →
    * round 6). Pair counts carry DECIMAL(38,0): wins are bounded by
    * n⁺·n⁻, past int64 at ~3·10⁹ documents per class — inside the
    * 100 TB envelope, where a bigint product would wrap silently —
    * and [[Ranks.prefixSum]] accumulates in the same type. The EMITTED
    * pairs_won / pairs_tied columns are cast back to BIGINT at the
    * final projection (the driver-proven output surface carries no
    * DecimalType): at driver scales the values are ≤10¹¹, and past
    * ~3·10⁹ documents per class the edge cast fails LOUD (ANSI
    * overflow) rather than wrapping — the accumulation itself stays
    * exact DECIMAL(38,0). Degenerate corpora (no positives or no
    * negatives) yield a NULL auc, never an ANSI 0/0.
    *
    * Output: one row — n_pos, n_neg, pairs_won, pairs_tied, auc.
    */
  def auc(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val byScore = Perceptron.classifier(spark, dir)
      .groupBy(col("score"))
      .agg(sum(when(col("is_en"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("is_en"), 0L).otherwise(1L)).as("n_neg"))
    val withCum = Ranks.prefixSum(byScore, "n_neg", "neg_below",
      col("score").asc)
    withCum
      .agg(sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(col("n_pos").cast(d38) * col("neg_below")).cast(d38)
          .as("pairs_won"),
        sum(col("n_pos").cast(d38) * col("n_neg")).cast(d38)
          .as("pairs_tied"))
      .select(col("n_pos"), col("n_neg"),
        col("pairs_won").cast("bigint").as("pairs_won"),
        col("pairs_tied").cast("bigint").as("pairs_tied"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((lit(2L) * col("pairs_won") + col("pairs_tied"))
            .cast("double") /
            (lit(2L) * col("n_pos").cast(d38) * col("n_neg"))
              .cast("double"), 6))
          .as("auc"))
  }

  /** Thresholded evaluation of `pred_en` against `is_en`: the four
    * confusion counts plus accuracy, precision, recall, F1, and
    * Cohen's κ — all exact-integer rationals:
    *
    *   κ = (n·(tp+tn) − E) / (n² − E),
    *   E = (tp+fp)(tp+fn) + (fn+tn)(fp+tn)
    *
    * (the n²-scaled form of (p_o − p_e)/(1 − p_e), so the κ division is
    * the ONLY float op). Zero denominators (no predicted positives, no
    * actual positives, chance-perfect agreement) yield NULL for that
    * metric, never 0/0. One map-side-combined aggregate to one row.
    */
  def confusion(spark: SparkSession, dir: String): DataFrame = {
    val c = Perceptron.classifier(spark, dir)
      .agg(
        sum(when(col("pred_en") && col("is_en"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred_en") && !col("is_en"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred_en") && col("is_en"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred_en") && !col("is_en"), 1L).otherwise(0L)).as("tn"))
    // κ's n²-scale products cross int64 at ~3e9 documents (inside the
    // 100 TB envelope) — carry them in DECIMAL(38,0); the read-off is
    // one double division either way
    val d38 = "decimal(38,0)"
    val n = (col("tp") + col("fp") + col("fn") + col("tn")).cast(d38)
    val e = (col("tp") + col("fp")).cast(d38) * (col("tp") + col("fn")) +
      (col("fn") + col("tn")).cast(d38) * (col("fp") + col("tn"))
    def ratio(num: org.apache.spark.sql.Column,
              den: org.apache.spark.sql.Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
    c.select(col("tp"), col("fp"), col("fn"), col("tn"),
      ratio(col("tp") + col("tn"), n).as("accuracy"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(lit(2L) * col("tp"),
        lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"),
      when(n * n - e =!= 0,
        round((n * (col("tp") + col("tn")) - e).cast("double") /
          (n * n - e).cast("double"), 6)).as("kappa"))
  }

  /** Cumulative-gains / lift chart of the quality classifier — "how
    * many of the positives live in the top k% by score?", the campaign
    * targeting view of the same ranking [[auc]] grades: per score
    * decile (1 = highest scores) the bucket size and positives, the
    * cumulative counts, capture = cum_pos/total_pos, and
    * lift = (cum_pos/cum_docs)/(total_pos/n) — all round-6 single
    * divisions of exact int64 products.
    *
    * Decile assignment is the integer grid (rank−1)·10 div n + 1 over
    * the TOTAL order (score desc, doc_id asc) — same discipline as the
    * RFM deciles, no fractional ntile. The rank is [[Ranks.global]]
    * (range-partitioned two-pass — never a single-partition window),
    * and the ≤10-row cumulative is a broadcast triangular self-join
    * (the CUSUM-prefix shape), not a window.
    */
  def liftChart(spark: SparkSession, dir: String): DataFrame = {
    val scored = Perceptron.classifier(spark, dir)
      .select(col("doc_id"), col("score"), col("is_en"))
    val ranked = Ranks.global(scored, "rk",
      col("score").desc, col("doc_id").asc)
    val n = scored.agg(count(lit(1)).as("n"),
      sum(when(col("is_en"), 1L).otherwise(0L)).as("total_pos"))
    val dec = ranked.crossJoin(broadcast(n))
      .groupBy(expr("(rk - 1) * 10 div n + 1").as("decile"),
        col("n"), col("total_pos"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_en"), 1L).otherwise(0L)).as("n_pos"))
      .localCheckpoint() // ≤10-row grid: feeds the triangular prefix
    dec
      .join(broadcast(dec.select(col("decile").as("d2"),
        col("n_docs").as("nd2"), col("n_pos").as("np2"))),
        col("d2") <= col("decile"))
      .groupBy(col("decile"), col("n"), col("total_pos"),
        col("n_docs"), col("n_pos"))
      .agg(sum(col("nd2")).as("cum_docs"), sum(col("np2")).as("cum_pos"))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        col("cum_docs"), col("cum_pos"),
        when(col("total_pos") > 0,
          round(col("cum_pos").cast("double") /
            col("total_pos").cast("double"), 6)).as("capture"),
        when(col("total_pos") > 0 && col("cum_docs") > 0,
          round((col("cum_pos") * col("n")).cast("double") /
            (col("cum_docs") * col("total_pos")).cast("double"), 6))
          .as("lift"))
      .orderBy("decile")
  }
}
