package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of [[graft.operators.Stats.benfordDigits]]: a live
  * first-significant-digit census over an order stream, so the
  * fabricated-data screen runs as money rows LAND instead of waiting
  * for the nightly audit — the alarm case (a bad upstream starts
  * emitting truncated or synthetic amounts) is precisely the one
  * where waiting costs a day of poisoned ingest.
  *
  * Shape: the digit read is the same STRING-form projection as the
  * batch operator (never log10 on data), and the only state is the
  * running count per digit — ≤ 9 groups forever, map-side combined,
  * update mode emits the digits touched each batch. Expected-share
  * comparison stays a read-off against the nine Benford constants
  * downstream (they are literals, not state). Per-digit equality with
  * the batch census after any replay is spec-pinned
  * (StreamingStatsSpec) — the batch operator's ppm/χ² columns derive
  * from these counts alone, so count parity IS full parity.
  */
object StreamingStats {

  /** Running digit counts over a stream carrying `o_totalprice`
    * (DECIMAL); emits `(digit, n_obs)`.
    */
  def benfordCounts(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_totalprice") >= 1)
      .groupBy(substring(col("o_totalprice").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .agg(count(lit(1)).as("n_obs"))

  /** Streaming half of the HDR quantile sketch
    * ([[graft.operators.Sketches.hdrQuantiles]]) — the latency-
    * dashboard serve shape: watermarked tumbling-window HDR CELLS over
    * an event stream, so per-window tail-quantile brackets are live as
    * rows land instead of waiting for the nightly sketch. The bucket
    * rule is the SAME projection the batch build uses
    * ([[graft.operators.Sketches.hdrBuckets]] — e from the binary-
    * string-length identity, sub by integer shift, never a float log),
    * so per-cell parity with the batch sketch on the same window slice
    * is structural (spec-pinned in StreamingStatsSpec).
    *
    * State: O(windows-in-flight × live cells) — cells are bounded
    * (≤ 64 octaves × 2^subBits, a few hundred live for any money
    * column), and the watermark expires window state, so state is
    * O(cells) forever. Update mode emits the cells touched each batch;
    * downstream a dashboard MAX-merges nothing — cell tables per
    * window are final once the watermark passes, and any range rolls
    * up by keyed sum (linearity), exactly like the batch/incremental
    * halves. Contract: v ≥ 1 (the caller filters or inherits the batch
    * row's sub-unit exclusion).
    *
    * @param values stream with an event-time column and an integer
    *               value column (e.g. cents)
    */
  def hdrWindowCells(values: DataFrame, valueCol: String, tsCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    graft.operators.Sketches.hdrBuckets(
        values.withWatermark(tsCol, watermarkDelay)
          .filter(col(valueCol) >= 1L),
        valueCol)
      .groupBy(window(col(tsCol), windowDur), col("e"), col("sub"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("e"), col("sub"),
        (col("e") * (1L << graft.operators.Sketches.hdrSubBits) +
          col("sub")).as("key"),
        col("n"))
}
