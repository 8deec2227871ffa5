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
}
