package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: click→purchase attribution where both
  * sides arrive as streams.
  *
  * Both inputs carry watermarks, and the join condition bounds the
  * event-time distance (purchase within `window` after the click), so
  * Spark can expire join state: a click older than the watermark minus
  * the interval can never match a future purchase and is dropped from
  * the state store. Without the time bound the state would grow
  * unboundedly — the bound is what makes the join feasible on an
  * unbounded stream, the streaming analog of the batch as-of/range
  * join's pruning.
  */
object StreamJoin {

  /** Join clicks to purchases by the same user within `window` after
    * the click. Inputs need columns (user_id, click_ts, click_id) and
    * (p_user_id, purchase_ts, purchase_id); output is append-mode
    * eligible (both sides watermarked, condition time-bounded).
    */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                               window: String = "30 minutes",
                               lateness: String = "1 hour"): DataFrame =
    clicks.withWatermark("click_ts", lateness)
      .join(
        purchases.withWatermark("purchase_ts", lateness),
        expr(s"""user_id = p_user_id AND
                |purchase_ts >= click_ts AND
                |purchase_ts <= click_ts + INTERVAL $window""".stripMargin))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
}
