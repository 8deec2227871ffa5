package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming half of [[graft.operators.Temporal.sessionize]]: per-user
  * sessions off a live event stream via the BUILT-IN `session_window`
  * aggregate — the preference-order win over a custom stateful
  * processor: Spark's session operator already maintains merging
  * window state (two open sessions bridged by a late middle event
  * collapse into one), emits on watermark close, and restores from
  * checkpoints, so the engine-specific code is one gap translation.
  *
  * Gap semantics, stated exactly: the batch rule starts a new session
  * when `gap > 6 h` (an event exactly 6 h after its predecessor still
  * extends the session), and `session_window` agrees — Spark merges
  * TOUCHING windows (next.start ≤ current.end, i.e. merge iff
  * diff ≤ gap), so the same gap value is microsecond-exact on both
  * paths (spec-pinned at exactly 6 h and 6 h + 1 µs). The reported
  * `session_end` is max(ts) (the batch column), not the window's
  * exclusive end (= max(ts) + gap).
  *
  * 100 TB state bound: O(open sessions within the watermark horizon)
  * — each user contributes only sessions not yet closed by the
  * watermark, and merging keeps that at O(1) per quiet user. Events
  * later than the watermark lateness are dropped, the same contract
  * as every streaming aggregate here; the batch path is the replay
  * for anything beyond it.
  */
object StreamingSessions {

  private val dec = DecimalType(18, 4)

  /** Sessionized aggregate stream: input needs (ts timestamp, user_id,
    * value); emits one row per closed session in append mode —
    * `user_id, session_start, session_end, n_events, total_value`,
    * value summed in DECIMAL and cast at the edge exactly like the
    * batch operator.
    */
  def sessionAgg(events: DataFrame,
                 gapUs: Long = 6L * 3600 * 1000 * 1000,
                 lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapUs microseconds").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
}
