package graft.streaming

import graft.operators.Behavior
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One buffered funnel event: micros, stage index (0 = view …), and
  * the original event-time column (kept so the watermark column
  * flows into the stateful operator).
  */
case class FunnelEvent(user_id: Long, us: Long, stage: Int)

/** One closed funnel per user: the stage-minima frontier and the
  * stage reached. `c_us`/`p_us` are None when the stage was never
  * reached inside the window.
  */
case class FunnelUser(user_id: Long, v_us: Long, c_us: Option[Long],
                      p_us: Option[Long], stage_reached: Int)

/** Streaming half of [[Behavior.funnelConversion]]: per-user funnel
  * frontiers off a live event stream, exact batch semantics per user.
  *
  * Why buffering instead of incremental minima: the batch rule is
  * v = min(view), c = min(click ∈ (v, v+W]), p = min(purchase ∈
  * (c, v+W]) — c's ELIGIBILITY depends on v, so an out-of-order
  * earlier view shifts the window and can both admit previously
  * ineligible clicks and expel the stored one. No fixed set of
  * per-stage minima is sufficient under unordered arrival; the only
  * exact plan is to buffer a user's events until event time has
  * provably passed their funnel window, then fold once. That is what
  * the event-time timer does: when the first view lands, the user's
  * timer is set to v + W (the watermark's own lateness bound delays
  * the firing by exactly the allowed straggler horizon), re-armed
  * earlier whenever an earlier view arrives; on fire, the buffer is
  * folded with the batch rule, ONE row emitted (append mode), state
  * cleared.
  *
  * 100 TB state bound: O(users with an open funnel) entries, each
  * O(that user's funnel-stage events inside a W + lateness event-time
  * horizon) — never corpus history. Users with no view are garbage-
  * collected on a rolling min_ts + W timer that drops only events at
  * or before the expired horizon (future-dated buffered events
  * survive and re-arm), so a click flood without a view cannot pin
  * state forever. Caveats, stated plainly: exactly ONE funnel per
  * user is emitted (the batch rule's global-first-view semantics —
  * later views are not a second funnel), and events arriving beyond
  * the watermark lateness are dropped by the watermark like every
  * other streaming aggregate here.
  */
object StreamingFunnel {

  /** Event-time micros → the ms timer grid, rounded UP so a timer can
    * never fire before the watermark truly passed the micros deadline.
    */
  private def ceilMs(us: Long): Long = (us + 999L) / 1000L

  class FunnelProcessor(windowUs: Long)
      extends StatefulProcessor[Long, FunnelEvent, FunnelUser] {

    @transient private var buf: ListState[FunnelEvent] = _
    // (deadlineUs, hasView) — the single armed timer per user
    @transient private var deadline: ValueState[(Long, Boolean)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[FunnelEvent]("events",
        Encoders.product[FunnelEvent], TTLConfig.NONE)
      deadline = getHandle.getValueState[(Long, Boolean)]("deadline",
        Encoders.product[(Long, Boolean)], TTLConfig.NONE)
    }

    private def rearm(events: Seq[FunnelEvent]): Unit = {
      val views = events.filter(_.stage == 0)
      val (newUs, hasView) =
        if (views.nonEmpty) (views.map(_.us).min + windowUs, true)
        else (events.map(_.us).min + windowUs, false)
      val prev = if (deadline.exists()) Some(deadline.get()) else None
      if (!prev.contains((newUs, hasView))) {
        prev.foreach { case (oldUs, _) => getHandle.deleteTimer(ceilMs(oldUs)) }
        getHandle.registerTimer(ceilMs(newUs))
        deadline.update((newUs, hasView))
      }
    }

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[FunnelUser] = {
      rows.foreach(buf.appendValue)
      val events = buf.get().toSeq
      if (events.nonEmpty) rearm(events)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[FunnelUser] = {
      val events = buf.get().toSeq
      val views = events.filter(_.stage == 0)
      if (views.nonEmpty) {
        // close the funnel: the exact batch fold
        val v = views.map(_.us).min
        val c = events.filter(e => e.stage == 1 && e.us > v &&
          e.us <= v + windowUs).map(_.us).minOption
        val p = c.flatMap(cUs => events.filter(e => e.stage == 2 &&
          e.us > cUs && e.us <= v + windowUs).map(_.us).minOption)
        buf.clear(); deadline.clear()
        Iterator.single(FunnelUser(key, v, c, p,
          1 + c.size + p.size))
      } else {
        // viewless GC: drop the expired horizon, keep future-dated
        // events (a late-opening funnel may still need them)
        val expiredUs = info.getExpiryTimeInMs * 1000L
        val kept = events.filter(_.us > expiredUs)
        buf.clear(); deadline.clear()
        if (kept.nonEmpty) { kept.foreach(buf.appendValue); rearm(kept) }
        Iterator.empty
      }
    }
  }

  /** Per-user funnel frontier stream: input needs (ts timestamp,
    * user_id, event_type); emits one [[FunnelUser]] row per user whose
    * funnel window closed under the watermark. Append mode; requires
    * the RocksDB state store provider (transformWithState).
    */
  def funnelFrontier(events: DataFrame,
                     lateness: String = "2 hours"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val stages = Behavior.funnelStages
    val typed = events
      .withWatermark("ts", lateness)
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === stages(0), 0)
          .when(col("event_type") === stages(1), 1)
          .otherwise(2).as("stage"),
        col("ts")) // keep the watermark column flowing into the operator
      .drop("ts")
      .as[FunnelEvent]
    typed.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(Behavior.funnelWindowUs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
