package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal operators over event streams: as-of join and
  * sessionization — the two workhorses of event-time feature
  * engineering that Spark lacks as built-ins.
  *
  * Scale notes (100 TB):
  *  - [[asofJoin]] uses the union + running-`last` trick: both sides
  *    shuffle ONCE on the key, then a single window pass picks the
  *    latest right row per left row. The naive alternative — a range
  *    join (`l.key = r.key AND r.t <= l.t`) then max-per-left — explodes
  *    quadratically per key and is unusable at scale.
  *  - [[sessionize]] is one shuffle on user_id; the gap flag + running
  *    sum + session aggregate all ride the same partitioning, so
  *    Catalyst plans a single Exchange reused across the three steps.
  */
object Temporal {

  private val dec = DecimalType(18, 4)

  /** As-of join: for each left row, the latest right row with the same
    * `key` and `right(rightTime) <= left(leftTime)` (inclusive; at
    * equal timestamps the right row is visible to the left row). Left
    * rows with no prior right row keep nulls — LEFT ASOF semantics.
    *
    * Right columns (except `key`) are emitted with `rightPrefix`.
    * Single shuffle on `key`; no range-join blowup.
    *
    * @param rightTiebreak right-side column breaking ties among right
    *   rows sharing (key, rightTime): the row with the LARGEST value
    *   wins, making the match deterministic run-to-run (the window
    *   order is otherwise partial and the winner would depend on
    *   partition-internal row order). Pass the right side's unique id.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPrefix: String = "",
               rightTiebreak: Option[String] = None): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == key).toSeq
    val rStruct = struct(rPayloadCols.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType

    // side=0 sorts right rows before left rows at equal time ⇒ inclusive
    val r2 = right.select(col(key).as("__key"), col(rightTime).as("__t"),
      lit(0).as("__side"), rStruct.as("__r"), lit(null).cast(lType).as("__l"))
    val l2 = left.select(col(key).as("__key"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(rType).as("__r"), lStruct.as("__l"))

    // running `last` picks the final right row in window order, so an
    // ascending tiebreak makes the largest id win deterministically;
    // left rows (__r null) are unaffected by the extra sort key.
    val tiebreak = rightTiebreak.toSeq.map(c => col("__r").getField(c).asc)
    val w = Window.partitionBy(col("__key"))
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val out = r2.unionByName(l2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftCols = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val rightCols = rPayloadCols.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    out.select(leftCols ++ rightCols: _*)
  }

  /** Last-touch attribution: each purchase event joined as-of to the
    * user's most recent prior (or simultaneous) click, with the
    * click→purchase gap in microseconds; purchases with no prior click
    * keep nulls.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    asofJoin(purchases, clicks, "user_id", "purchase_ts", "click_ts",
        rightTiebreak = Some("click_id"))
      .withColumn("gap_us",
        unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
      .select("purchase_id", "user_id", "purchase_ts", "click_id",
        "click_ts", "gap_us")
      .orderBy("purchase_id")
  }

  /** Session-level product metrics off [[sessionize]] — the report a
    * product team reads daily: session count, bounce rate (single-
    * event sessions), and the typical session length. The median is
    * the LOWER median picked from the events-per-session HISTOGRAM
    * (bounded distinct sizes → a model-sized frame) by cumulative
    * count — the smallest size whose running total reaches ⌈n/2⌉ — via
    * a triangular join over that tiny histogram: integer-exact, no
    * interpolation, no global window. Bounce rate is one rounded
    * division of exact counts.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val sessions = sessionize(spark, dir)
      .select(col("n_events"))
    val hist = sessions.groupBy("n_events").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // bounded by distinct session sizes
    val h2 = hist.select(col("n_events").as("sz2"), col("cnt").as("cnt2"))
    val cum = hist.join(broadcast(h2), col("sz2") <= col("n_events"))
      .groupBy(col("n_events")).agg(sum(col("cnt2")).as("cum"))
    val totals = hist.agg(
      sum(col("cnt")).as("n_sessions"),
      sum(when(col("n_events") === 1L, col("cnt")).otherwise(0L)).as("n_bounce"))
    val med = cum.crossJoin(broadcast(totals))
      .filter(col("cum") * 2 >= col("n_sessions"))
      .agg(min(col("n_events")).as("med_events"))
    totals.crossJoin(broadcast(med))
      .select(col("n_sessions"), col("n_bounce"),
        round(col("n_bounce").cast("double") / col("n_sessions"), 4)
          .as("bounce_rate"),
        col("med_events"))
  }

  /** Attribution lookback window: 7 days in microseconds. */
  val attributionLookbackUs: Long = 7L * 86400L * 1000000L

  /** Linear multi-touch attribution — the companion to
    * [[lastTouchAttribution]]: every click by the purchase's user
    * inside the 7-day lookback shares the purchase value equally, the
    * standard position-blind credit model. Simultaneous clicks count
    * (gap 0, the last-touch convention); zero-touch purchases keep
    * `n_touches = 0` with a NULL credit — never a division by zero
    * under ANSI.
    *
    * Credit is allocated in INTEGER micro-units (`credit_e8` = the
    * value scaled to 1e-8 units, floor-divided by the touch count) —
    * the payment-ledger discipline, and the engine-exact one: a
    * floating `round(value/n, 4)` systematically TIES at the rounding
    * digit (any 4-decimal value over n=2 ends in …5 at digit 5) and
    * the engines break ties differently — observed live at sf0.1.
    * Integer floor division cannot tie.
    *
    * Shape: one equi-join on `user_id` with the lookback as a range
    * post-filter, then a per-purchase count — per-user click volumes
    * bound the join fan-out, and at 100 TB both sides bucket on
    * `user_id` so the join co-locates without a shuffle.
    */
  def multiTouchAttribution(spark: SparkSession, dir: String,
                            lookbackUs: Long = attributionLookbackUs): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val gap = unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))
    p.join(c, col("user_id") === col("c_user") &&
        gap >= 0L && gap <= lookbackUs, "left")
      .groupBy(col("purchase_id"), col("user_id"), col("purchase_ts"), col("value"))
      .agg(count(col("click_id")).as("n_touches"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("n_touches"),
        when(col("n_touches") > 0,
          expr("(CAST(round(value * 10000) AS BIGINT) * 10000) div n_touches"))
          .as("credit_e8"))
      .orderBy("purchase_id")
  }

  /** Sessionization: per-user sessions split at inactivity gaps
    * > `gapUs` (default 6 h). lag → gap flag → running sum (session
    * seq) → session aggregate, all on one user_id partitioning.
    */
  def sessionize(spark: SparkSession, dir: String,
                 gapUs: Long = 6L * 3600 * 1000 * 1000): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Events a session path keeps before truncation ([[topPaths]]). */
  val pathMaxLen = 8

  /** Session floor for a path to appear in the [[topPaths]] census. */
  val pathFloor = 2L

  /** Session path analysis — the "what do users actually DO" census
    * behind funnel design: each session's first [[pathMaxLen]] event
    * types joined as `a>b>c`, counted across sessions, floor-cut at
    * [[pathFloor]] (an exact integer cut, never a fractional top-k),
    * with the truncated-session count carried so long sessions are
    * visible, not silent.
    *
    * Determinism: the per-session event order is the (us, event_id)
    * total order via `sort_array` over (us, event_id, type) structs —
    * event_id unique makes the sort exact; every output is an integer
    * or a string.
    *
    * Shape (100 TB): sessions label with the [[sessionize]] per-user
    * window (partitioned — parallel), ONE groupBy collects each
    * session's bounded event list (bounded by the session gap
    * semantics, same contract as sessionize itself), and the census is
    * a map-side-combined count keyed by the ≤ pathMaxLen-type string.
    */
  def topPaths(spark: SparkSession, dir: String,
               gapUs: Long = 6L * 3600 * 1000 * 1000): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val paths = Tables(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(
        concat_ws(">", expr(
          s"transform(slice(evs, 1, $pathMaxLen), e -> e.event_type)"))
          .as("path"),
        (size(col("evs")) > pathMaxLen).as("truncated"))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("truncated"), 1L).otherwise(0L)).as("n_truncated"))
      .filter(col("n_sessions") >= pathFloor)
      .orderBy(col("n_sessions").desc, col("path"))
  }
}
