package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Interval algebra over event time: sweep-line concurrency and
  * calendar-frame rolling aggregates — the two operator shapes behind
  * "how loaded is the system" and "how is the trend moving" dashboards
  * that neither a plain groupBy nor a row-frame window expresses.
  *
  * Scale notes (100 TB):
  *  - [[concurrentSessions]] never sorts the corpus globally: the
  *    sweep is partitioned by HOUR bucket (each hour's boundary events
  *    sort independently, in parallel), and what crosses the bucket
  *    boundary is only the CARRY-IN count — sessions still open at the
  *    hour start — computed from per-hour start/end histograms, two
  *    calendar-bounded frames. A finer grain (minute) is the lever if
  *    an hour of boundaries outgrows a partition; the algebra is
  *    grain-independent.
  *  - [[rollingRevenue]] reduces the corpus to a calendar-bounded
  *    daily frame FIRST (one map-side-combined shuffle), then builds
  *    the trailing frame as a broadcast range self-join over that tiny
  *    frame — never a corpus-row window.
  */
object Intervals {

  private val dec = DecimalType(18, 4)

  private val hourUs = 3600L * 1000 * 1000
  private val dayUs = 24L * hourUs

  /** Peak concurrent sessions per day — the instantaneous-load metric
    * (capacity planning, license sizing, abuse spikes): at every
    * instant, how many user sessions are simultaneously open, reported
    * as the per-day maximum alongside the day's session-start count.
    *
    * Algorithm (distributed sweep-line): sessions are [[Temporal.sessionize]]
    * intervals, INCLUSIVE on both ends (open at t iff start ≤ t ≤ end).
    * Each session emits a +1 boundary at its start and a −1 at its end,
    * bucketed by hour; within an hour the running sum over boundaries
    * ordered (us ASC, delta DESC — starts before ends at the same
    * instant, matching inclusive ends) traces concurrency relative to
    * the hour's opening level; the opening level (carry-in) is
    * #starts-before − #ends-before the hour start, prefix sums over
    * per-hour start/end histograms (calendar-bounded, so the prefix is
    * a triangular join over a tiny frame — the `ltvTriangle`
    * discipline). Peak(hour) = carry + max(0, max running sum);
    * peak(day) = max over its hours. Ties inside one (us, delta) group
    * cannot change the max: all +1s at an instant apply before any −1,
    * so the traced maximum is order-free.
    *
    * Every number is an exact integer — no floats anywhere, so the
    * oracle replay is bit-trivial.
    */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    val s = Temporal.sessionize(spark, dir)
      .select(unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
      .localCheckpoint() // feeds histograms, deltas, spine, and starts
    val sH = s.groupBy(expr(s"s_us div $hourUs").as("h"))
      .agg(count(lit(1)).as("n_start"))
    val eH = s.groupBy(expr(s"e_us div $hourUs").as("h"))
      .agg(count(lit(1)).as("n_end"))
    // full calendar spine over the corpus span: hours with no
    // boundaries still report (their peak is the pure carry level)
    val spine = s
      .agg(min(expr(s"s_us div $hourUs")).as("h0"),
        max(expr(s"e_us div $hourUs")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .localCheckpoint() // calendar-bounded
    // carry-in at the hour start instant: sessions with s_us < h·U and
    // e_us ≥ h·U ⇔ (starts in any earlier hour) − (ends in any earlier
    // hour) — prefix sums as triangular joins over the bounded frames
    val sb = broadcast(spine)
      .join(sH.withColumnRenamed("h", "h2"), col("h2") < col("h"))
      .groupBy("h").agg(sum(col("n_start")).as("sb"))
    val eb = broadcast(spine)
      .join(eH.withColumnRenamed("h", "h2"), col("h2") < col("h"))
      .groupBy("h").agg(sum(col("n_end")).as("eb"))
    val deltas = s
      .select(expr(s"s_us div $hourUs").as("h"), col("s_us").as("us"),
        lit(1L).as("delta"))
      .union(s.select(expr(s"e_us div $hourUs"), col("e_us"), lit(-1L)))
    val sweep = Window.partitionBy(col("h"))
      .orderBy(col("us").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inHour = deltas.withColumn("run", sum(col("delta")).over(sweep))
      .groupBy("h").agg(max(col("run")).as("max_run"))
    val peakH = spine
      .join(sb, Seq("h"), "left")
      .join(eb, Seq("h"), "left")
      .join(inHour, Seq("h"), "left")
      .select(col("h"),
        (coalesce(col("sb"), lit(0L)) - coalesce(col("eb"), lit(0L)) +
          greatest(coalesce(col("max_run"), lit(0L)), lit(0L))).as("peak"))
    val started = s.groupBy(expr(s"s_us div $dayUs").as("day"))
      .agg(count(lit(1)).as("n_started"))
    peakH.groupBy(expr("h div 24").as("day"))
      .agg(max(col("peak")).as("peak_concurrent"))
      .join(started, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_started"), lit(0L)).as("n_started"),
        col("peak_concurrent"))
      .orderBy("day")
  }

  /** Trailing window width for [[rollingRevenue]] (the current day plus
    * six before it — the standard week-over-week smoothing frame).
    */
  val rollingDays = 7

  /** Trailing 7-day revenue per order day — the rolling trend line a
    * revenue dashboard plots over the daily series: for each day with
    * orders, that day's revenue, the trailing-window total, the number
    * of trailing days that actually had orders, and the per-active-day
    * average.
    *
    * Float discipline: revenue sums stay DECIMAL(18,4) end to end
    * (order totals are scale-2 inputs, so the daily and trailing sums
    * are exact integers in scaled units on both engines) and only the
    * final projection casts to double — exact below 2⁵³ scaled units.
    * The average divides two exact values and rounds at 4; the
    * denominator is the ACTIVE-day count (≥ 1 by construction — the
    * day itself is in its own window), never a zero.
    */
  def rollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
        .as("day"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
      .localCheckpoint() // calendar-bounded daily frame
    val trail = daily.select(col("day").as("d2"), col("rev").as("rev2"))
    daily
      .join(broadcast(trail),
        col("d2") >= col("day") - (rollingDays - 1) && col("d2") <= col("day"))
      .groupBy(col("day"), col("rev"))
      .agg(sum(col("rev2")).as("rev_7d"), count(lit(1)).as("n_active_days"))
      .select(col("day"), col("rev").cast("double").as("rev"),
        col("rev_7d").cast("double").as("rev_7d"), col("n_active_days"),
        round(col("rev_7d").cast("double") / col("n_active_days"), 4)
          .as("rev_per_active_day"))
      .orderBy("day")
  }

  /** Trailing-window length for [[ewmaRevenue]] — the EWMA is
    * truncated at 14 calendar days so the weights stay EXACT int64s
    * (an unbounded (3/4)^d tail cannot: 3^d outgrows the 53-bit
    * mantissa past d=33, and decimal powers of 0.75 grow two digits
    * per day).
    */
  val ewmaDays = 14

  /** Integer EWMA weights, most-recent-first: w(d) = 3^d · 4^(K−1−d)
    * for calendar gap d — the (3/4)^d decay (α = 1/4) scaled by
    * 4^(K−1) so every weight is an exact int64.
    */
  private[graft] val ewmaW: Array[Long] = {
    val k = ewmaDays
    (0 until k).map(d =>
      BigInt(3).pow(d).toLong * BigInt(4).pow(k - 1 - d).toLong).toArray
  }

  /** Inclusive prefix sums of [[ewmaW]]: cum(m) = Σ_{d≤m} w(d) — the
    * warm-up denominators (a day m < K−1 days past the corpus start
    * has only m+1 calendar days behind it).
    */
  private[graft] val ewmaCum: Array[Long] = ewmaW.scanLeft(0L)(_ + _).tail

  /** Exponentially-weighted trailing revenue per order day — the
    * smoothed trend twin of [[rollingRevenue]] (recent days weighted
    * (3/4)^gap instead of uniformly), the line a dashboard overlays on
    * the raw daily series.
    *
    * CALENDAR convention: a day with no orders contributes zero
    * revenue but still occupies its weight slot — the denominator is
    * the full window's weight mass Σ_{d≤min(K−1, t−t0)} w(d) (warm-up
    * aware), not just the active days', so a quiet week genuinely
    * drags the average down. Numerator terms only exist for active
    * days (zero terms are zero), so the join stays over the daily
    * frame.
    *
    * Float discipline: daily revenue is DECIMAL(18,4) (exact scaled
    * units) and weights exact int64s, but a weight×revenue PRODUCT
    * overflows int64 once daily revenue passes ~1.4·10⁷ units (4^13 ·
    * 10⁴ · rev > 2⁶³ — sf0.1 already trips it), so the numerator
    * accumulates in DECIMAL(38,0) (HUGEINT on the oracle side) and
    * the half-up round-to-4-decimals happens entirely in integer
    * space — r = (2·10⁴·num + den) div (2·den) — so neither engine ever
    * casts a >2⁵³ value to double; the only float op is r/10⁴ on a
    * ≲10¹² integer, IEEE-exact in both engines. Headroom: 38 digits
    * carry the numerator past 10³⁰, i.e. any conceivable daily
    * revenue. Shape: daily reduction first (one map-side-combined
    * shuffle), then the trailing frame as a broadcast range self-join
    * over the calendar-bounded daily frame — never a corpus-row
    * window.
    */
  def ewmaRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs")
        .as("day"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
      .localCheckpoint() // calendar-bounded daily frame
    val trail = daily.select(col("day").as("d2"),
      (col("rev") * 10000).cast("decimal(20,0)").as("ru"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    daily
      .join(broadcast(trail),
        col("d2") >= col("day") - (ewmaDays - 1) && col("d2") <= col("day"))
      .groupBy(col("day"), col("rev"))
      .agg(sum(element_at(lit(ewmaW),
        (col("day") - col("d2") + 1).cast("int")).cast("decimal(10,0)") *
        col("ru")).as("num"))
      .crossJoin(broadcast(d0))
      .withColumn("den",
        element_at(lit(ewmaCum),
          (least(lit(ewmaDays - 1L), col("day") - col("d0")) + 1)
            .cast("int")) * lit(10000L))
      .select(col("day"), col("rev").cast("double").as("rev"),
        (expr("(num * 10000 * 2 + den) div (den * 2)").cast("double")
          / 10000.0).as("ewma_rev"))
      .orderBy("day")
  }

  /** Sessions impacted by anomalous traffic hours — the interval×interval
    * OVERLAP JOIN an incident report runs ("which user sessions ran
    * during the flagged hours, and for how long"): user sessions
    * ([[Temporal.sessionize]] intervals, inclusive ends) against the
    * hours [[Behavior.hourlyAnomalies]] flags, reported per session-start
    * day as affected-session count, session·hour incidences, and total
    * overlapped time.
    *
    * Join shape (the banding idiom): a session emits its covered hour
    * buckets (`explode(sequence(...))` — fan-out bounded by session
    * length in hours, never corpus-quadratic) and equi-joins the
    * anomalous-hour set, which is calendar-bounded (flagged hours ⊆
    * corpus hours) and broadcast — the corpus never co-shuffles against
    * the interval set. Overlap micros per (session, hour) is
    * min(e, hEnd) − max(s, hStart) + 1 in inclusive-microsecond terms —
    * every output is an exact integer, so the oracle replay is
    * bit-trivial.
    */
  def anomalyOverlap(spark: SparkSession, dir: String): DataFrame = {
    val anom = Behavior.hourlyAnomalies(spark, dir)
      .filter(col("is_anomaly"))
      .select(col("hour_idx").as("h")).distinct()
      .localCheckpoint() // calendar-bounded flagged-hour set
    val s = Temporal.sessionize(spark, dir)
      .select(col("user_id"), col("session_seq"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
    val covered = s.select(col("user_id"), col("session_seq"),
      col("s_us"), col("e_us"),
      explode(sequence(expr(s"s_us div $hourUs"), expr(s"e_us div $hourUs")))
        .as("h"))
    val perSession = covered.join(broadcast(anom), Seq("h"))
      .groupBy(col("user_id"), col("session_seq"), col("s_us"))
      .agg(count(lit(1)).as("n_hours"),
        sum(least(col("e_us"), (col("h") + 1) * hourUs - 1) -
          greatest(col("s_us"), col("h") * hourUs) + 1).as("ov_us"))
    perSession
      .groupBy(expr(s"s_us div $dayUs").as("day"))
      .agg(count(lit(1)).as("n_affected_sessions"),
        sum(col("n_hours")).as("n_session_hours"),
        sum(col("ov_us")).as("total_overlap_us"))
      .orderBy("day")
  }
}
