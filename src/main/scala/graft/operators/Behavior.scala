package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral event analytics: windowed funnel conversion and weekly
  * retention cohorts — the two product-analytics aggregates every
  * event warehouse serves (and the shapes a ClickHouse user reaches
  * for `windowFunnel`/`retention` for).
  *
  * Determinism: every timestamp is reduced to integer micros
  * (`unix_micros`) before any arithmetic, stage cuts and cohort weeks
  * are integer division, and the only floats are single rounded
  * divisions of two exact counts — engine-exact by construction.
  *
  * Scale notes (100 TB):
  *  - [[funnelConversion]] is the staged-aggregation funnel: stage k
  *    is one per-user MIN over the stage-k events joined to the stage
  *    k−1 frontier — every join and aggregate keys on `user_id`, so
  *    all stages ride the same hash partitioning (AQE reuses the
  *    exchange), and each stage's frontier only ever SHRINKS. Nothing
  *    collects; the final counts are three 1-row aggregates and the
  *    conversion join is a 1-row broadcast. The alternative —
  *    collect_list of each user's full history and a per-user scan —
  *    is unbounded per-user state and an interpreted lambda in the
  *    hot path; the staged form is all codegen'd min/count.
  *  - [[retentionCohorts]] is two per-user aggregates and one
  *    co-partitioned join, all on `user_id`, then a (cohort, offset)
  *    aggregate whose cardinality is weeks² — tiny at any corpus
  *    scale. The cohort-size denominator joins back as a broadcast of
  *    that same tiny frame, never a second scan of the events.
  */
object Behavior {

  /** Funnel stage definitions, in order. */
  val funnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Conversion window: a user's whole funnel must complete within
    * this many micros of their FIRST stage-1 event (7 days).
    */
  val funnelWindowUs: Long = 7L * 86400 * 1000 * 1000

  /** Windowed funnel: per stage, how many users reached it in order —
    * stage k's event strictly after the user's stage k−1 time and
    * within [[funnelWindowUs]] of their first stage-1 event. Output:
    * (stage_idx, stage, users, conv_pct) with conv_pct the fraction
    * of stage-1 users surviving to this stage (one rounded division
    * of exact counts).
    */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val v = e.filter(col("event_type") === funnelStages(0))
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === funnelStages(1))
      .join(v, "user_id")
      .filter(col("us") > col("v_us") &&
        col("us") <= col("v_us") + funnelWindowUs)
      .groupBy("user_id")
      .agg(min(col("us")).as("c_us"), min(col("v_us")).as("v_us"))
    val p = e.filter(col("event_type") === funnelStages(2))
      .join(c, "user_id")
      .filter(col("us") > col("c_us") &&
        col("us") <= col("v_us") + funnelWindowUs)
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
    val stages = v.agg(count(lit(1)).as("users"))
      .select(lit(1L).as("stage_idx"), lit(funnelStages(0)).as("stage"),
        col("users"))
      .unionAll(c.agg(count(lit(1)).as("users"))
        .select(lit(2L).as("stage_idx"), lit(funnelStages(1)).as("stage"),
          col("users")))
      .unionAll(p.agg(count(lit(1)).as("users"))
        .select(lit(3L).as("stage_idx"), lit(funnelStages(2)).as("stage"),
          col("users")))
      // 3-row frame feeding both the output and its own denominator —
      // materialize once so the denominator doesn't re-run the stages
      .localCheckpoint()
    val first = stages.filter(col("stage_idx") === 1L)
      .select(col("users").as("first_users"))
    stages.crossJoin(broadcast(first))
      .select(col("stage_idx"), col("stage"), col("users"),
        // null (not NaN / ANSI error) on an empty funnel
        when(col("first_users") > 0,
          round(col("users").cast("double") /
            col("first_users").cast("double"), 6)).as("conv_pct"))
      .orderBy("stage_idx")
  }

  /** Stage-to-stage latency quantiles for the [[funnelConversion]]
    * funnel — the time-to-convert report product reads next to the
    * conversion counts ("users click a median N hours after first
    * view"): per transition (view→click, click→purchase), the
    * converting-user count and the min / median / p90 / max of the
    * stage-time delta.
    *
    * Engine-exactness: deltas are exact integer micros; the median is
    * the LOWER median — the element at rank ⌈n/2⌉ of the (delta,
    * user_id) total order — and p90 the element at rank ⌈9n/10⌉,
    * picked by INTEGER rank, never interpolated (the
    * percentile-interpolation ban: Spark computes a+(b−a)f, DuckDB
    * a(1−f)+bf, and the one-ULP disagreement flips boundary rows).
    *
    * Shape: both transitions rank in ONE [[Ranks.globalTagged]] staged
    * pass over the skinny (transition, delta, user_id) union — never a
    * single-partition window; the two quantile read-offs are
    * broadcast-joined rank probes against the 2-row stats frame.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val v = e.filter(col("event_type") === funnelStages(0))
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === funnelStages(1))
      .join(v, "user_id")
      .filter(col("us") > col("v_us") &&
        col("us") <= col("v_us") + funnelWindowUs)
      .groupBy("user_id")
      .agg(min(col("us")).as("c_us"), min(col("v_us")).as("v_us"))
    val p = e.filter(col("event_type") === funnelStages(2))
      .join(c, "user_id")
      .filter(col("us") > col("c_us") &&
        col("us") <= col("v_us") + funnelWindowUs)
      .groupBy("user_id")
      .agg(min(col("us")).as("p_us"), min(col("c_us")).as("c_us"))
    val deltas = c.select(lit("1_view_click").as("transition"),
        (col("c_us") - col("v_us")).as("delta"), col("user_id"))
      .unionByName(p.select(lit("2_click_purchase").as("transition"),
        (col("p_us") - col("c_us")).as("delta"), col("user_id")))
      .localCheckpoint() // feeds the stats aggregate and the rank pass
    val ranked = Ranks.globalTagged(deltas, "transition", "rk",
      col("delta").asc, col("user_id").asc)
    val stats = deltas.groupBy("transition")
      .agg(count(lit(1)).as("n_users"), min(col("delta")).as("min_us"),
        max(col("delta")).as("max_us"))
      .localCheckpoint() // 2-row frame probed twice
    def probe(rankExpr: String, out: String): DataFrame = ranked
      .join(broadcast(stats.select(col("transition"),
        expr(rankExpr).as("__target"))), "transition")
      .filter(col("rk") === col("__target"))
      .select(col("transition"), col("delta").as(out))
    stats
      .join(probe("(n_users + 1) div 2", "med_us"), "transition")
      .join(probe("(9 * n_users + 9) div 10", "p90_us"), "transition")
      .select(col("transition"), col("n_users"), col("min_us"),
        col("med_us"), col("p90_us"), col("max_us"))
      .orderBy("transition")
  }

  /** Micros per day / days per week — the integer cohort calendar. */
  val dayUs: Long = 86400L * 1000 * 1000

  /** Weekly retention cohorts: users are cohorted by the epoch-week of
    * their first event; each (cohort_week, week_offset) row counts the
    * cohort's users active that many weeks later, with the retained
    * fraction against the cohort's size (= its offset-0 row). All
    * week arithmetic is integer division of epoch micros.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ew = Tables(spark, dir, "events")
      .select(col("user_id"),
        expr(s"(unix_micros(ts) div ${dayUs}L) div 7").as("week"))
    val firstw = ew.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = ew.distinct()
    val cells = active.join(firstw, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      // weeks²-row frame read twice (cells + sizes) — materialize once
      .localCheckpoint()
    val sizes = cells.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("active_users").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        round(col("active_users").cast("double") /
          col("cohort_size").cast("double"), 6).as("retained_pct"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Cohort LTV triangle — the VALUE-weighted companion to
    * [[retentionCohorts]]: per (cohort week, week offset), the
    * cohort's event value that period, the running cumulative value,
    * and cumulative value per cohort member — the lifetime-value
    * curve a growth model calibrates against. Sums are
    * order-independent DECIMALs cast to double at the edge (the
    * `dsum` discipline); the cumulative is a triangular join over the
    * weeks²-row cell frame (a constant at any corpus scale — never a
    * window over user-level data); per-member LTV is one rounded
    * division by the exact cohort size.
    */
  def ltvTriangle(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val ew = Tables(spark, dir, "events")
      .select(col("user_id"), col("value"),
        expr(s"(unix_micros(ts) div ${dayUs}L) div 7").as("week"))
    val firstw = ew.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = firstw.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    val cells = ew.join(firstw, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum(col("value").cast(dec)).as("v"))
      .localCheckpoint() // weeks² rows; feeds itself triangularly
    val cum = cells.as("a")
      .join(broadcast(cells.select(col("cohort_week"),
        col("week_offset").as("o2"), col("v").as("v2"))),
        Seq("cohort_week"))
      .filter(col("o2") <= col("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"), col("v"))
      .agg(sum(col("v2")).as("cum"))
    cum.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("v").cast("double").as("period_value"),
        col("cum").cast("double").as("cum_value"),
        round(col("cum").cast("double") / col("cohort_size"), 4)
          .as("ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  /** First-order Markov transition matrix over each user's event
    * stream: how often event type A is immediately followed by B
    * within the same user, with the row-conditional transition
    * probability P(B | A). The per-user successor is one `lag` window
    * PARTITIONED BY user (state bounded by a user's history, never a
    * global window); the matrix itself is |event types|² rows — tiny
    * at any corpus scale — so the per-source denominator joins back
    * as a broadcast of that same tiny frame. Counts are exact
    * integers; the single probability division is rounded at 6.
    * Ordering inside a user ties on event_id (unique), so the lag is
    * deterministic under any physical row order.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val pairs = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val matrix = pairs
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("transitions"))
      // |types|²-row frame read twice (cells + row denominators)
      .localCheckpoint()
    val totals = matrix.groupBy("prev_type")
      .agg(sum(col("transitions")).as("row_total"))
    matrix.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("transitions"),
        round(col("transitions").cast("double") /
          col("row_total").cast("double"), 6).as("p_next"))
      .orderBy("prev_type", "next_type")
  }

  /** Rolling-window anomaly flags over the per-type hourly event
    * counts: each (event_type, hour) is scored against the mean and
    * sample stddev of that type's PRIOR 24 hourly counts (the
    * trailing baseline — the current hour never sees itself), and
    * flagged when |z| > 3 with a full baseline. The hourly reduction
    * is one map-side-combined aggregate; the rolling frame is a
    * window PARTITIONED BY event_type over (types × hours) rows —
    * already reduced far below corpus size, and bounded state (25
    * rows a frame) at any scale.
    *
    * Determinism: counts, rolling sums and sum-of-squares are exact
    * integers; z is derived from those integers in a fixed expression
    * (two divisions, one sqrt) and rounded at 4; degenerate baselines
    * (fewer than 24 prior hours, or zero variance — an EXACT integer
    * predicate, so the cut never rides float noise) yield NULL z and
    * never flag. Integer-exactness bound: the n² term keeps the frame
    * sums inside int64 up to ~6·10⁸ events per (type, hour) — past
    * that, widen the two power sums to DECIMAL(38,0) (the
    * [[Analytics.orderStats]] discipline) and re-derive the oracle.
    */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val baseline = 24
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div ${3600L * 1000 * 1000}L").as("hour_idx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_idx"))
      .rowsBetween(-baseline, -1)
    val scored = hourly
      .withColumn("b_cnt", count(col("n")).over(w))
      .withColumn("b_sum", sum(col("n")).over(w))
      .withColumn("b_ss", sum(col("n") * col("n")).over(w))
    val nD = col("n").cast("double")
    val cnt = col("b_cnt").cast("double")
    val mean = col("b_sum").cast("double") / cnt
    val varS = (col("b_ss").cast("double") - col("b_sum").cast("double") * mean) /
      (cnt - 1d)
    scored
      .withColumn("z",
        when(col("b_cnt") === baseline && col("b_ss") * col("b_cnt") >
          col("b_sum") * col("b_sum"),
          round((nD - mean) / sqrt(varS), 4)))
      .select(col("event_type"), col("hour_idx"), col("n"),
        col("b_cnt"), col("b_sum"),
        col("z"), (col("z").isNotNull && abs(col("z")) > 3d).as("is_anomaly"))
      .orderBy("event_type", "hour_idx")
  }

  /** Robust (median/MAD) twin of [[hourlyAnomalies]] — the detector a
    * deployment switches to once real traffic shows heavy tails: a
    * single flood hour inflates the mean AND the σ of the rolling
    * baseline, masking the very anomaly that caused it, while the
    * median/MAD pair shrugs off up to half the window. Scores are the
    * Iglewicz–Hoaglin modified z: 0.6745·(n − med)/MAD, flagged at
    * |z| > 3.5.
    *
    * Engine-exactness: medians are LOWER medians — the element at rank
    * ⌈k/2⌉ of the sorted window — picked by integer position from the
    * sorted 24-element baseline array, never interpolated (the
    * percentile-interpolation ban); MAD deviations are integers, so
    * the only float is the final scaled division, rounded at 4. A
    * zero MAD (≥13 identical baseline counts) yields NULL, not an
    * ANSI division error.
    *
    * Shape: the same (type, hour) reduction as the mean/σ row, then a
    * 24-row sliding `collect_list` per type — window state is O(24)
    * integers per row over the model-sized hourly frame, not the
    * corpus.
    */
  def robustAnomalies(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val baseline = 24
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div ${3600L * 1000 * 1000}L").as("hour_idx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_idx"))
      .rowsBetween(-baseline, -1)
    val scored = hourly
      .withColumn("b", sort_array(collect_list(col("n")).over(w)))
      .withColumn("b_cnt", size(col("b")))
      .filter(col("b_cnt") === baseline)
      .withColumn("med", element_at(col("b"), baseline / 2))
      .withColumn("dev",
        sort_array(transform(col("b"), x => abs(x - col("med")))))
      .withColumn("mad", element_at(col("dev"), baseline / 2))
    scored
      .withColumn("robust_z",
        when(col("mad") > 0L,
          round(lit(0.6745) * (col("n") - col("med")).cast("double") /
            col("mad").cast("double"), 4)))
      .select(col("event_type"), col("hour_idx"), col("n"),
        col("med"), col("mad"), col("robust_z"),
        (col("robust_z").isNotNull && abs(col("robust_z")) > 3.5d)
          .as("is_anomaly"))
      .orderBy("event_type", "hour_idx")
  }

  /** Seasonal-naive forecast audit: predict each (type, hour) count
    * with the count 24 CALENDAR hours earlier (a self-join on
    * (type, hour−24) — calendar-correct under gaps, unlike a 24-ROW
    * lag) and report per-type MAE and MAPE of that baseline. This is
    * the floor every real forecasting deployment must beat — shipping
    * the audit makes "is the fancy model better than yesterday's
    * number" a one-query check.
    *
    * Determinism: counts and absolute errors are exact integers; MAE
    * is one rounded integer division; MAPE averages per-row exact
    * rationals in double (summation noise ~1e-13, six orders below
    * the rounding quantum). Hours with no 24h-earlier observation are
    * excluded from both (scored vs total hours reported).
    *
    * Scale shape: the hourly reduction is map-side combined; the
    * self-join and final aggregate key on event_type — (types × hours)
    * rows, far below corpus size.
    */
  def forecastBaseline(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div ${3600L * 1000 * 1000}L").as("hour_idx"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // (types × hours) rows, read twice by the join
    val fc = hourly.select(col("event_type"),
      (col("hour_idx") + 24L).as("hour_idx"), col("n").as("forecast"))
    hourly.join(fc, Seq("event_type", "hour_idx"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        count(col("forecast")).as("n_scored"),
        sum(abs(col("n") - col("forecast"))).as("sum_ae"),
        avg(when(col("forecast").isNotNull && col("n") > 0,
          abs(col("n") - col("forecast")).cast("double") /
            col("n").cast("double"))).as("mape_raw"))
      .select(col("event_type"), col("n_hours"), col("n_scored"),
        round(col("sum_ae").cast("double") / col("n_scored"), 4).as("mae"),
        round(col("mape_raw"), 6).as("mape"))
      .orderBy("event_type")
  }

  /** Weekly activity profile: event counts per (day-of-week,
    * hour-of-day) cell with each cell's share — the seasonality
    * heatmap behind the 24-hour choice in [[hourlyAnomalies]] /
    * [[forecastBaseline]]. Calendar arithmetic is PURE INTEGER —
    * dow = (epoch_day + 4) mod 7 (1970-01-01 was a Thursday; 0 =
    * Sunday), hour = epoch_hour mod 24 — because the engines' own
    * dayofweek() functions disagree on numbering conventions and
    * session-timezone interaction; integers can't. One
    * map-side-combined aggregate into a 168-row frame, the share
    * denominator a 1-row broadcast.
    */
  def weeklyProfile(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(
        expr(s"((unix_micros(ts) div ${dayUs}L) + 4) % 7").as("dow"),
        expr(s"(unix_micros(ts) div ${3600L * 1000 * 1000}L) % 24")
          .as("hour"))
      .agg(count(lit(1)).as("n"))
    val total = cells.agg(sum(col("n")).as("n_total"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("share"))
      .orderBy("dow", "hour")
  }

  /** Frozen per-type anomaly baseline — the O(|event types|) trained
    * artifact the streaming monitor serves with: hour count, Σn, Σn²
    * over the TRAINING table's per-type hourly counts, kept as exact
    * integers so the serve-side z replays the identical fixed float
    * expression. (The rolling batch audit above re-derives its
    * baseline per hour; a live monitor freezes one at deploy time —
    * the [[graft.operators.Dsir]] train-batch/serve-stream split
    * applied to monitoring.)
    */
  def anomalyBaseline(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div ${3600L * 1000 * 1000}L").as("hour_idx"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("b_cnt"), sum(col("n")).as("b_sum"),
        sum(col("n") * col("n")).as("b_ss"))

  /** Streaming anomaly monitor: tumbling 1-hour per-type counts off a
    * live event stream (watermarked append — each hour emits once),
    * scored statelessly against the frozen [[anomalyBaseline]] via a
    * stream-static broadcast join. Same guarded z expression as the
    * batch audit (NULL on a degenerate or under-filled baseline, the
    * exact integer variance predicate); state is the open hour
    * windows only. Spec pins per-hour equality with a batch
    * recomputation under the same frozen baseline.
    */
  def streamingAnomalies(events: DataFrame, baselineDf: DataFrame,
                         lateness: String = "2 hours"): DataFrame = {
    val counts = events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr(s"unix_micros(window.start) div ${3600L * 1000 * 1000}L")
          .as("hour_idx"),
        col("n"))
    val nD = col("n").cast("double")
    val cnt = col("b_cnt").cast("double")
    val mean = col("b_sum").cast("double") / cnt
    val varS = (col("b_ss").cast("double") -
      col("b_sum").cast("double") * mean) / (cnt - 1d)
    counts.join(broadcast(baselineDf), Seq("event_type"), "left")
      .withColumn("z",
        when(col("b_cnt") >= 24L && col("b_ss") * col("b_cnt") >
          col("b_sum") * col("b_sum"),
          round((nD - mean) / sqrt(varS), 4)))
      .select(col("event_type"), col("hour_idx"), col("n"), col("z"),
        (col("z").isNotNull && abs(col("z")) > 3d).as("is_anomaly"))
  }

  /** CUPED-adjusted A/B readout (Deng et al. 2013, WSDM — "Improving
    * the sensitivity of online controlled experiments by utilizing
    * pre-experiment data") — the variance-reduction technique every
    * large experimentation platform runs: per-customer POST-period
    * spend Y adjusted by the pooled regression on PRE-period spend X,
    * Ŷ = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), shrinking metric
    * variance by ρ² without biasing the treatment difference.
    *
    * Assignment is the deterministic content-hash coin
    * ([[Sampling.pctBucket]] of the customer key — md5-based, so the
    * oracle replays it); the pre/post pivot is the integer midpoint of
    * the observed order-date span ((min+max+1) div 2 epoch days —
    * exact, replayable). On a hash-split corpus the true effect is 0,
    * so diff_cuped measures exactly the noise CUPED removes.
    *
    * Float discipline: X and Y are scale-4 DECIMAL sums narrowed back
    * to (18,4) before any product (the [[Analytics.seriesCorrelation]]
    * rule — Spark would otherwise round a >38-digit product silently
    * while DuckDB stays exact); all five pooled power sums and the
    * per-group sums are exact decimals cast to double ONCE, and every
    * emitted number is a short fixed-order double expression over
    * those identical operands, rounded at 4 (the product-sum ULP
    * rule). Degenerate guards: var(X) = 0 → NULL θ/adjusted columns;
    * an empty arm → NULL diffs; never an ANSI 0/0.
    *
    * Scale shape (100 TB): one scan reduces orders to the
    * per-customer (x, y) frame (map-side-combined, keyed by customer
    * like every behavioral aggregate here); the date bounds are a
    * 1-row broadcast; everything after is ONE map-side-combined
    * aggregate to a single row — no shuffle wider than the customer
    * reduction, no window, nothing collected.
    */
  def cupedAb(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val days = Tables(spark, dir, "orders")
      .select(col("o_custkey"),
        expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div ${dayUs}L")
          .as("day"),
        col("o_totalprice").cast(dec).as("p"))
    val pivot = days.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(expr("(mn + mx + 1) div 2").as("pivot"))
    val zero = lit(0).cast(dec)
    val cust = days.crossJoin(broadcast(pivot))
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("day") < col("pivot"), col("p")).otherwise(zero))
          .cast(dec).as("x"),
        sum(when(col("day") >= col("pivot"), col("p")).otherwise(zero))
          .cast(dec).as("y"))
      .withColumn("grp",
        when(Sampling.pctBucket(col("o_custkey").cast("string")) < 50,
          "A").otherwise("B"))
    val s = cust.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      sum(when(col("grp") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("grp") === "A", col("x")).otherwise(zero))
        .cast("double").as("sx_a"),
      sum(when(col("grp") === "A", col("y")).otherwise(zero))
        .cast("double").as("sy_a"),
      sum(when(col("grp") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("grp") === "B", col("x")).otherwise(zero))
        .cast("double").as("sx_b"),
      sum(when(col("grp") === "B", col("y")).otherwise(zero))
        .cast("double").as("sy_b"))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy") - col("sx") * col("sy") // n²·cov(X,Y)
    val varxN = nD * col("sxx") - col("sx") * col("sx") // n²·var(X)
    val varyN = nD * col("syy") - col("sy") * col("sy") // n²·var(Y)
    val theta = covN / varxN
    val bothArms = col("n_a") > 0L && col("n_b") > 0L
    val dRaw = col("sy_a") / col("n_a").cast("double") -
      col("sy_b") / col("n_b").cast("double")
    val dX = col("sx_a") / col("n_a").cast("double") -
      col("sx_b") / col("n_b").cast("double")
    s.select(col("n").as("n_customers"), col("n_a"), col("n_b"),
      when(varxN > 0d, round(theta, 4)).as("theta"),
      when(bothArms, round(dRaw, 4)).as("diff_raw"),
      when(bothArms && varxN > 0d, round(dRaw - theta * dX, 4))
        .as("diff_cuped"),
      when(varxN > 0d && varyN > 0d,
        round(covN * covN / (varxN * varyN), 4)).as("var_reduction"))
  }
}
