package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classical hypothesis-test statistics over warehouse frames — the
  * "is this difference real" layer a pipeline consults before acting
  * on a dashboard delta: χ² independence (are segment and priority
  * related?), two-sample Kolmogorov–Smirnov (did the spend
  * distribution shift?), and CUSUM changepoint location (WHEN did the
  * daily series break?).
  *
  * Float discipline (shared by all three): every statistic here is a
  * rational of exact integers — counts, DECIMAL-summed revenue micros,
  * rank-cumulated cell counts — and the division happens ONCE at the
  * final projection, or not at all (fixed-point ppm/1e4 integer
  * read-offs via the half-up integer rounding (2·num+den) div (2·den),
  * the [[Intervals.ewmaRevenue]] discipline). No mean/variance doubles
  * accumulate anywhere, so the DuckDB oracles replay bit-equal.
  */
object Stats {

  /** χ² test of independence over the (customer market segment ×
    * order priority) contingency — "do segments order with different
    * urgency?": one row with the observed total, the degrees of
    * freedom, the χ² statistic, and Cramér's V effect size.
    *
    * Exactness: with row totals r_i, column totals c_j, and grand
    * total n, each cell's contribution is a² / (n·r_i·c_j) with
    * residual a = n·n_ij − r_i·c_j; both sides are exact integers
    * carried in DECIMAL(38,0) (the square passes 2⁶³ once n·n_ij
    * clears ~3·10⁹ — true well below 100 TB), and each cell is floored
    * to ppm BEFORE the sum via the STAGED identity
    * 10⁶·a² div den = 10⁶·(a² div den) + 10⁶·(a² mod den) div den —
    * exact floor algebra that never forms the 10⁶·a² product, so
    * χ² = Σppm/10⁶ is a sum of exact integers with one float division
    * at the end — never a sum of doubles whose order the two engines
    * could disagree on. Cramér's V takes one IEEE sqrt of that exact
    * rational, rounded at 6.
    *
    * Exactness envelope (honest ceiling, not just the 2⁶³ crossing):
    * the staged form needs a² < 10³⁸ (i.e. |a| < 10¹⁹) and
    * 10⁶·(a² mod den) < 10³⁸ (den = n·r_i·c_j ≤ n³, i.e.
    * n < 4.6·10¹⁰). The residual bound is the binding one only under
    * near-total dependence (|a| ≤ n²/4 ⇒ worst-case exact through
    * n ≈ 6·10⁹ orders); at realistic effect sizes |a| ≈ φ·n·√(r·c)
    * stays under 10¹⁹ well past 10¹⁰ rows. Beyond the envelope Spark's
    * non-ANSI decimal overflow nulls chi2/cramers_v in the 1-row
    * output — visible, but a ceiling to know about. (The pre-staged
    * form overflowed ~30× earlier, at n ≈ 2·10⁸ adversarial.)
    *
    * Shape (100 TB): orders join the broadcast customer-segment dim,
    * reduce map-side to the R×C cell grid (BOUNDED by the category
    * cross, 25 rows here, never corpus-sized); margins derive from the
    * grid itself. One shuffle total.
    */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = Tables(spark, dir, "orders")
      .join(broadcast(Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))),
        "o_custkey")
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint() // the bounded R×C grid: margins + cells
    val rows = cells.groupBy("seg").agg(sum(col("n_obs")).as("r_i"))
    val cols = cells.groupBy("prio").agg(sum(col("n_obs")).as("c_j"))
    val tot = cells.agg(sum(col("n_obs")).as("n"),
      countDistinct(col("seg")).as("nr"),
      countDistinct(col("prio")).as("nc"))
    cells
      .join(broadcast(rows), "seg")
      .join(broadcast(cols), "prio")
      .crossJoin(broadcast(tot))
      .withColumn("a2",
        pow2(col("n").cast(d38) * col("n_obs").cast(d38) -
          col("r_i").cast(d38) * col("c_j").cast(d38)))
      .withColumn("den", col("n").cast(d38) * col("r_i").cast(d38) *
        col("c_j").cast(d38))
      // staged floor: 10⁶·a² div den without ever forming 10⁶·a²
      .withColumn("q2", expr("a2 div den"))
      .select(col("n"), col("nr"), col("nc"),
        (expr(s"cast(1000000 as $d38)") * col("q2") +
          expr(s"(cast(1000000 as $d38) * (a2 - q2 * den)) div den"))
          .as("ppm"))
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(col("ppm")).as("ppm"))
      .select(col("n").as("n_total"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        (col("ppm").cast("double") / 1e6).as("chi2"),
        when(col("n") > 0 && least(col("nr"), col("nc")) > 1,
          round(sqrt(col("ppm").cast("double") / 1e6 /
            (col("n") * (least(col("nr"), col("nc")) - 1)).cast("double")),
            6)).as("cramers_v"))
  }

  /** The two spend populations [[ksTest]] compares: building-segment
    * customers' orders vs automobile-segment customers' orders.
    */
  val ksSegments: (String, String) = ("BUILDING", "AUTOMOBILE")

  /** Exact two-sample Kolmogorov–Smirnov statistic between the order
    * totalprice distributions of two customer segments: one row with
    * both sample sizes, the integer D numerator, D itself, and the
    * price where the EDF gap peaks (smallest such price on ties).
    *
    * Exactness: D = max_x |F₁(x) − F₂(x)| = max |n₂·cum₁(x) −
    * n₁·cum₂(x)| / (n₁·n₂), and the running difference n₂·cum₁ −
    * n₁·cum₂ is the prefix sum of the per-distinct-price integer
    * n₂·c₁ − n₁·c₂ — ONE [[Ranks.prefixSum]] over price order, exact
    * DECIMAL(38,0) throughout (|value| ≤ 2·n₁·n₂ crosses int64 at
    * ~3·10⁹ rows per side — INSIDE the 100 TB envelope, where an
    * int64 prefix would wrap silently; the decimal form is exact to
    * ~10¹⁹ per side. The EMITTED d_num is cast back to BIGINT at the
    * final projection (the driver-proven output surface carries no
    * DecimalType); at any driver scale it fits easily, and past
    * ~3·10⁹ rows per side the edge cast fails LOUD via ANSI overflow
    * rather than wrapping — the accumulation stays decimal), with a
    * single round-6 division at the read-off (both factors widened to
    * decimal before the product for the same reason).
    *
    * Shape (100 TB): the corpus reduces to the distinct-price
    * histogram (one map-side-combined shuffle), the prefix sum is the
    * distributed two-pass range-partition form (never a
    * single-partition window), and the argmax is a broadcast probe of
    * the 1-row max frame. The EDF step set is distinct-value-bounded.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val seg = broadcast(Tables(spark, dir, "customer")
      .filter(col("c_mktsegment").isin(ksSegments._1, ksSegments._2))
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")))
    val hist = Tables(spark, dir, "orders")
      .join(seg, "o_custkey")
      .groupBy(col("o_totalprice").as("price"))
      .agg(sum(when(col("c_mktsegment") === ksSegments._1, 1L)
        .otherwise(0L)).as("c1"),
        sum(when(col("c_mktsegment") === ksSegments._2, 1L)
          .otherwise(0L)).as("c2"))
      .localCheckpoint() // distinct-price histogram: sizes + prefix pass
    val sizes = hist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val diffed = hist.crossJoin(broadcast(sizes))
      .select(col("price"), col("n1"), col("n2"),
        (col("n2").cast(d38) * col("c1") - col("n1").cast(d38) * col("c2"))
          .cast(d38).as("d"))
    val cum = Ranks.prefixSum(diffed, "d", "d_below", col("price").asc)
      .select(col("price"), col("n1"), col("n2"),
        abs(col("d_below") + col("d")).cast(d38).as("gap"))
      .localCheckpoint() // feeds the max and the argmax probe
    val peak = cum.groupBy(col("n1"), col("n2"))
      .agg(max(col("gap")).as("d_num"))
    cum
      .join(broadcast(peak), Seq("n1", "n2"))
      .filter(col("gap") === col("d_num"))
      .groupBy(col("n1"), col("n2"), col("d_num"))
      .agg(min(col("price")).cast("double").as("ks_at"))
      .select(col("n1"), col("n2"),
        col("d_num").cast("bigint").as("d_num"),
        when(col("n1") > 0 && col("n2") > 0,
          round(col("d_num").cast("double") /
            (col("n1").cast(d38) * col("n2")).cast("double"), 6)).as("d"),
        col("ks_at"))
  }

  /** CUSUM changepoint location over the daily-revenue series — "the
    * level shifted; WHICH day?": one row with the active-day count,
    * the peak-|CUSUM| day (ties → earliest), the peak deviation mass
    * per day, and the mean daily revenue before (≤ cp) and after.
    *
    * The statistic: with x_t the t-th active day's revenue and x̄ the
    * series mean, S_t = Σ_{i≤t}(x_i − x̄) peaks where the level
    * shifts. Scaled by n it is EXACT: n·S_t = n·P_t − t·T (P_t the
    * revenue prefix sum, T the total), all DECIMAL(38,0) integers in
    * 10⁻⁴ revenue units. Every read-off is the integer half-up
    * rounding (2·num+den) div (2·den) at scale 4, so no engine ever
    * rounds a >2⁵³ double.
    *
    * Shape (100 TB): the corpus reduces to the CALENDAR-BOUNDED daily
    * frame first (one map-side-combined shuffle); the prefix sums are
    * a broadcast triangular self-join over that bounded frame (the
    * [[Intervals.rollingRevenue]] shape — days², still trivial at any
    * corpus scale), never a corpus-row window.
    */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr(s"unix_micros(cast(o_orderdate as timestamp)) div ${Behavior.dayUs}")
        .as("day"))
      .agg((sum(col("o_totalprice").cast(dec)) * 10000).cast(d38).as("x"))
      .localCheckpoint() // calendar-bounded daily frame
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
    val s = daily
      .join(broadcast(daily.select(col("day").as("d2"), col("x").as("x2"))),
        col("d2") <= col("day"))
      .groupBy(col("day"))
      .agg(sum(col("x2")).as("p"), count(lit(1)).as("rk"))
      .crossJoin(broadcast(tot))
      .select(col("day"), col("n"), col("t"),
        abs(col("n").cast(d38) * col("p") -
          col("rk").cast(d38) * col("t")).as("ns"))
      .localCheckpoint() // feeds the peak and the argmin-day probe
    val peak = s.groupBy(col("n"), col("t")).agg(max(col("ns")).as("ns_max"))
    val cp = s.join(broadcast(peak), Seq("n", "t"))
      .filter(col("ns") === col("ns_max"))
      .groupBy(col("n"), col("t"), col("ns_max"))
      .agg(min(col("day")).as("cp_day"))
    val before = daily.join(broadcast(cp.select(col("cp_day"))),
        col("day") <= col("cp_day"))
      .agg(count(lit(1)).as("n_b"), sum(col("x")).as("s_b"))
    val after = daily.join(broadcast(cp.select(col("cp_day"))),
        col("day") > col("cp_day"))
      .agg(count(lit(1)).as("n_a"), sum(col("x")).as("s_a"))
    // num is already in 10⁻⁴ revenue units, so num/cnt IS the scale-4
    // fixed point — half-up integer round (2·num + cnt) div (2·cnt),
    // then one exact double division by 10⁴
    def fix4(num: String, cnt: String): Column =
      when(col(cnt) > 0, expr(s"($num * 2 + $cnt) div ($cnt * 2)")
        .cast("double") / 1e4)
    cp.crossJoin(broadcast(before)).crossJoin(broadcast(after))
      .select(col("n").as("n_days"), col("cp_day"),
        // peak |S| per day of series mass: |n·S| / (n·10⁴)
        fix4("ns_max", "n").as("cusum_peak"),
        fix4("s_b", "n_b").as("mean_before"),
        fix4("s_a", "n_a").as("mean_after"))
  }

  /** The two order-status populations [[welchTTest]] compares:
    * fulfilled orders vs still-open orders.
    */
  val welchGroups: (String, String) = ("F", "O")

  /** Welch's unequal-variance two-sample t on order totalprice between
    * the two [[welchGroups]] statuses — "do open orders run larger
    * than fulfilled ones?": one row with both sample sizes, the
    * round-4 means and sample variances, the t statistic, and the
    * Welch–Satterthwaite degrees of freedom, both round-6.
    *
    * Exactness — the textbook TWO-PASS anchored variance (Chan et
    * al.'s corrected two-pass, in exact integers): pass 1 reduces each
    * group to (n, Σx) with x the EXACT scale-4 integer price and
    * anchors at the integer floor-mean m = Σx div n; pass 2 sums the
    * anchored squares S2 = Σ(x−m)². The variance numerator
    * n·Σx² − (Σx)² equals n·S2 − S1² for ANY constant shift (here
    * S1 = Σ(x−m) = Σx mod n < n), but the anchored operands stay
    * INTRINSIC: S2 ≤ n·spread² (spread = max price deviation, a domain
    * constant ~5.6·10⁹ at scale 4) and S1² < n² — the raw route's
    * (Σx)² ≈ n²·μ² crossed DECIMAL(38,0) at n ≈ 2·10⁹ rows. The v4
    * read-off then avoids even the n·S2 product via staged floor
    * algebra: with T = S2 − (S1² div n), u = S1² mod n,
    * X = 2T + 10⁴(n−1), Y = 2·10⁴(n−1), q = X div Y, r = X mod Y,
    *   v4 = (2(n·S2−S1²) + 10⁴n(n−1)) div (2·10⁴n(n−1))
    *      = q − [n·r < 2·u]
    * (exact: the numerator is n·X − 2u = q·nY + (n·r − 2u) with
    * |n·r − 2u| < nY, so the floor is q minus one exactly when
    * n·r < 2u). Largest intermediate is S2 ≤ n·3.2·10¹⁹ — inside
    * DECIMAL(38,0) past 10¹⁷ rows, so the 10¹²-row claim now holds
    * with room (the pre-anchored form silently nulled var/t/df at
    * n ≈ 2·10⁹ via Spark's non-ANSI decimal overflow). Mean stays the
    * half-up scale-4 read-off ((2Σx+n) div 2n). The doubles both
    * engines feed the t formula are therefore IDENTICAL integers/10⁴,
    * and t and df are fixed chains of IEEE +,−,×,÷,√ (all correctly
    * rounded, engine-independent), rounded at 6. Groups of n < 2 yield
    * NULL t/df, never 0/0.
    *
    * Shape (100 TB): TWO map-side-combined aggregates over the same
    * 2-column projection (the anchor join is a broadcast of the 2-row
    * group frame) — the extra scan is the price of an exact variance
    * envelope that actually covers the corpus; everything after is
    * driver-trivial broadcast arithmetic.
    */
  def welchTTest(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val xs = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus").isin(welchGroups._1, welchGroups._2))
      .select(col("o_orderstatus").as("grp"),
        (col("o_totalprice").cast(dec) * 10000).cast(d38).as("x"))
    // pass 1: (n, Σx) + the integer floor-mean anchor per group
    val base = xs.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .withColumn("m", expr("s div n"))
    // pass 2: anchored squared deviations — (x−m) is intrinsic (price
    // spread, not corpus mass), so S2 never carries the n²·μ² term
    // that overflowed the raw n·Σx² − (Σx)² route
    val dev = xs
      .join(broadcast(base.select(col("grp"), col("m"))), "grp")
      .groupBy("grp")
      .agg(sum(pow2(col("x") - col("m"))).as("s2"))
    val g = base.join(broadcast(dev), "grp")
      // S1 = Σ(x−m) = s − n·m = s mod n ∈ [0, n) — algebraic, no
      // third pass; n enters every product as DECIMAL (bare bigint
      // 10⁴·n·(n−1) would wrap past n ≈ 10⁸ rows)
      .withColumn("s1", expr(s"s - cast(n as $d38) * m"))
      .withColumn("tt", expr(s"s2 - (s1 * s1) div cast(n as $d38)"))
      .withColumn("u",
        expr(s"s1 * s1 - cast(n as $d38) * ((s1 * s1) div cast(n as $d38))"))
      .withColumn("xx", expr(s"2 * tt + 10000 * (cast(n as $d38) - 1)"))
      .withColumn("yy", expr(s"2 * 10000 * (cast(n as $d38) - 1)"))
      // ANSI: yy = 0 at n = 1, and the eager checkpoint below evaluates
      // every column — the division must carry its own n > 1 guard (the
      // read-off's lazy `when` no longer shields it)
      .withColumn("qq", when(col("n") > 1, expr("xx div yy")))
      .withColumn("rr", when(col("n") > 1, expr("xx - qq * yy")))
      // fixed-point read-offs: the ONLY exit from the integer domain
      .select(col("grp"), col("n"),
        expr("(2 * s + n) div (2 * n)").cast("double").as("m4"),
        when(col("n") > 1,
          // staged floor of (2(n·S2−S1²) + 10⁴n(n−1)) / (2·10⁴n(n−1)):
          // q minus one exactly when n·r < 2·u (see scaladoc proof)
          (col("qq") - when(expr(s"cast(n as $d38) * rr < 2 * u"), 1)
            .otherwise(0)).cast("double")).as("v4"))
      // the 2-row fixed-point frame feeds BOTH group branches below —
      // materialize once or each branch re-runs both corpus passes
      .localCheckpoint(true)
    val a = g.filter(col("grp") === welchGroups._1)
      .select(col("n").as("n1"), col("m4").as("ma"), col("v4").as("va"))
    val b = g.filter(col("grp") === welchGroups._2)
      .select(col("n").as("n2"), col("m4").as("mb"), col("v4").as("vb"))
    // se² = v1/n1 + v2/n2 in (price)² — a fixed IEEE chain over the
    // fixed-point doubles, identical in the oracle
    val se2 = col("va") / lit(1e4) / col("n1").cast("double") +
      col("vb") / lit(1e4) / col("n2").cast("double")
    val ok = col("n1") > 1 && col("n2") > 1 && se2 > 0
    a.crossJoin(b).select(
      col("n1"), col("n2"),
      (col("ma") / 1e4).as("mean_f"), (col("mb") / 1e4).as("mean_o"),
      (col("va") / 1e4).as("var_f"), (col("vb") / 1e4).as("var_o"),
      when(ok, round((col("ma") / 1e4 - col("mb") / 1e4) / sqrt(se2), 6))
        .as("t"),
      when(ok, round(se2 * se2 /
        (pow2(col("va") / lit(1e4) / col("n1").cast("double")) /
          (col("n1") - 1).cast("double") +
          pow2(col("vb") / lit(1e4) / col("n2").cast("double")) /
            (col("n2") - 1).cast("double")), 6)).as("welch_df"))
  }

  /** Benford first-significant-digit audit of order totalprice — the
    * classic fabricated-or-truncated-data screen a warehouse runs over
    * any money column: per digit 1–9 the observed count, observed and
    * expected ppm shares, the deviation, and the digit's χ²
    * contribution in ppm.
    *
    * Exactness: the digit is read from the DECIMAL's string form (no
    * log10 on data — a boundary value like 1000.00 must never hash as
    * digit 9); observed ppm is the integer floor 10⁶·n_d div n.
    * Expected ppm is round(10⁶·log10(1+1/d)) — log10 touches only the
    * nine constants 1+1/d, whose ppm fractional parts sit ≥ 10⁻² from
    * every rounding boundary, so a 1-ulp libm disagreement cannot flip
    * them. The χ² contribution (10⁶·n_d − n·exp_ppm)²·10⁶ div
    * (10⁶·n·exp_ppm) is exact integer arithmetic in DECIMAL(38,0).
    *
    * Shape (100 TB): one map-side-combined aggregate to ≤ 9 rows.
    * Documented contract: values < 1 are excluded from the audit (the
    * leading-digit law applies to the mantissa's first SIGNIFICANT
    * digit; sub-unit prices don't occur in this schema).
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cnt = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") >= 1)
      .groupBy(substring(col("o_totalprice").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = cnt.agg(sum(col("n_obs")).as("n"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("obs_ppm", expr("(1000000 * n_obs) div n"))
      .withColumn("exp_ppm",
        round(log10(lit(1.0) + lit(1.0) / col("digit")) * 1e6, 0)
          .cast("long"))
      .select(col("digit"), col("n_obs"), col("obs_ppm"), col("exp_ppm"),
        (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"),
        expr(s"""(cast(1000000 * n_obs - n * exp_ppm as $d38) *
                |  cast(1000000 * n_obs - n * exp_ppm as $d38)) div
                |  (cast(n as $d38) * exp_ppm)""".stripMargin)
          .as("chi2_ppm"))
      .orderBy("digit")
  }

  /** Mann–Kendall trend test on the daily-revenue series — the
    * non-parametric "is there a monotone trend?" companion to
    * [[cusumChangepoint]]'s "where did the level shift?": one row with
    * the day count, S = Σ_{i<j} sign(x_j − x_i), Kendall's τ_a, the
    * 18-scaled tie-corrected variance, and the continuity-corrected
    * normal z — the lag-free statistic a pipeline checks before
    * trusting a forecast baseline.
    *
    * Exactness: S is a pure integer sum of {−1,0,+1} over exact
    * DECIMAL revenue comparisons; the variance numerator
    * n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) is exact int64 (the day count is
    * CALENDAR-bounded — n³ ≈ 10¹⁰ at a 2500-day corpus regardless of
    * row count); z = (S∓1)/√(var18/18) and τ_a = S/(n(n−1)/2) are one
    * IEEE division + sqrt each, round-6.
    *
    * Shape (100 TB): corpus → daily frame (one map-side-combined
    * shuffle), then a broadcast triangular self-join over the bounded
    * frame — the [[cusumChangepoint]] shape.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr(
        s"unix_micros(cast(o_orderdate as timestamp)) div ${Behavior.dayUs}")
        .as("day"))
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("x"))
      .localCheckpoint() // calendar-bounded daily frame: S, n, ties
    val s = daily
      .join(broadcast(daily.select(col("day").as("d2"), col("x").as("x2"))),
        col("d2") < col("day"))
      .agg(sum(when(col("x") > col("x2"), 1L)
        .when(col("x") < col("x2"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L)).as("tie_term"))
    val n = daily.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .withColumn("var18",
        col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_term"))
      .select(col("n").as("n_days"), col("s_stat"), col("var18"),
        when(col("n") > 1,
          round(col("s_stat").cast("double") /
            (col("n") * (col("n") - 1) / 2).cast("double"), 6)).as("tau_a"),
        when(col("var18") > 0,
          round(when(col("s_stat") > 0, col("s_stat") - 1)
            .when(col("s_stat") < 0, col("s_stat") + 1)
            .otherwise(0L).cast("double") /
            sqrt(col("var18").cast("double") / 18.0), 6)).as("z"))
  }

  /** Theil–Sen slope of the daily-revenue series — the
    * outlier-robust trend rate beside [[mannKendall]]'s trend verdict:
    * one row with the day count, the pair count, and the Sen slope
    * (the LOWER median of all pairwise slopes at integer rank
    * ⌈m/2⌉ — the interpolation ban, as everywhere).
    *
    * Exactness: each slope (x_j − x_i)/(j − i) divides the EXACT
    * decimal revenue delta (cast to double losslessly — scale-4
    * magnitudes sit under 2⁵³) by an integer day gap: one IEEE
    * division, bit-identical cross-engine. The median is the order
    * statistic over the total order (slope, day_i, day_j) — ranked by
    * the distributed two-pass [[Ranks.global]], never a
    * single-partition window; the read-off is a broadcast rank probe.
    *
    * Shape (100 TB): daily reduction, broadcast triangular pair build
    * over the calendar-bounded frame (≈3·10⁶ pairs at a 2500-day
    * corpus — constant in corpus size), range-partitioned SELECTION
    * ([[Ranks.kth]] — only the rank-holding partition sorts).
    *
    * r18 optimization (guide §2.4/§2.5/§2.6), measured on the stage
    * profile: (a) the post-agg daily frame AQE-coalesces to ONE
    * partition, which serialized both the O(n²) pair build and the
    * range-exchange map side behind it (two ~2 s single-task stages at
    * sf0.1) — `repartition(nParts)` of the calendar-bounded stream
    * side spreads both; (b) n_pairs was re-counted by running the
    * whole broadcast pair build a SECOND time — over the distinct-day
    * frame the d2<day theta-join emits exactly C(n_days,2) rows, so
    * both n_pairs and the median rank derive from the daily count (a
    * calendar-bounded driver count, the Ranks offsets discipline);
    * (c) the full two-pass rank sorted every partition only to filter
    * all rows but rank k — [[Ranks.kth]] sorts just the one partition
    * the counts locate. 5.16 s → see OPTIMIZATION_r18.md.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr(
        s"unix_micros(cast(o_orderdate as timestamp)) div ${Behavior.dayUs}")
        .as("day"))
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("x"))
      .localCheckpoint() // calendar-bounded daily frame
    val nDays = daily.count() // calendar-bounded, same discipline as
    // the Ranks per-partition-count collect
    val nPairs = nDays * (nDays - 1) / 2
    val pairs = daily.repartition(nParts)
      .join(broadcast(daily.select(col("day").as("d2"), col("x").as("x2"))),
        col("d2") < col("day"))
      .select(col("d2").as("d1"), col("day").as("dd"),
        ((col("x") - col("x2")).cast("double") /
          (col("day") - col("d2")).cast("double")).as("slope"))
    Ranks.kth(pairs, (nPairs + 1) / 2,
        col("slope").asc, col("d1").asc, col("dd").asc)
      .select(lit(nDays).as("n_days"), lit(nPairs).as("n_pairs"),
        round(col("slope"), 6).as("sen_slope"))
  }

  /** Longest calendar lag [[acfDaily]] reports. */
  val acfMaxLag = 14

  /** Autocorrelation of the daily-revenue series at calendar lags
    * 1..[[acfMaxLag]] — the seasonality fingerprint read before
    * trusting any weekly model (lag-7 spikes = weekly cycle): per lag
    * the active-day pair count and
    * r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², over pairs of ACTIVE
    * days exactly k calendar days apart (documented: gaps contribute
    * no pair).
    *
    * Exactness: deviations are taken from the HALF-UP scale-4
    * fixed-point mean ((2T+n) div 2n — the ewma read-off discipline;
    * the n²-scaled exact-mean form would push Σe² past DECIMAL(38,0)
    * at 100 TB daily magnitudes, and a 10⁻⁴-of-a-day's-revenue mean
    * shift is far below the round-6 output grain), so every product
    * and sum is an exact DECIMAL(38,0) integer (e ≈ 10¹⁷ worst case →
    * Σe² ≈ 10³⁷, inside the ceiling, calendar-bounded regardless of
    * corpus rows). The read-off is ONE double division of the two
    * exact decimals, rounded at 4 — the repo's established
    * int128→double discipline (a 10⁶-scaled integer read-off would
    * itself overflow the 38-digit ceiling at these magnitudes).
    *
    * Shape (100 TB): corpus → daily frame, then ONE broadcast band
    * self-join (0 < gap ≤ maxLag) over the calendar-bounded frame
    * grouped by gap — the [[cusumChangepoint]] family shape.
    */
  def acfDaily(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr(
        s"unix_micros(cast(o_orderdate as timestamp)) div ${Behavior.dayUs}")
        .as("day"))
      .agg((sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))) * 10000)
        .cast(d38).as("x"))
      .localCheckpoint() // calendar-bounded daily frame
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("day"),
        (col("x") - expr("(2 * t + n) div (2 * n)")).as("e"))
      .localCheckpoint() // (x − mean₄) per day: feeds den and the band join
    val den = dev.agg(sum(col("e") * col("e")).as("den"))
    dev
      .join(broadcast(dev.select(col("day").as("day2"), col("e").as("e2"))),
        col("day2") > col("day") && col("day2") <= col("day") + acfMaxLag)
      .groupBy((col("day2") - col("day")).as("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("e") * col("e2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        when(col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double"), 4))
          .as("acf"))
      .orderBy("lag")
  }

  /** DECIMAL(38,0) square — keeps the χ² numerator integer-exact. */
  private def pow2(c: Column): Column = c * c
}
