package graft

import graft.operators.Behavior
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Semantic checks for the behavioral analytics operators: funnel
  * stage ordering and windowing edge cases, cohort/offset accounting,
  * and empty-input robustness.
  */
class BehaviorSpec extends SparkSpec {

  private val hourUs = 3600L * 1000 * 1000
  private val dayUs = Behavior.dayUs

  /** Write an events.parquet under a temp dir from (user, us, type). */
  private def writeEvents(rows: Seq[(Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("behavior").toString
    rows.zipWithIndex.map { case ((u, us, t), i) =>
      (i.toLong, us, u, t, 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: ordering and 7-day window rules decide stage membership") {
    val t0 = 1700000000000000L
    val dir = writeEvents(Seq(
      // user 1: clean view → click → purchase, all inside the window
      (1L, t0, "view"), (1L, t0 + hourUs, "click"),
      (1L, t0 + 2 * hourUs, "purchase"),
      // user 2: click with no view — never enters the funnel
      (2L, t0, "click"),
      // user 3: click 8 days after the view — outside the window
      (3L, t0, "view"), (3L, t0 + 8 * dayUs, "click"),
      // user 4: click strictly BEFORE the first view — wrong order
      (4L, t0 + hourUs, "click"), (4L, t0 + 2 * hourUs, "view"),
      // user 5: purchase at day 6h23 — still inside the view's window
      (5L, t0, "view"), (5L, t0 + hourUs, "click"),
      (5L, t0 + 7 * dayUs - hourUs, "purchase"),
      // user 6: purchase lands past the 7-day window of the view
      (6L, t0, "view"), (6L, t0 + hourUs, "click"),
      (6L, t0 + 7 * dayUs + hourUs, "purchase")))
    val out = Behavior.funnelConversion(spark, dir).collect()
    val users = out.map(r =>
      r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(users("view") === 5) // users 1,3,4,5,6
    assert(users("click") === 3) // users 1,5,6 (3 out of window, 4 pre-view)
    assert(users("purchase") === 2) // users 1 and 5
    // conversion is monotone and stage-1 converts to exactly 1.0
    val byIdx = out.sortBy(_.getAs[Long]("stage_idx"))
    assert(byIdx.head.getAs[Double]("conv_pct") === 1.0)
    val seq = byIdx.map(_.getAs[Long]("users")).toSeq
    assert(seq === seq.sorted.reverse)
  }

  test("funnel: stage-2 counts exactly the in-window post-view clicks") {
    val t0 = 1700000000000000L
    // one user whose only click precedes the view: must NOT reach stage 2
    val dir = writeEvents(Seq(
      (1L, t0 + hourUs, "click"), (1L, t0 + 2 * hourUs, "view")))
    val users = Behavior.funnelConversion(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(users("view") === 1)
    assert(users("click") === 0)
    assert(users("purchase") === 0)
  }

  test("retention: cohorts count active users per week offset") {
    // week w = us div day div 7; pick a base aligned to a week boundary
    val w0 = (1700000000000000L / dayUs / 7) * 7 * dayUs
    val dir = writeEvents(Seq(
      // user 1: first seen week 0, active weeks 0, 1, 3
      (1L, w0, "view"), (1L, w0 + 7 * dayUs, "click"),
      (1L, w0 + 21 * dayUs, "view"),
      // user 2: first seen week 0, active week 0 only (2 events same week)
      (2L, w0 + dayUs, "view"), (2L, w0 + 2 * dayUs, "click"),
      // user 3: first seen week 1, active weeks 1 and 2
      (3L, w0 + 8 * dayUs, "view"), (3L, w0 + 15 * dayUs, "click")))
    val out = Behavior.retentionCohorts(spark, dir).collect()
    val base = w0 / dayUs / 7
    val cells = out.map { r =>
      (r.getAs[Long]("cohort_week") - base, r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("active_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retained_pct"))
    }.toMap
    assert(cells((0L, 0L)) === ((2L, 2L, 1.0)))
    assert(cells((0L, 1L)) === ((1L, 2L, 0.5)))
    assert(cells((0L, 3L)) === ((1L, 2L, 0.5)))
    assert(cells((1L, 0L)) === ((1L, 1L, 1.0)))
    assert(cells((1L, 1L)) === ((1L, 1L, 1.0)))
    assert(!cells.contains((0L, 2L))) // nobody from cohort 0 active week 2
    // every offset-0 row retains exactly its own cohort
    out.filter(_.getAs[Long]("week_offset") == 0L)
      .foreach(r => assert(r.getAs[Double]("retained_pct") === 1.0))
  }

  test("CUPED: planted pre/post correlation is removed; guards hold") {
    import spark.implicits._
    // per-customer spend with STRONG pre->post correlation: customer u
    // spends base_u in the pre half and base_u + small-noise in the
    // post half (one order per half). theta ~= 1, var_reduction high,
    // and since assignment is a fair content-hash coin over a
    // zero-effect metric, |diff_cuped| must shrink vs |diff_raw|.
    val dir = java.nio.file.Files.createTempDirectory("cuped").toString
    val rows = (1L to 400L).flatMap { u =>
      val base = 100.0 + (u % 97) * 10.0 // deterministic spread
      val noise = ((u * 31) % 7).toDouble // small, uncorrelated w/ hash
      Seq((u, java.sql.Date.valueOf("2024-01-05"), base),
        (u, java.sql.Date.valueOf("2024-03-05"), base + noise))
    }
    rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    val r = Behavior.cupedAb(spark, dir).head()
    assert(r.getAs[Long]("n_customers") === 400L)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 400L)
    val theta = r.getAs[Double]("theta")
    assert(math.abs(theta - 1.0) < 0.05, s"theta=$theta should be ~1")
    assert(r.getAs[Double]("var_reduction") > 0.9,
      "planted correlation must make CUPED remove >90% of variance")
    assert(math.abs(r.getAs[Double]("diff_cuped")) <
      math.abs(r.getAs[Double]("diff_raw")),
      "adjustment must shrink the null-effect noise")

    // degenerate: constant pre-period spend -> var(X) = 0 -> NULL
    // theta/adjusted columns, raw diff still present
    val dir2 = java.nio.file.Files.createTempDirectory("cuped0").toString
    (1L to 50L).flatMap { u =>
      Seq((u, java.sql.Date.valueOf("2024-01-05"), 100.0),
        (u, java.sql.Date.valueOf("2024-03-05"), (u % 9).toDouble))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir2/orders.parquet")
    val r2 = Behavior.cupedAb(spark, dir2).head()
    assert(r2.isNullAt(r2.fieldIndex("theta")))
    assert(r2.isNullAt(r2.fieldIndex("diff_cuped")))
    assert(!r2.isNullAt(r2.fieldIndex("diff_raw")))
  }

  test("empty events: funnel yields three zero-user stages; retention is empty") {
    val dir = writeEvents(Seq.empty)
    val funnel = Behavior.funnelConversion(spark, dir).collect()
    assert(funnel.length === 3)
    assert(funnel.forall(_.getAs[Long]("users") === 0L))
    assert(Behavior.retentionCohorts(spark, dir).count() === 0L)
  }

  test("transitions: per-user successor counts and row-conditional probabilities") {
    val t0 = 1700000000000000L
    // user 1: a→b→b→c; user 2: a→b; interleaved in write order so the
    // lag must really sort by (us, event_id), not row order
    val dir = writeEvents(Seq(
      (1L, t0, "a"), (2L, t0, "a"),
      (1L, t0 + 1, "b"), (2L, t0 + 1, "b"),
      (1L, t0 + 2, "b"), (1L, t0 + 3, "c")))
    val out = Behavior.eventTransitions(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("transitions"), r.getAs[Double]("p_next")))).toMap
    assert(out.keySet === Set(("a", "b"), ("b", "b"), ("b", "c")))
    assert(out(("a", "b"))._1 === 2L) // both users
    assert(out(("b", "b"))._1 === 1L)
    assert(out(("b", "c"))._1 === 1L)
    // row-conditional: P(·|a) sums to 1, P(·|b) splits 0.5/0.5
    assert(out(("a", "b"))._2 === 1.0)
    assert(out(("b", "b"))._2 === 0.5)
    assert(out(("b", "c"))._2 === 0.5)
  }

  test("transitions: a user's first event is never a destination") {
    val dir = writeEvents(Seq((1L, 1000L, "x"), (2L, 2000L, "y")))
    assert(Behavior.eventTransitions(spark, dir).count() === 0L)
  }

  test("anomalies: only the planted spike flags against a varied baseline") {
    val t0 = 1700000000000000L
    // hourly counts cycle 5,6,7 (variance > 0); hour 27 spikes to 50
    val rows = for {
      h <- 0 until 30
      i <- 0 until (if (h == 27) 50 else 5 + h % 3)
    } yield (1L + i, t0 + h * hourUs + i * 1000L, "e")
    val dir = writeEvents(rows)
    val out = Behavior.hourlyAnomalies(spark, dir).collect()
    assert(out.length === 30)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[Long]("hour_idx") - t0 / hourUs)
    assert(flagged.toSeq === Seq(27L))
    // the first 24 hours have an incomplete baseline → NULL z, no flag
    out.filter(r => r.getAs[Long]("hour_idx") - t0 / hourUs < 24)
      .foreach(r => assert(r.isNullAt(r.fieldIndex("z"))))
    // hours 24..26 sit inside the cycle → z defined, |z| small
    out.filter { r =>
      val h = r.getAs[Long]("hour_idx") - t0 / hourUs; h >= 24 && h < 27
    }.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("z")))
      assert(math.abs(r.getAs[Double]("z")) < 3)
    }
  }

  test("robust anomalies: spike flags, post-flood hours stay calm (median immunity)") {
    val t0 = 1700000000000000L
    // baseline cycles 3,5,7,9 (lower median 5, MAD 2); hour 27 floods
    // to 50, hours 28..29 return to the cycle — the flood now sits
    // INSIDE their 24-row baseline, but the median shrugs it off
    val rows = for {
      h <- 0 until 30
      i <- 0 until (if (h == 27) 50 else Seq(3, 5, 7, 9)(h % 4))
    } yield (1L + i, t0 + h * hourUs + i * 1000L, "e")
    val dir = writeEvents(rows)
    val out = Behavior.robustAnomalies(spark, dir).collect()
    // rows exist only once the 24-hour baseline is complete
    assert(out.length === 6)
    val byHour = out.map(r =>
      (r.getAs[Long]("hour_idx") - t0 / hourUs) -> r).toMap
    assert(byHour(27L).getAs[Boolean]("is_anomaly"), "flood must flag")
    // 0.6745·(50 − 5)/2 = 15.17625 → rounds to 15.1763
    assert(byHour(27L).getAs[Long]("med") === 5L)
    assert(byHour(27L).getAs[Long]("mad") === 2L)
    assert(byHour(27L).getAs[Double]("robust_z") === 15.1763)
    // the cycle hours — before AND after the flood — stay unflagged
    Seq(24L, 25L, 26L, 28L, 29L).foreach { h =>
      assert(!byHour(h).getAs[Boolean]("is_anomaly"), s"hour $h calm")
      assert(math.abs(byHour(h).getAs[Double]("robust_z")) < 3.5)
    }
  }

  test("robust anomalies: a near-constant baseline yields NULL z, never a flag") {
    val t0 = 1700000000000000L
    // constant 5s: med 5, every deviation 0 → MAD 0 → NULL z (the
    // ANSI-safe degradation), even against a final spike
    val rows = for {
      h <- 0 until 26
      i <- 0 until (if (h == 25) 40 else 5)
    } yield (1L + i, t0 + h * hourUs + i * 1000L, "e")
    val out = Behavior.robustAnomalies(spark, writeEvents(rows)).collect()
    assert(out.length === 2)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("robust_z"))))
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("anomalies: a zero-variance baseline yields NULL z, never a flag") {
    val t0 = 1700000000000000L
    // 26 hours of exactly 5 events — constant history must not divide
    // by zero or flag (exact integer variance predicate)
    val rows = for { h <- 0 until 26; i <- 0 until 5 }
      yield (1L + i, t0 + h * hourUs + i * 1000L, "e")
    val dir = writeEvents(rows)
    val out = Behavior.hourlyAnomalies(spark, dir).collect()
    assert(out.length === 26)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("z"))))
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("streaming anomalies: frozen baseline scores arriving hours like batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = 1700000000000000L
    // training table: 30 hours cycling 5,6,7 events
    val trainDir = writeEvents(for {
      h <- 0 until 30; i <- 0 until (5 + h % 3)
    } yield (1L + i, t0 + h * hourUs + i * 1000L, "e"))
    val baseline = Behavior.anomalyBaseline(spark, trainDir).localCheckpoint()
    val bRow = baseline.collect().head
    assert(bRow.getAs[Long]("b_cnt") === 30L)

    // live stream: hour 100 is normal (6 events), hour 101 spikes (60);
    // a lone far-future heartbeat advances the watermark past both
    val arriving: Seq[(Long, String)] =
      (0 until 6).map(i => (t0 + 100 * hourUs + i * 1000L, "e")) ++
      (0 until 60).map(i => (t0 + 101 * hourUs + i * 1000L, "e")) :+
      ((t0 + 110 * hourUs, "heartbeat"))
    val in = MemoryStream[(Long, String)]
    val q = Behavior.streamingAnomalies(
        in.toDF().toDF("us", "event_type")
          .withColumn("ts", timestamp_micros(col("us"))).drop("us"),
        baseline)
      .writeStream.outputMode("append").format("memory")
      .queryName("anom").start()
    try {
      in.addData(arriving); q.processAllAvailable()
      in.addData(Seq.empty); q.processAllAvailable()
      val got = spark.table("anom").collect()
        .map(r => r.getAs[Long]("hour_idx") - t0 / hourUs ->
          ((r.getAs[Long]("n"), r.getAs[Double]("z"),
            r.getAs[Boolean]("is_anomaly")))).toMap
      assert(got.keySet === Set(100L, 101L))
      // expected z against the FROZEN baseline, replayed directly
      val (cnt, s, ss) = (bRow.getAs[Long]("b_cnt").toDouble,
        bRow.getAs[Long]("b_sum").toDouble, bRow.getAs[Long]("b_ss").toDouble)
      val mean = s / cnt
      val varS = (ss - s * mean) / (cnt - 1)
      def zOf(n: Long): Double =
        BigDecimal((n - mean) / math.sqrt(varS))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(100L) === ((6L, zOf(6), false)))
      assert(got(101L) === ((60L, zOf(60), true)))
    } finally q.stop()
  }

  test("forecast baseline: periodic series scores zero error except the spike") {
    val t0 = 1700000000000000L
    // 48 hours: perfect 24h periodicity (5 events/hour), except hour
    // 30 doubles to 10
    val rows = for {
      h <- 0 until 48
      i <- 0 until (if (h == 30) 10 else 5)
    } yield (1L + i, t0 + h * hourUs + i * 1000L, "e")
    val dir = writeEvents(rows)
    val r = Behavior.forecastBaseline(spark, dir).collect().head
    assert(r.getAs[Long]("n_hours") === 48L)
    assert(r.getAs[Long]("n_scored") === 24L) // hours 24..47 have a -24h obs
    // only hour 30 errs: |10-5| = 5 -> MAE 5/24; MAPE (5/10)/24
    assert(r.getAs[Double]("mae") ===
      BigDecimal(5.0 / 24).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("mape") ===
      BigDecimal(0.5 / 24).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ltv triangle: cumulative value accrues per cohort and divides by size") {
    import spark.implicits._
    val t0 = 1700000000000000L
    val weekUs = 7 * dayUs
    // cohort A (week 0): users 1,2 — week 0 value 10+20, week 1 value 5
    // cohort B (week 1): user 3 — week 1 value 7
    val rows = Seq(
      (0L, t0, 1L, "e", 10.0, "{}"), (1L, t0, 2L, "e", 20.0, "{}"),
      (2L, t0 + weekUs, 1L, "e", 5.0, "{}"),
      (3L, t0 + weekUs, 3L, "e", 7.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavior.ltvTriangle(spark, dir).collect()
      .map(r => (r.getLong(0) - t0 / weekUs, r.getLong(1)) ->
        ((r.getAs[Long]("cohort_size"), r.getAs[Double]("period_value"),
          r.getAs[Double]("cum_value"), r.getAs[Double]("ltv_per_user"))))
      .toMap
    assert(out.keySet === Set((0L, 0L), (0L, 1L), (1L, 0L)))
    assert(out((0L, 0L)) === ((2L, 30.0, 30.0, 15.0)))
    assert(out((0L, 1L)) === ((2L, 5.0, 35.0, 17.5)))
    assert(out((1L, 0L)) === ((1L, 7.0, 7.0, 7.0)))
  }

  test("weekly profile: integer calendar puts known instants in the right cell") {
    // 1700000000s = 2023-11-14T22:13:20Z — a TUESDAY (dow 2, hour 22)
    val tueUs = 1700000000000000L
    // exactly five days later: Sunday (dow 0), same hour
    val sunUs = tueUs + 5 * Behavior.dayUs
    val dir = writeEvents(Seq(
      (1L, tueUs, "e"), (2L, tueUs, "e"), (3L, sunUs, "e")))
    val out = Behavior.weeklyProfile(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share")))).toMap
    assert(out.keySet === Set((2L, 22L), (0L, 22L)))
    assert(out((2L, 22L)) === ((2L, 0.666667)))
    assert(out((0L, 22L)) === ((1L, 0.333333)))
  }

  test("anomalies: z matches the direct two-pass formula on the spike hour") {
    val t0 = 1700000000000000L
    val counts = Seq.tabulate(25)(h => if (h < 24) 3 + (h % 5) else 40)
    val rows = for {
      (c, h) <- counts.zipWithIndex
      i <- 0 until c
    } yield (1L + i, t0 + h * hourUs + i * 1000L, "e")
    val dir = writeEvents(rows)
    val out = Behavior.hourlyAnomalies(spark, dir).collect()
    val last = out.maxBy(_.getAs[Long]("hour_idx"))
    val base = counts.take(24).map(_.toDouble)
    val mean = base.sum / 24
    val varS = base.map(x => (x - mean) * (x - mean)).sum / 23
    val expect = BigDecimal((40 - mean) / math.sqrt(varS))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(last.getAs[Double]("z") - expect) < 2e-4)
    assert(last.getAs[Boolean]("is_anomaly"))
  }
}
