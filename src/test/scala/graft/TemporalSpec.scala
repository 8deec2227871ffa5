package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Semantic checks for the temporal operators: as-of join edge cases
  * (tie inclusivity, no-prior-row nulls, latest-wins) and session
  * splitting.
  */
class TemporalSpec extends SparkSpec {

  test("asofJoin: latest prior right row wins; ties are inclusive; no prior ⇒ null") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l_a"), // after r at 50 and 90 → matches 90
      (1L, 90L, "l_tie"), // tie with r at 90 → inclusive match
      (1L, 10L, "l_early"), // before any r → null
      (2L, 500L, "l_other") // key with no right rows at all → null
    ).toDF("k", "t", "l_name")
    val right = Seq(
      (1L, 50L, "r_50"),
      (1L, 90L, "r_90")
    ).toDF("k", "t", "r_name")

    val out = Temporal.asofJoin(left, right, "k", "t", "t", rightPrefix = "m_")
      .collect().map(r => r.getAs[String]("l_name") ->
        Option(r.getAs[String]("m_r_name"))).toMap
    assert(out("l_a") === Some("r_90"))
    assert(out("l_tie") === Some("r_90"))
    assert(out("l_early") === None)
    assert(out("l_other") === None)
  }

  test("asofJoin: duplicate (key, time) right rows — tiebreak picks the largest id") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "l_name")
    // three right rows at the identical (key, timestamp)
    val right = Seq((1L, 90L, 7L), (1L, 90L, 9L), (1L, 90L, 8L))
      .toDF("k", "t", "r_id")
    (1 to 3).foreach { _ =>
      val out = Temporal.asofJoin(left, right, "k", "t", "t",
        rightTiebreak = Some("r_id")).collect()
      assert(out.head.getAs[Long]("r_id") === 9L)
    }
  }

  test("asofJoin: single shuffle — one Exchange in the plan") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "l_name")
    val right = Seq((1L, 5L, "y")).toDF("k", "t", "r_name")
    val plan = Temporal.asofJoin(left, right, "k", "t", "t")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1, s"plan had >1 shuffle:\n$plan")
  }

  test("sessionize: gap splits sessions, totals preserved") {
    val out = Temporal.sessionize(spark, "/root/testdata/sf0.001")
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    // every event lands in exactly one session
    assert(out.agg(sum("n_events")).head().getLong(0) === ev.count())
    // sessions never overlap per user: start of session n+1 is after end of n
    val bad = out.as("a").join(out.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.session_seq") + 1 === col("b.session_seq") &&
        col("b.session_start") <= col("a.session_end"))
    assert(bad.count() === 0)
  }

  test("session stats reconcile with the session table; lower median by rank") {
    val dir = "/root/testdata/sf0.001"
    val sessions = Temporal.sessionize(spark, dir)
      .select("n_events").collect().map(_.getLong(0)).sorted
    val row = Temporal.sessionStats(spark, dir).collect().head
    assert(row.getLong(0) === sessions.length.toLong)
    assert(row.getLong(1) === sessions.count(_ == 1L).toLong)
    val wantRate = BigDecimal(sessions.count(_ == 1L).toDouble / sessions.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(2) === wantRate)
    // lower median: element at ⌈n/2⌉ of the sorted sizes (1-based)
    val want = sessions((sessions.length + 1) / 2 - 1)
    assert(row.getLong(3) === want)
  }

  test("multi-touch window bounds are closed on both ends (0 and exactly 7d)") {
    // documented convention check kept close to the operator constants
    assert(Temporal.attributionLookbackUs === 7L * 86400L * 1000000L)
  }

  test("top paths replay the per-session ordered type census") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = Temporal.topPaths(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_truncated"))).toMap
    val gap = 6L * 3600 * 1000 * 1000
    val evs = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = evs.groupBy(_._1).values.flatMap { rows =>
      val seqd = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(seqd.head))
      seqd.sliding(2).foreach { case Array(a, b) =>
        if (b._2 - a._2 > gap) sessions += scala.collection.mutable.ArrayBuffer(b)
        else sessions.last += b
      }
      sessions.map { s =>
        (s.take(Temporal.pathMaxLen).map(_._4).mkString(">"),
          s.length > Temporal.pathMaxLen)
      }
    }.toSeq
    val brute = paths.groupBy(_._1).view.mapValues(v =>
        (v.size.toLong, v.count(_._2).toLong))
      .filter(_._2._1 >= Temporal.pathFloor).toMap
    assert(got === brute)
    assert(got.nonEmpty)
  }
}
