package graft

import graft.operators.{CdcHistory, MergeInto}
import org.apache.spark.sql.functions._

/** Generic MERGE INTO semantics the oracle row cannot isolate:
  * full-row replace with real NULL updates, delete of an unmatched key
  * as a no-op, source collapse to the latest version, and the
  * merge-vs-time-travel agreement re-proven against [[CdcHistory]].
  */
class MergeIntoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("matched update replaces the full row — including real NULL payloads") {
    import spark.implicits._
    val target = Seq(
      (1L, 10L, "click", Some(5.0)),
      (2L, 11L, "view", Some(7.0)),
      (3L, 12L, "view", Some(9.0))
    ).toDF("user_id", "event_id", "event_type", "value")
    val source = Seq(
      // two versions for key 1 — the LATER one (NULL payload) must win
      (1L, 20L, "purchase", Some(1.0)),
      (1L, 21L, "purchase", None: Option[Double]),
      // delete for key 2; delete for unmatched key 9 (no-op)
      (2L, 22L, "error", Some(0.0)),
      (9L, 23L, "error", Some(0.0)),
      // insert of a brand-new key
      (4L, 24L, "signup", Some(3.0))
    ).toDF("user_id", "event_id", "event_type", "value")
    val merged = MergeInto(target, source, key = "user_id",
      versionCol = "event_id", deleteWhen = col("event_type") === "error")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(merged.keySet === Set(1L, 3L, 4L), "2 deleted, 9 no-op, 3 untouched")
    assert(merged(1L) === ((21L, "purchase", None)),
      "latest source version wins and its NULL is a real NULL")
    assert(merged(3L) === ((12L, "view", Some(9.0))), "untouched passthrough")
    assert(merged(4L) === ((24L, "signup", Some(3.0))), "insert")
  }

  test("a NULL delete condition means no-delete, matching SQL MERGE clause semantics") {
    import spark.implicits._
    val target = Seq((1L, 10L, "click", Some(5.0)))
      .toDF("user_id", "event_id", "event_type", "value")
    val source = Seq(
      // value NULL makes `value < 0` evaluate to NULL — the row must
      // fall through to UPDATE, not silently DELETE
      (1L, 20L, "update", None: Option[Double]),
      (2L, 21L, "insert", None: Option[Double])
    ).toDF("user_id", "event_id", "event_type", "value")
    val merged = MergeInto(target, source, key = "user_id",
        versionCol = "event_id", deleteWhen = col("value") < 0)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(merged === Map(1L -> "update", 2L -> "insert"),
      "null WHEN MATCHED AND cond falls through to UPDATE/INSERT")
  }

  test("merge chains: applying two consecutive slices == applying their union") {
    // the incremental-apply contract a nightly MERGE job relies on:
    // state after slice (a,b] then slice (b,c] must equal state after
    // one slice (a,c]
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value")
    val mx = events.agg(max("event_id")).head.getLong(0)
    val (a, b, c) = (mx / 4, mx / 2, mx * 3 / 4)
    def slice(lo: Long, hi: Long) =
      events.filter(col("event_id") > lo && col("event_id") <= hi)
    val start = graft.operators.VersionedUpsert.latestRows(
      events.filter(col("event_id") <= a), Seq("user_id"),
      Seq(col("event_id").desc))
      .filter(col("event_type") =!= "error")
    val del = col("event_type") === "error"
    val chained = MergeInto(
      MergeInto(start, slice(a, b), "user_id", "event_id", del),
      slice(b, c), "user_id", "event_id", del)
    val direct = MergeInto(start, slice(a, c), "user_id", "event_id", del)
    assert(chained.exceptAll(direct).isEmpty &&
      direct.exceptAll(chained).isEmpty)
    assert(direct.count() > 0)
  }

  test("merge(FINAL@v1, slice(v1,v2]) == time-travel FINAL@v2") {
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value")
    val mx = events.agg(max("event_id")).head.getLong(0)
    val v2 = mx * 2 / 3
    // independent FINAL@v2 via the time-travel path
    val expected = CdcHistory.asOfFinalOf(
      events.filter(col("event_id") <= v2), divisor = 1)
    val actual = MergeInto.mergeApply(spark, dir)
    assert(actual.exceptAll(expected).isEmpty &&
      expected.exceptAll(actual).isEmpty)
    assert(actual.count() > 0)
  }
}
