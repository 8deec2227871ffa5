package graft

import graft.operators.{MvTransform, VersionedUpsert}
import graft.sources.{ChangeLog, WorkloadFixture}
import org.apache.spark.sql.DataFrame

/** Golden end-to-end for the CDC core (SURVEY.md §5): replay the
  * reference's documented workload, assert the 6-row final state and the
  * replay/permutation invariants that `ReplacingMergeTree` guarantees.
  */
class CdcCoreSpec extends SparkSpec {

  private def golden(df: DataFrame): Seq[(String, String, Boolean)] =
    df.select("booking_id", "status", "is_canceled")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
      .toSeq

  private val expected = Seq(
    ("b1", "Open", false), ("b10", "Completed", false),
    ("b2", "Created", false), ("b7", "Completed", false),
    ("b8", "Cancelled", true), ("b9", "Cancelled", true))

  private lazy val upsertLog = MvTransform(WorkloadFixture.toDf(spark))

  test("workload replay → finalView matches the 6-row golden table") {
    val fv = VersionedUpsert.finalView(upsertLog)
    assert(fv.count() === 6L)
    assert(golden(fv) === expected)
  }

  test("finalViewAgg (max_by strategy) agrees with the window strategy") {
    assert(golden(VersionedUpsert.finalViewAgg(upsertLog)) === expected)
  }

  test("count parity with the simulated-PG truth") {
    val pg = WorkloadFixture.foldToState(WorkloadFixture.events)
    assert(VersionedUpsert.finalView(upsertLog).count() === pg.size.toLong)
    assert(pg.keySet === expected.map(_._1).toSet)
  }

  test("at-least-once replay: duplicating a suffix changes nothing") {
    val evts = WorkloadFixture.events
    val replayed = evts ++ evts.drop(evts.size / 2) // replay second half
    val fv = VersionedUpsert.finalView(
      MvTransform(WorkloadFixture.toDf(spark, replayed)))
    assert(golden(fv) === expected)
  }

  test("order independence: permuting events changes nothing") {
    val shuffled = new scala.util.Random(42).shuffle(WorkloadFixture.events)
    val fv = VersionedUpsert.finalView(
      MvTransform(WorkloadFixture.toDf(spark, shuffled)))
    assert(golden(fv) === expected)
  }

  test("MV transform: delete rows project the before image with is_deleted=1") {
    import org.apache.spark.sql.functions.col
    val dels = upsertLog.filter(col("is_deleted") === 1)
    assert(dels.count() === 7L) // b3..b6, b11..b13 deleted
    val statuses = dels.select("status").collect().map(_.getString(0)).toSet
    assert(statuses === Set("Closed")) // before-image status at delete time
  }

  test("MV transform: epoch-µs converts to UTC timestamps exactly once") {
    val first = upsertLog.orderBy("version").select("created_at").head().getTimestamp(0)
    // lsn=1 row: baseMicros + 1s = 2024-01-01T00:00:01Z
    assert(first.toInstant.toString === "2024-01-01T00:00:01Z")
  }

  test("compact collapses to one row per key; keepTombstones retains markers") {
    val compacted = VersionedUpsert.compact(upsertLog)
    assert(compacted.count() === 13L) // 6 live + 7 tombstones
    assert(VersionedUpsert.compact(upsertLog, keepTombstones = false).count() === 6L)
    // compaction then finalView == finalView of full upsertLog
    assert(golden(VersionedUpsert.finalView(compacted)) === expected)
  }

  test("backfill stamps version=1 and CDC rows win the argmax") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val snapshot = Seq(("b1", "Stale", false), ("b99", "OnlyInSnapshot", false))
      .toDF("booking_id", "status", "is_canceled")
      .withColumn("created_at", to_timestamp(lit("2023-12-31 00:00:00")))
      .withColumn("modified_at", to_timestamp(lit("2023-12-31 00:00:00")))
    val combined = VersionedUpsert.backfill(snapshot).unionByName(upsertLog)
    val fv = VersionedUpsert.finalView(combined)
    val b1 = fv.filter($"booking_id" === "b1").select("status").head().getString(0)
    assert(b1 === "Open") // CDC (tie on version=1 broken by modified_at desc) wins
    assert(fv.filter($"booking_id" === "b99").count() === 1L) // snapshot-only survives
    assert(fv.count() === 7L)
  }

  test("flatten SMT produces the dotted landing shape; nestEnvelope inverts it") {
    val env = WorkloadFixture.toDf(spark)
    val flat = ChangeLog.flatten(env)
    assert(flat.columns.toSeq.contains("before.booking_id"))
    assert(flat.columns.toSeq.contains("source.lsn"))
    val roundTrip = ChangeLog.nestEnvelope(flat)
    assert(golden(VersionedUpsert.finalView(MvTransform(roundTrip))) === expected)
  }

  test("JSON wire round-trip (schemaless, explicit schema on read)") {
    val env = WorkloadFixture.toDf(spark)
    val wire = ChangeLog.toJsonValues(env)
    val back = ChangeLog.fromJsonValues(wire)
    assert(golden(VersionedUpsert.finalView(MvTransform(back))) === expected)
  }

  test("topic router: sql_topic.public.bookings → bookings_changes") {
    assert(ChangeLog.routeTopic("sql_topic.public.bookings") === "bookings_changes")
    assert(ChangeLog.routeTopic("other.topic") === "other.topic")
  }
}
