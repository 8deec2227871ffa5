package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The CDC operator family applied to the driver's generic `events`
  * stream table — the same semantics the engine implements for the
  * bookings pipeline (SURVEY.md §2.1-2.4), exercised over testdata so
  * the DuckDB oracle can hash-check them:
  *
  *  - `events` plays the append-only change log (S8): `event_id` is the
  *    LSN-like monotone version, `user_id` the logical key;
  *  - `event_type='error'` plays the soft-delete op (T5);
  *  - `latestEvents` is dedup-on-read `FINAL` (A2/A3);
  *  - `mvProjection` is the conditional-projection MV transform shape
  *    (P1-P3) over a generic stream;
  *  - `backfillUnion` is the version-stamped snapshot + CDC union (S7).
  */
object EventsCdc {

  private val dataTypes = Seq("signup", "click", "view", "purchase", "error")

  /** FINAL view of the event log: latest event per user, soft-deleted
    * users dropped. Window argmax — one shuffle on the key.
    */
  def latestEvents(spark: SparkSession, dir: String): DataFrame =
    VersionedUpsert.latestRows(
      Tables(spark, dir, "events"),
      keys = Seq("user_id"),
      order = Seq(col("event_id").desc))
      .filter(col("event_type") =!= "error")
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  /** Same result via the max_by aggregate strategy (partial-agg
    * friendly; the plan the streaming path uses).
    */
  def latestEventsAgg(spark: SparkSession, dir: String): DataFrame =
    VersionedUpsert.latestRowsAgg(
      Tables(spark, dir, "events").select("user_id", "event_id", "event_type", "value"),
      keys = Seq("user_id"),
      orderKey = col("event_id"))
      .filter(col("event_type") =!= "error")
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  /** MV-transform shape over a generic stream: op classification,
    * soft-delete flag synthesis, data-op filter (P1-P3 applied to
    * events).
    */
  def mvProjection(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_type").isin(dataTypes: _*))
      .select(
        col("event_id").as("version"),
        col("user_id").as("key"),
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d")
          .otherwise("u").as("op"),
        when(col("event_type") === "error", 1).otherwise(0).as("is_deleted"),
        col("ts"),
        col("value"))
      .orderBy("version")

  /** Filtered change-log scan (S8 + P4): predicate + projection, both
    * pushed to the parquet reader.
    */
  def changelogScan(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase") && col("value") > 150)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** Backfill + CDC union (S7): a snapshot of early users stamped with
    * version 0 unioned with the live tail; later versions win the
    * argmax, snapshot-only users survive.
    */
  def backfillUnion(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val cut = 1000L
    val snapshot = events.filter(col("event_id") < cut)
      .select(col("user_id")).distinct()
      .select(
        col("user_id"),
        lit(0L).as("event_id"),
        lit("snapshot").as("event_type"))
    val live = events.filter(col("event_id") >= cut)
      .select("user_id", "event_id", "event_type")
    VersionedUpsert.latestRows(
      snapshot.unionByName(live),
      keys = Seq("user_id"),
      order = Seq(col("event_id").desc))
      .orderBy("user_id")
  }

  /** Physical compaction shape (A5, `OPTIMIZE TABLE … DEDUPLICATE`,
    * `/root/reference/README.md:310`): collapse the log to one row per
    * key but KEEP the max-version tombstones — unlike the FINAL read
    * view ([[latestEvents]]), a compacted log must retain delete
    * markers so later replays of older versions cannot resurrect a
    * deleted key (`VersionedUpsert.compact(keepTombstones = true)`
    * applied to the events-as-changelog mapping).
    */
  def compactedLog(spark: SparkSession, dir: String): DataFrame =
    VersionedUpsert.latestRows(
      Tables(spark, dir, "events").select("user_id", "event_id", "event_type", "value"),
      keys = Seq("user_id"),
      order = Seq(col("event_id").desc))
      .orderBy("user_id")

  /** Count parity over the FINAL view (A1, `README.md:321-329`). */
  def finalCount(spark: SparkSession, dir: String): DataFrame =
    latestEvents(spark, dir).agg(count(lit(1)).as("n"))

  /** Sessionized time-window aggregate over the stream table: hourly
    * event counts per type (the batch shape of the streaming windowed
    * agg; the streaming variant is covered in StreamingSpec).
    */
  def hourlyEventStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .orderBy("hour", "event_type")
}
