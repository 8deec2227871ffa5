package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal views DERIVED from the versioned change log — the natural
  * extension family of the reference's `ReplacingMergeTree` design
  * (`/root/reference/schemas/clickhouse_schemas.sql:1-13`): once every
  * change is an append-only (key, version, payload) row, the log is not
  * just a latest-state table but a full history. Three classic
  * derivations, each hash-checked against the DuckDB oracle:
  *
  *  - [[scd2History]] — slowly-changing-dimension type-2 validity
  *    intervals (`valid_from`/`valid_to`/`is_current`);
  *  - [[asOfFinal]] — point-in-time dedup-on-read (the `FINAL` view as
  *    of an older version — "time travel");
  *  - [[snapshotDiff]] — the changefeed BETWEEN two versions
  *    (insert/update/delete per key), computed in ONE aggregation pass.
  *
  * The `events` table plays the change log exactly as in [[EventsCdc]]:
  * `event_id` is the LSN-like monotone version, `user_id` the key,
  * `event_type='error'` the soft delete.
  *
  * Scale notes (100 TB): every operator here shuffles ONCE on the key
  * (window or hash aggregate) — the same partitioning the FINAL read
  * already uses, so a key-bucketed log layout serves all of them with
  * zero additional exchanges. The version cuts are 1-row aggregates
  * broadcast to the scan (no driver round-trip in the plan shape; at
  * scale the cut is a known LSN and the filter pushes to the reader).
  */
object CdcHistory {

  /** SCD Type-2 history: one validity interval per change, keyed by
    * `user_id` and ordered by version. `valid_to` is the NEXT change's
    * version (null = still open); `is_current` marks the open interval.
    * One window shuffle on the key; no joins.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Of(Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value"))

  /** [[scd2History]] over any (user_id, event_id, …) shaped log. */
  def scd2Of(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .withColumn("valid_to", lead(col("event_id"), 1).over(w))
      .select(
        col("user_id"),
        col("event_id").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("event_type"),
        col("value"))
      .orderBy("user_id", "valid_from")
  }

  /** Point-in-time FINAL (time travel): the dedup-on-read view as of
    * version `floor(max_version / 2)` — filter the log to versions ≤ the
    * cut, then the usual argmax collapse with soft-delete drop. The cut
    * rides the plan as a broadcast 1-row aggregate so the whole query is
    * one pass over the log plus the key shuffle the FINAL read always
    * pays; with a version-ordered layout the cut filter prunes files.
    */
  def asOfFinal(spark: SparkSession, dir: String): DataFrame =
    asOfFinalOf(Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value"))

  /** [[asOfFinal]] over any log; `divisor = 1` reads as of the head
    * (≡ the plain FINAL view — the spec's consistency check).
    */
  def asOfFinalOf(events: DataFrame, divisor: Int = 2): DataFrame = {
    val cut = events.agg(
      floor(max(col("event_id")).cast("double") / divisor).cast("long").as("cut"))
    val asOf = events.join(broadcast(cut))
      .filter(col("event_id") <= col("cut")).drop("cut")
    VersionedUpsert.latestRows(asOf, Seq("user_id"), Seq(col("event_id").desc))
      .filter(col("event_type") =!= "error")
      .orderBy("user_id")
  }

  /** Changefeed between two snapshots: classify every key as
    * insert / update / delete between FINAL@v1 and FINAL@v2
    * (v1 = ⌊max/3⌋, v2 = ⌊2·max/3⌋). Computed WITHOUT materializing
    * either snapshot: one hash aggregate holds BOTH argmaxes per key —
    * `max_by` over the ≤v1 prefix (conditional order key; null order
    * keys are ignored) and `max_by` over the ≤v2 prefix — so the plan
    * is a single shuffle on the key instead of two collapses plus a
    * full-outer join. Keys whose latest row is unchanged between the
    * cuts produce no output (a changefeed, not a snapshot).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type")
    val cuts = events.agg(
      floor(max(col("event_id")).cast("double") / 3).cast("long").as("v1"),
      floor(max(col("event_id")).cast("double") * 2 / 3).cast("long").as("v2"))
    snapshotDiffAt(events, cuts)
  }

  /** [[snapshotDiff]] between explicit version cuts: `cuts` is a 1-row
    * (v1, v2) frame broadcast into the scan.
    */
  def snapshotDiffAt(events: DataFrame, cuts: DataFrame): DataFrame = {
    val row = struct(col("event_id"), col("event_type"))
    val collapsed = events.join(broadcast(cuts))
      .filter(col("event_id") <= col("v2"))
      .groupBy("user_id")
      .agg(
        max_by(row, when(col("event_id") <= col("v1"), col("event_id"))).as("o"),
        max_by(row, col("event_id")).as("n"))
    val oldPresent = col("o").isNotNull && col("o.event_type") =!= "error"
    val newPresent = col("n.event_type") =!= "error"
    collapsed
      .select(
        col("user_id"),
        when(!oldPresent && newPresent, "insert")
          .when(oldPresent && !newPresent, "delete")
          .when(oldPresent && newPresent &&
            col("o.event_id") =!= col("n.event_id"), "update")
          .as("change"),
        col("o.event_id").as("old_version"),
        col("n.event_id").as("new_version"))
      .filter(col("change").isNotNull)
      .orderBy("user_id")
  }
}
