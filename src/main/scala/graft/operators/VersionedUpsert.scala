package graft.operators

import graft.schema.ChangeEvent.Booking
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned-upsert semantics: the Spark re-expression of
  * `ReplacingMergeTree(version, is_deleted)`
  * (`/root/reference/schemas/clickhouse_schemas.sql:11-13`,
  * `README.md:59-62`).
  *
  * The logical table is an append-only change log; reads apply a
  * dedup-on-read view (the reference's `FINAL`, `README.md:309-318`):
  * per key keep the max-version row, and drop the key entirely when that
  * row is a soft delete. Compaction (`OPTIMIZE … DEDUPLICATE`,
  * `README.md:310`) is the same collapse materialized back to storage.
  *
  * Scale notes (100 TB):
  *  - Both strategies shuffle ONCE on the key. `latestRows` (window) is
  *    hash-partition + per-partition sort; `latestRowsAgg` (`max_by`)
  *    is a hash aggregate with map-side partial aggregation — no sort,
  *    and pre-shuffle combining collapses hot keys early, so it is the
  *    default for high-duplication logs and the streaming path.
  *  - Ties on `version` (at-least-once replays,
  *    `clickhouse_sink_configuration.json:13`) break deterministically:
  *    version desc, is_deleted desc (a replayed delete beats a replayed
  *    upsert of the same version), modified_at desc. Property-tested.
  */
object VersionedUpsert {

  /** Deterministic recency order for a log with the Booking shape. */
  private val bookingOrder: Seq[Column] =
    Seq(col("version").desc, col("is_deleted").desc, col("modified_at").desc)

  /** Stable payload tiebreak once every recency key ties (an
    * at-least-once replay of the same change): compares the remaining
    * fields so the order is *total* and the winner is independent of
    * encounter/merge order under partial aggregation.
    */
  private val payloadTie: Ordering[Booking] = Ordering.by { b: Booking =>
    (Option(b.status), Option(b.created_at).map(_.getTime), b.is_canceled)
  }

  /** Typed mirror of [[bookingOrder]] as a strict "a is newer than b"
    * — the comparison both single-shuffle collapse paths
    * ([[LatestAggregator]], [[graft.streaming.StatefulUpsert]]) reduce
    * with. Spark's `desc` sorts NULLS LAST, so a non-null
    * `modified_at` beats null here too; the final payload tiebreak
    * makes the order total (see [[payloadTie]]).
    */
  def newer(a: Booking, b: Booking): Boolean = {
    if (a.version != b.version) return a.version > b.version
    if (a.is_deleted != b.is_deleted) return a.is_deleted > b.is_deleted
    val am = a.modified_at
    val bm = b.modified_at
    if ((am == null) != (bm == null)) return am != null // desc NULLS LAST
    if (am != null && am.getTime != bm.getTime) return am.after(bm)
    payloadTie.compare(a, b) > 0
  }

  /** Generic argmax-per-key via window `row_number` (SURVEY.md A2 form a).
    * `order` must be a total order for determinism under replay.
    */
  def latestRows(log: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Generic argmax-per-key via `max_by(struct(*), orderKey)` (form b):
    * single hash aggregate, partial-aggregation friendly — preferred
    * when duplication is high or input is a stream micro-batch.
    */
  def latestRowsAgg(log: DataFrame, keys: Seq[String], orderKey: Column): DataFrame = {
    val payload = log.columns.filterNot(keys.contains).map(col)
    val out = log.columns.map(col)
    log
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.toIndexedSeq: _*), orderKey).as("__latest"))
      .select(keys.map(col) ++ log.columns.filterNot(keys.contains)
        .map(c => col(s"__latest.$c").as(c)): _*)
      .select(out.toIndexedSeq: _*)
  }

  /** Dedup-on-read view of a Booking-shaped log — `SELECT … FINAL`
    * (`README.md:309-318`): latest row per booking_id, soft-deleted keys
    * dropped.
    */
  def finalView(log: DataFrame): DataFrame =
    latestRows(log, Seq("booking_id"), bookingOrder)
      .filter(col("is_deleted") === 0)

  /** `finalView` via the aggregate strategy; same result, different
    * physical plan (hash agg instead of window sort).
    */
  def finalViewAgg(log: DataFrame): DataFrame =
    latestRowsAgg(log, Seq("booking_id"),
      struct(col("version"), col("is_deleted"), col("modified_at")))
      .filter(col("is_deleted") === 0)

  /** Physical compaction (`OPTIMIZE TABLE … DEDUPLICATE`,
    * `README.md:310`): collapse the log to one row per key.
    *
    * @param keepTombstones keep max-version delete markers (safe under
    *   later replay of OLDER versions — they cannot resurrect a deleted
    *   key); `false` mirrors ClickHouse's cleanup, which physically
    *   drops deleted keys at merge.
    */
  def compact(log: DataFrame, keepTombstones: Boolean = true): DataFrame = {
    val collapsed = latestRows(log, Seq("booking_id"), bookingOrder)
    if (keepTombstones) collapsed else collapsed.filter(col("is_deleted") === 0)
  }

  /** Initial backfill (`README.md:156-168`): a snapshot projected to the
    * Booking shape and stamped `version = 1`; all real LSNs exceed 1, so
    * CDC rows win the argmax — same property as the reference.
    */
  def backfill(snapshot: DataFrame): DataFrame =
    snapshot.select(
      col("booking_id"), col("status"),
      lit(0).as("is_deleted"), col("is_canceled"),
      col("created_at"), col("modified_at"),
      lit(1L).as("version"))
}
