package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic MERGE INTO — the lakehouse upsert-apply statement
  * (`MERGE INTO target USING source ON key WHEN MATCHED [AND cond]
  * THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT`), which is how a
  * batch consumer applies a CDC change set to a materialized table.
  * The reference reaches the same end state through
  * `ReplacingMergeTree` merges (`/root/reference/schemas/
  * clickhouse_schemas.sql:1-13`); MERGE is the explicit-batch form of
  * that collapse, and the two must agree — the oracle row proves
  * `merge(FINAL@v1, changes in (v1,v2]) == FINAL@v2` against the
  * [[CdcHistory.asOfFinal]] time-travel definition.
  *
  * Scale shape (100 TB): one shuffle on the key for each side of a
  * full-outer hash join — the same exchange the FINAL read pays — and
  * the change set is first collapsed to its per-key argmax (map-side
  * combined), so the join's source side carries one row per changed
  * key, not the raw change volume. No window over the target, no
  * driver materialization; a bucketed target table joins with zero
  * additional exchange.
  */
object MergeInto {

  /** Apply a collapsed change set to a target table.
    *
    * @param target  current table state, one row per `key`
    * @param source  change rows (may hold many versions per key — it is
    *                collapsed to the max-`versionCol` row per key first)
    * @param key     equi-join key column name
    * @param versionCol  total-order recency column in `source`
    * @param deleteWhen  matched/new rows satisfying this on the SOURCE
    *                    row are dropped (soft-delete application)
    * @return the merged table: updated matched keys, inserted new keys,
    *         deleted keys removed, untouched target rows passed through
    */
  def apply(target: DataFrame, source: DataFrame, key: String,
            versionCol: String, deleteWhen: Column): DataFrame = {
    // SQL MERGE treats a NULL `WHEN MATCHED AND cond` as NOT satisfied
    // (the row falls through to UPDATE/INSERT) — coalesce pins that:
    // without it a null predicate would negate to null and silently
    // act as DELETE
    val latest = VersionedUpsert.latestRowsAgg(source, Seq(key), col(versionCol))
      .withColumn("__delete", coalesce(deleteWhen, lit(false)))
    val cols = target.columns
    target.as("t")
      .join(latest.as("s"), col(s"t.$key") === col(s"s.$key"), "full_outer")
      // WHEN MATCHED AND delete → drop; otherwise source wins (UPDATE /
      // INSERT); unmatched target rows pass through unchanged
      .filter(col(s"s.$key").isNull || !col("s.__delete"))
      // row presence (the join key), not per-column coalesce, decides
      // which side wins — a NULL in a source payload column is a real
      // NULL update, not a fall-through to the stale target value
      .select(cols.map(c =>
        when(col(s"s.$key").isNotNull, col(s"s.$c"))
          .otherwise(col(s"t.$c")).as(c)).toIndexedSeq: _*)
  }

  /** Driver-checked query: rebuild FINAL@v2 by MERGE-ing the (v1, v2]
    * change slice into FINAL@v1 (cuts as in [[CdcHistory.snapshotDiff]]:
    * v1 = ⌊max/3⌋, v2 = ⌊2·max/3⌋). The oracle computes FINAL@v2
    * directly — the merge path and the dedup-on-read path must agree
    * row-for-row, which is exactly the contract MERGE exists to keep.
    */
  def mergeApply(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value")
    val cuts = events.agg(
      floor(max(col("event_id")).cast("double") / 3).cast("long").as("v1"),
      floor(max(col("event_id")).cast("double") * 2 / 3).cast("long").as("v2"))
    val withCuts = events.join(broadcast(cuts))
    // target = FINAL@v1 (soft-deleted keys dropped, as served to readers)
    val target = VersionedUpsert.latestRows(
      withCuts.filter(col("event_id") <= col("v1")),
      Seq("user_id"), Seq(col("event_id").desc))
      .filter(col("event_type") =!= "error")
      .drop("v1", "v2")
    // source = the raw change slice (v1, v2] — multiple versions per key
    val source = withCuts
      .filter(col("event_id") > col("v1") && col("event_id") <= col("v2"))
      .drop("v1", "v2")
    MergeInto(target, source, key = "user_id", versionCol = "event_id",
        deleteWhen = col("event_type") === "error")
      .orderBy("user_id")
  }
}
