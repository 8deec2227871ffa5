package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed-table layout: pre-shuffled, co-located joins.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key pays the shuffle ONCE at write time; every subsequent join
  * on that key reads matching buckets pairwise — no Exchange, no sort,
  * at any scale. The storage analog of the reference's clustered
  * `ORDER BY booking_id` primary key
  * (`/root/reference/schemas/clickhouse_schemas.sql:12-13`), applied to
  * Spark's scan-time join planning instead of a merge engine.
  *
  * Use for fact tables joined repeatedly on the same key (orders ⋈
  * lineitem on orderkey); bucket counts must match across tables and
  * should divide evenly into executor parallelism.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: planned without
    * a shuffle on either side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Hive-style partitioned layout (`dir/col=value/...`): equality and
    * range predicates on the partition column prune whole directories
    * at planning time (`PartitionFilters` in the scan) — the coarse
    * companion to parquet row-group skipping, and the standard layout
    * for time-series fact tables (partition by day, prune to the query
    * window before a single byte is read).
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(dir)

  /** One-day aggregate over a day-partitioned events layout: lays the
    * table out Hive-style by `day` once (cached across invocations on
    * the same source dir), then reads it back with an equality
    * predicate on the partition column — the scan plans with a
    * `PartitionFilters` entry and touches exactly 1 of ~30 day
    * directories before reading a byte (asserted in BucketingSpec).
    * The daily-partitioned fact table + pruned time-window query is
    * THE standard 100 TB time-series layout.
    */
  def partitionPrunedDay(spark: SparkSession, dir: String,
                         day: String = "2024-01-15"): DataFrame = {
    val layout = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_events_by_day_" + dir.replaceAll("[^A-Za-z0-9]", "_")).getPath
    if (!new java.io.File(layout, "_SUCCESS").exists())
      writePartitioned(
        Tables(spark, dir, "events").withColumn("day", to_date(col("ts"))),
        layout, "day")
    spark.read.parquet(layout)
      .filter(col("day") === lit(java.sql.Date.valueOf(day)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .orderBy("event_type")
  }
}
