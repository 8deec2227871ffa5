package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
