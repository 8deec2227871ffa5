package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Testdata table loader (`/root/testdata/sf{N}/<name>.parquet`,
  * TESTDATA.md). One parquet directory per table; explicit paths, no
  * catalog — the driver's DuckDB oracle reads the same files.
  */
object Tables {

  /** The events table's `ts` has shipped in two physical forms across
    * testdata generations: TIMESTAMP(NANOS) (which Spark 4 refuses by
    * default — read nanos as long and floor-divide to micros, the same
    * truncation DuckDB applies narrowing to its native micros) and
    * plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark
    * reads as TIMESTAMP_NTZ — cast to TIMESTAMP under the pinned UTC
    * session, the same naive reading DuckDB gives it). Both normalize
    * to identical session-TZ timestamps, so operators and oracle
    * comparisons are generation-agnostic.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) if name == "events" =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType)
          if name == "events" =>
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  }

  /** [[apply]], spread to full core parallelism when the FILE cannot
    * provide it — the feeder for CPU-heavy per-row kernels (md5
    * shingling, image codecs, Levenshtein verify).
    *
    * A parquet row group is the unit of scan parallelism; the testdata
    * tables ship as single-row-group files, so every scan is ONE task
    * regardless of `minPartitionNum` — and any expensive kernel fused
    * above that scan serializes on one core (guide §2.5: "one huge
    * unsplittable file … repartition immediately after the read"). The
    * round-robin repartition spreads the rows across
    * `spark.sql.shuffle.partitions` at the cost of shuffling the
    * projected columns once.
    *
    * Scale-adaptive by construction, not a local[32] constant: the
    * repartition only engages while the file is smaller than
    * `spark.sql.files.maxPartitionBytes` (i.e. the whole table is one
    * scan split ANYWAY — one extra tiny shuffle); a production-sized
    * table (many row groups / many files) already scans wide, the
    * branch is the identity, and no payload byte is ever re-shuffled.
    * File size is a driver-side `stat` — no job, no `.rdd`.
    */
  def spread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = apply(spark, sfDir, name)
    val bytes = new java.io.File(s"$sfDir/$name.parquet").length()
    val oneSplit = bytes > 0 &&
      bytes <= org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    if (oneSplit) {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      // deterministic hash key, 32n distinct values (guide §2.5):
      // round-robin repartition would pay a LOCAL SORT of the single
      // input partition first (sortBeforeRepartition, on by default
      // for retry determinism) — serial again for exactly the tables
      // this helper exists to spread; a deterministic hash key needs
      // no such sort and stays retry-safe. Keyed on the LEADING (id)
      // column only: hashing the whole row would drag every column
      // into the scan's ReadSchema and defeat column pruning
      // (guide §2.3 "project before the exchange"); every testdata
      // table leads with a high-cardinality key.
      val key = org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col(df.columns.head)),
        org.apache.spark.sql.functions.lit(32L * n))
      df.repartition(n, key)
    } else df
  }
}
