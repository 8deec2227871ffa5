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
}
