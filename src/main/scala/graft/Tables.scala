package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Testdata table loader (`/root/testdata/sf{N}/<name>.parquet`,
  * TESTDATA.md). One parquet directory per table; explicit paths, no
  * catalog — the driver's DuckDB oracle reads the same files.
  */
object Tables {

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    * floor-divide to micros — the same truncation DuckDB applies when it
    * narrows nanos to its native micros, so oracle comparisons agree.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) if name == "events" =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
}
