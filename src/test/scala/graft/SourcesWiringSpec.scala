package graft

import graft.sources.ChangeLog

/** The kafka/jdbc prod wiring in `sources/` — the only main-source
  * functions the sandbox cannot run end to end (no broker, no
  * database, no connector jars). What CAN be certified without either:
  * the exact option maps each path hands the DataSource (the contract
  * with the connector), and that the builders plumb those options all
  * the way to the resolution/connect boundary — the failure each one
  * throws is the connector lookup / driver connect itself, never a
  * graft-side wiring error before it.
  */
class SourcesWiringSpec extends SparkSpec {

  test("kafka source options: subscription, bootstrap, full-log replay") {
    assert(ChangeLog.kafkaOptions("broker-1:9092,broker-2:9092", "bookings_changes") ===
      Map(
        "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
        "subscribe" -> "bookings_changes",
        "startingOffsets" -> "earliest"))
  }

  test("jdbc options: unpartitioned pull is url+dbtable only") {
    assert(ChangeLog.jdbcOptions("jdbc:postgresql://db:5432/app", "public.bookings") ===
      Map(
        "url" -> "jdbc:postgresql://db:5432/app",
        "dbtable" -> "public.bookings"))
  }

  test("jdbc options: partitioned pull carries all four split options") {
    assert(ChangeLog.jdbcOptions("jdbc:postgresql://db:5432/app", "public.bookings",
      Some(("id", 0L, 1000000L, 16))) ===
      Map(
        "url" -> "jdbc:postgresql://db:5432/app",
        "dbtable" -> "public.bookings",
        "partitionColumn" -> "id",
        "lowerBound" -> "0",
        "upperBound" -> "1000000",
        "numPartitions" -> "16"))
  }

  test("kafkaStream resolves up to the kafka DataSource lookup") {
    // no spark-sql-kafka jar in the harness: a correctly-wired builder
    // must fail AT the connector lookup (the error names the kafka
    // format and the structured-streaming doc), not before it
    val e = intercept[Exception] {
      ChangeLog.kafkaStream(spark, "broker:9092", "bookings_changes")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
    assert(e.getMessage.contains("Failed to find") ||
      e.getMessage.toLowerCase.contains("data source"), e.getMessage)
  }

  test("jdbcSnapshot resolves up to the driver connect") {
    // format("jdbc") is built into Spark, so resolution goes further:
    // with no postgres driver on the classpath the failure is the
    // connect step itself (driver registry), proving url/dbtable/props
    // all reached the JDBC layer intact
    val props = new java.util.Properties()
    props.setProperty("user", "svc")
    val e = intercept[Exception] {
      ChangeLog.jdbcSnapshot(spark, "jdbc:postgresql://db:5432/app",
        "public.bookings", props, Some(("id", 0L, 100L, 4)))
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("driver") || msg.contains("connect"), e.getMessage)
  }
}
