package graft

import graft.operators.Temporal
import graft.streaming.StreamingSessions
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Streaming sessionization vs the batch window chain: closed sessions
  * off a live stream must match `Temporal.sessionize` row-for-row —
  * including the exactly-6h tie (extends the session on both paths),
  * out-of-order arrival inside a session, the cross-batch merge where
  * a late middle event bridges two open sessions into one, and
  * decimal-summed values cast at the edge.
  */
class StreamingSessionsSpec extends SparkSpec {

  private val hourUs = 3600L * 1000 * 1000
  private val t0 = 1700000000000000L

  // (event_id, us, user_id, value)
  private def fixture: Seq[(Long, Long, Long, Double)] = Seq(
    // u1: two sessions — gap of exactly 6h extends, 6h+1µs breaks
    (10L, t0, 1L, 1.5),
    (11L, t0 + 6 * hourUs, 1L, 2.25),             // exactly 6h: SAME session
    (12L, t0 + 12 * hourUs + 1L, 1L, 4.0),        // 6h+1µs after prev: NEW session
    // u2: out-of-order within one session (second event arrives first)
    (20L, t0 + hourUs, 2L, 3.0),
    (21L, t0, 2L, 1.0),
    // u3: bridge — events at t0 and t0+10h are two sessions until the
    // t0+5h middle event arrives in a LATER wave and merges them
    (30L, t0, 3L, 1.0),
    (31L, t0 + 10 * hourUs, 3L, 1.0),
    (32L, t0 + 5 * hourUs, 3L, 1.0))

  test("closed streaming sessions match the batch sessionizer, bridge merge included") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Long, Long, Double)]
    val stream = in.toDF().toDF("event_id", "us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val q = StreamingSessions.sessionAgg(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    val wave2Ids = Set(12L, 31L, 32L)
    try {
      // wave 1: early events only — max ts is u1's +6h, so the
      // watermark after the batch is +4h and u3's t0 session is still
      // open and mergeable (u2 arrives out of order inside this batch)
      in.addData(fixture.filterNot(f => wave2Ids(f._1)): _*)
      q.processAllAvailable()
      // wave 2: u3's bridge (+5h, above the +4h watermark — admitted)
      // lands TOGETHER with the +10h event it must chain to, so the
      // provisional [t0, t0+6h] session extends through +5h to +10h
      // in one merge; u1's final event opens its second session
      in.addData(fixture.filter(f => wave2Ids(f._1)): _*)
      q.processAllAvailable()
      // wave 3: advance the watermark far past every session window so
      // all sessions close (watermark = max event time − lateness)
      in.addData((99L, t0 + 100 * hourUs, 99L, 0.0))
      q.processAllAvailable()
      in.addData((98L, t0 + 200 * hourUs, 99L, 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sessions")
        .filter(col("user_id") < 10)
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet

      // batch truth over the same events written as a table
      val dir = java.nio.file.Files.createTempDirectory("sess").toString
      fixture.toDF("event_id", "us", "user_id", "value")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), lit("view").as("event_type"), col("value"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
      val batch = Temporal.sessionize(spark, dir)
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet

      assert(streamed === batch)
      // the semantics the fixture plants, asserted explicitly:
      val u1 = streamed.filter(_._1 == 1L)
      assert(u1.size === 2, "exactly-6h extends; 6h+1µs breaks")
      assert(u1.map(_._4).toSeq.sorted === Seq(1L, 2L))
      val u3 = streamed.filter(_._1 == 3L)
      assert(u3.size === 1 && u3.head._4 === 3L, "bridge event merges the two halves")
    } finally q.stop()
  }

  test("corpus replay at sf0.001: every closed session matches the batch table") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    val maxUs = ev.map(_._2).max
    val in = MemoryStream[(Long, Long, Long, Double)]
    val stream = in.toDF().toDF("event_id", "us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val q = StreamingSessions.sessionAgg(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_corpus").start()
    try {
      in.addData(ev: _*)
      q.processAllAvailable()
      // two sentinel waves push the watermark past every open session
      in.addData((-1L, maxUs + 100 * hourUs, -1L, 0.0))
      q.processAllAvailable()
      in.addData((-2L, maxUs + 200 * hourUs, -1L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_corpus")
        .filter(col("user_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      val batch = Temporal.sessionize(spark, dir)
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("events beyond the watermark lateness are dropped, not corrupted") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Long, Long, Double)]
    val stream = in.toDF().toDF("event_id", "us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val q = StreamingSessions.sessionAgg(stream, lateness = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_late").start()
    try {
      in.addData((1L, t0, 7L, 1.0))
      q.processAllAvailable()
      in.addData((2L, t0 + 50 * hourUs, 8L, 1.0)) // watermark → t0+49h
      q.processAllAvailable()
      in.addData((3L, t0 + hourUs, 7L, 9.0)) // 48h late: dropped
      q.processAllAvailable()
      in.addData((4L, t0 + 100 * hourUs, 8L, 1.0))
      q.processAllAvailable()
      val u7 = spark.table("sessions_late").filter(col("user_id") === 7L)
        .collect()
      assert(u7.length === 1)
      assert(u7.head.getAs[Long]("n_events") === 1L, "late straggler must not reopen")
      assert(u7.head.getAs[Double]("total_value") === 1.0)
    } finally q.stop()
  }
}
