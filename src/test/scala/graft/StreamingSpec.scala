package graft

import graft.operators.{MvTransform, VersionedUpsert}
import graft.schema.ChangeEvent.Booking
import graft.sources.{ChangeLog, WorkloadFixture}
import graft.streaming.{CdcPipeline, StatefulUpsert}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming: change events land in a directory; the pipeline
  * incrementally transforms and appends; finalView over the produced log
  * matches the golden table — including across two separate micro-batch
  * waves (incremental-view-maintenance contract, SURVEY.md T2).
  */
class StreamingSpec extends SparkSpec {

  test("streamed workload → finalView golden table, incrementally") {
    val root = Files.createTempDirectory("graft-stream").toString
    val changes = s"$root/changes"
    val bookings = s"$root/bookings"
    val ckpt = s"$root/ckpt"

    val evts = WorkloadFixture.events
    val (wave1, wave2) = evts.splitAt(evts.size / 2)

    // wave 1 lands, pipeline drains it
    WorkloadFixture.toDf(spark, wave1).write.mode("append").parquet(changes)
    CdcPipeline.runOnce(spark, changes, bookings, ckpt)
    val mid = VersionedUpsert.finalView(spark.read.parquet(bookings))
    assert(mid.count() > 0)

    // wave 2 lands, a NEW query resumes from the checkpoint and
    // processes only the new files
    WorkloadFixture.toDf(spark, wave2).write.mode("append").parquet(changes)
    CdcPipeline.runOnce(spark, changes, bookings, ckpt)

    val fv = VersionedUpsert.finalView(spark.read.parquet(bookings))
    val got = fv.select("booking_id", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === Seq(
      ("b1", "Open"), ("b10", "Completed"), ("b2", "Created"),
      ("b7", "Completed"), ("b8", "Cancelled"), ("b9", "Cancelled")))

    // a fresh checkpoint reprocesses every change file and appends
    // duplicates — an at-least-once double delivery; finalView unchanged
    CdcPipeline.runOnce(spark, changes, bookings, s"$root/ckpt2")
    val replayed = VersionedUpsert.finalView(spark.read.parquet(bookings))
    assert(replayed.count() === 6L)
  }

  test("schema-change events land in the dead letter; data path unaffected (T7)") {
    import graft.schema.ChangeEvent.{Event, Source}
    val root = Files.createTempDirectory("graft-dlq").toString
    val changes = s"$root/changes"
    val bookings = s"$root/bookings"
    val deadLetter = s"$root/dead_letter"

    // the README workload plus two non-data envelopes: a DDL-shaped
    // message (op='t') and a degenerate null-op heartbeat
    val ddl = Event(null, null, Source("[\"0\",\"9999\"]", 9999L), "t",
      1704067200000L)
    val heartbeat = Event(null, null, Source("[\"0\",\"10000\"]", 10000L), null,
      1704067201000L)
    WorkloadFixture.toDf(spark, WorkloadFixture.events ++ Seq(ddl, heartbeat))
      .write.mode("append").parquet(changes)

    CdcPipeline.runOnce(spark, changes, bookings, s"$root/ckpt",
      deadLetterDir = Some(deadLetter))

    // data path: identical golden table, no contamination
    val fv = VersionedUpsert.finalView(spark.read.parquet(bookings))
    assert(fv.count() === 6L)
    assert(spark.read.parquet(bookings)
      .filter(!col("version").isin(9999L, 10000L)).count() ===
      WorkloadFixture.events.size)

    // side output: exactly the two dropped envelopes, raw shape intact
    val dropped = spark.read.parquet(deadLetter)
    assert(dropped.count() === 2L)
    assert(dropped.select("source.lsn").collect().map(_.getLong(0)).toSet ===
      Set(9999L, 10000L))
  }

  test("kafka wire shape: binary (key,value) JSON frames → fromJsonValues → latestPerKey golden") {
    // Exercises the exact shape `ChangeLog.kafkaStream` consumes — the
    // kafka source's binary key/value columns carrying StringConverter
    // keys and schemaless-JSON envelopes — without a broker: a
    // MemoryStream of byte-array frames stands in for the topic.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val events = WorkloadFixture.toDf(spark)
    val frames: Seq[(Array[Byte], Array[Byte])] = events.select(
        coalesce(col("after.booking_id"), col("before.booking_id")).as("k"),
        to_json(struct(events.columns.map(col): _*)).as("v"))
      .collect()
      .map(r => (r.getString(0).getBytes("UTF-8"), r.getString(1).getBytes("UTF-8")))
      .toSeq
    val (wave1, wave2) = frames.splitAt(frames.size / 2)

    val in = MemoryStream[(Array[Byte], Array[Byte])]
    val wire = in.toDF().toDF("key", "value") // kafka source column shape
    val upserts = MvTransform(ChangeLog.fromJsonValues(wire)).as[Booking]
    val q = StatefulUpsert.latestPerKey(upserts)
      .writeStream.outputMode("update").format("memory").queryName("wire").start()
    try {
      in.addData(wave1); q.processAllAvailable()
      in.addData(wave2); q.processAllAvailable()
      val streamed = VersionedUpsert.finalViewAgg(spark.table("wire"))
        .select("booking_id", "status").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      assert(streamed === Seq(
        ("b1", "Open"), ("b10", "Completed"), ("b2", "Created"),
        ("b7", "Completed"), ("b8", "Cancelled"), ("b9", "Cancelled")))
    } finally q.stop()
  }
}
