package graft

import graft.operators.{Behavior, MvTransform, VersionedUpsert}
import graft.schema.ChangeEvent.Booking
import graft.sources.WorkloadFixture
import graft.streaming.{StatefulUpsert, StreamingFunnel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Crash/restart proof for the `transformWithState` paths (round-12
  * verdict item 5): stop the query mid-stream after batch 1, start a
  * NEW query from the same checkpoint, and assert the end state equals
  * the uninterrupted run — the RocksDB state store must carry the
  * value/list state AND the armed event-time timers across the
  * restart, and the sink must come out exactly-once (file sink) or
  * collapse-tolerant (foreachBatch + versioned FINAL read).
  *
  * The CdcPipeline checkpoint-resume golden (StreamingSpec) already
  * covers the flatMapGroupsWithState path; these two close the gap for
  * the `transformWithState` operators.
  */
class CrashResumeSpec extends SparkSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"resume-$tag").toString

  test("latestPerKeyV2 kill-and-resume reaches the uninterrupted golden table") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val upserts = MvTransform(WorkloadFixture.toDf(spark))
        .as[Booking].collect().toSeq
      val (wave1, wave2) = upserts.splitAt(upserts.size / 2)
      val cp = tmp("upsert-cp")
      val out = tmp("upsert-out")
      val in = MemoryStream[Booking]
      def start() = StatefulUpsert.latestPerKeyV2(in.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Booking], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()

      // batch 1, then KILL
      val q1 = start()
      in.addData(wave1)
      q1.processAllAvailable()
      q1.stop()

      // wave 2 lands while the query is down; a NEW query resumes from
      // the checkpoint — recovered per-key max-version state must beat
      // stale replays exactly as an uninterrupted run would
      in.addData(wave2)
      val q2 = start()
      try {
        q2.processAllAvailable()
      } finally q2.stop()

      // foreachBatch is at-least-once across the kill boundary; the
      // versioned FINAL read collapses any replayed emission — the
      // same at-least-once tolerance the CDC sink contract (S6/A4)
      // is built on
      val streamed = VersionedUpsert.finalViewAgg(spark.read.parquet(out))
        .select("booking_id", "status").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      assert(streamed === Seq(
        ("b1", "Open"), ("b10", "Completed"), ("b2", "Created"),
        ("b7", "Completed"), ("b8", "Cancelled"), ("b9", "Cancelled")))
    }
  }

  private val hourUs = 3600L * 1000 * 1000
  private val dayUs = Behavior.dayUs
  private val t0 = 1700000000000000L

  // the StreamingFunnelSpec fixture verbatim — the kill-resume run
  // must reach ITS golden expectations
  private def fixture: Seq[(Long, Long, String)] = Seq(
    (1L, t0, "view"), (1L, t0 + hourUs, "click"),
    (1L, t0 + 2 * hourUs, "purchase"),
    (2L, t0, "view"), (2L, t0 + 8 * dayUs, "click"),
    (3L, t0 + hourUs, "view"), (3L, t0 + 90 * 60 * 1000000L, "click"),
    (4L, t0, "view"), (4L, t0 + 30 * 60 * 1000000L, "purchase"),
    (5L, t0, "click"),
    (6L, t0, "view"), (6L, t0 + 60 * 1000000L, "click"),
    (6L, t0 - hourUs, "view"))

  test("funnelFrontier kill-and-resume: buffered events AND armed timers survive") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val cp = tmp("funnel-cp")
      val out = tmp("funnel-out")
      val in = MemoryStream[(Long, Long, String)]
      def start() = StreamingFunnel.funnelFrontier(
          in.toDF().toDF("user_id", "us", "event_type")
            .withColumn("ts", timestamp_micros(col("us"))).drop("us"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()

      val wave1 = fixture.filter { case (u, _, t) => u == 3L && t == "click" }
      val wave3 = fixture.filter { case (u, us, _) => u == 6L && us == t0 - hourUs }
      val wave4 = fixture.filter { case (u, _, t) => u == 2L && t == "click" }
      val wave2 = fixture.diff(wave1 ++ wave3 ++ wave4)

      // batches 1-2 (out-of-order click, then the bulk), then KILL
      // while every funnel is still open (watermark far below the
      // deadlines) — all state is in the buffers + timers
      val q1 = start()
      in.addData(wave1)
      q1.processAllAvailable()
      in.addData(wave2)
      q1.processAllAvailable()
      q1.stop()

      // resume: u6's LATE earlier view must land in the RECOVERED
      // buffer and re-arm the recovered timer; then the watermark
      // advances past every deadline and the recovered timers fire
      val q2 = start()
      try {
        in.addData(wave3)
        q2.processAllAvailable()
        in.addData(wave4)
        q2.processAllAvailable()
        in.addData(Seq((999L, t0 + 20 * dayUs, "heartbeat")))
        q2.processAllAvailable()
        in.addData(Seq.empty)
        q2.processAllAvailable()
      } finally q2.stop()

      // exactly-once file sink: read back and compare to the golden
      // per-user map the uninterrupted run (StreamingFunnelSpec)
      // asserts
      val rows = spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("v_us"),
            Option(r.getAs[Any]("c_us")).map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("p_us")).map(_.asInstanceOf[Long]),
            r.getAs[Int]("stage_reached")))).toMap
      assert(rows.keySet === Set(1L, 2L, 3L, 4L, 6L))
      assert(rows(1L) === ((t0, Some(t0 + hourUs), Some(t0 + 2 * hourUs), 3)))
      assert(rows(2L) === ((t0, None, None, 1)))
      assert(rows(3L) === ((t0 + hourUs, Some(t0 + 90 * 60 * 1000000L), None, 2)))
      assert(rows(4L) === ((t0, None, None, 1)))
      assert(rows(6L) === ((t0 - hourUs, Some(t0 + 60 * 1000000L), None, 2)))
      // exactly one closure row per funnel user — no duplicate fires
      // across the restart boundary
      assert(spark.read.parquet(out).count() === 5L)
    }
  }
}
