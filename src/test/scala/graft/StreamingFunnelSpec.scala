package graft

import graft.operators.Behavior
import graft.streaming.StreamingFunnel
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Streaming funnel frontier vs the batch funnel: per-user stage
  * minima must match the batch rule exactly — including out-of-order
  * arrival (a click delivered before its view; a LATE earlier view
  * that re-arms the closure timer), ordering rejections (purchase
  * without click), window expiry, and the viewless-GC path — and the
  * aggregated stage counts must equal `funnelConversion` on the same
  * events written as a table.
  */
class StreamingFunnelSpec extends SparkSpec {

  private val hourUs = 3600L * 1000 * 1000
  private val dayUs = Behavior.dayUs
  private val t0 = 1700000000000000L

  // (user, us, type) — funnel events only; heartbeat added separately
  private def fixture: Seq[(Long, Long, String)] = Seq(
    // u1: clean three-stage conversion
    (1L, t0, "view"), (1L, t0 + hourUs, "click"),
    (1L, t0 + 2 * hourUs, "purchase"),
    // u2: click 8 days out — outside the 7-day window
    (2L, t0, "view"), (2L, t0 + 8 * dayUs, "click"),
    // u3: click@+90m delivered BEFORE its view@+1h (out of order)
    (3L, t0 + hourUs, "view"), (3L, t0 + 90 * 60 * 1000000L, "click"),
    // u4: purchase without a click — stays stage 1
    (4L, t0, "view"), (4L, t0 + 30 * 60 * 1000000L, "purchase"),
    // u5: click but never a view — emits nothing (GC path)
    (5L, t0, "click"),
    // u6: view@t0, click@+1m, then an EARLIER view@-1h arriving late
    (6L, t0, "view"), (6L, t0 + 60 * 1000000L, "click"),
    (6L, t0 - hourUs, "view"))

  test("per-user frontier == batch rule; aggregate == funnelConversion") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Long, String)]
    val q = StreamingFunnel.funnelFrontier(
        in.toDF().toDF("user_id", "us", "event_type")
          .withColumn("ts", timestamp_micros(col("us"))).drop("us"))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel").start()
    try {
      // wave 1: u3's click arrives BEFORE its view
      val wave1 = fixture.filter { case (u, _, t) => u == 3L && t == "click" }
      // u6's late view and u2's far-future click get their own later
      // waves: the late view must land while the watermark is still
      // below u6's deadline (a watermark past the deadline makes it
      // genuinely too late — the funnel has already closed)
      val wave3 = fixture.filter { case (u, us, _) => u == 6L && us == t0 - hourUs }
      val wave4 = fixture.filter { case (u, _, t) => u == 2L && t == "click" }
      val wave2 = fixture.diff(wave1 ++ wave3 ++ wave4)
      in.addData(wave1)
      q.processAllAvailable()
      in.addData(wave2)
      q.processAllAvailable()
      in.addData(wave3)
      q.processAllAvailable()
      in.addData(wave4)
      q.processAllAvailable()
      // heartbeat far past every deadline, then an empty batch so the
      // advanced watermark fires the timers
      in.addData(Seq((999L, t0 + 20 * dayUs, "heartbeat")))
      q.processAllAvailable()
      in.addData(Seq.empty)
      q.processAllAvailable()
      val rows = spark.table("funnel").collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("v_us"),
            Option(r.getAs[Any]("c_us")).map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("p_us")).map(_.asInstanceOf[Long]),
            r.getAs[Int]("stage_reached")))).toMap
      assert(rows.keySet === Set(1L, 2L, 3L, 4L, 6L), "u5 has no view: no row")
      assert(rows(1L) === ((t0, Some(t0 + hourUs), Some(t0 + 2 * hourUs), 3)))
      assert(rows(2L) === ((t0, None, None, 1)))
      assert(rows(3L) === ((t0 + hourUs, Some(t0 + 90 * 60 * 1000000L), None, 2)))
      assert(rows(4L) === ((t0, None, None, 1)))
      // the late earlier view re-armed the window: v = t0 - 1h
      assert(rows(6L) === ((t0 - hourUs, Some(t0 + 60 * 1000000L), None, 2)))

      // aggregate parity with the batch funnel on the same events
      val dir = java.nio.file.Files.createTempDirectory("funnel-batch").toString
      fixture.zipWithIndex.map { case ((u, us, t), i) =>
        (i.toLong, us, u, t, 1.0, "{}")
      }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
      val batch = Behavior.funnelConversion(spark, dir).collect()
        .map(r => r.getAs[Long]("stage_idx") -> r.getAs[Long]("users")).toMap
      val streamedCounts = (1 to 3).map(k =>
        k.toLong -> rows.values.count(_._4 >= k).toLong).toMap
      assert(streamedCounts === batch)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
