package graft

import graft.operators.Temporal
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Linear multi-touch attribution: window membership (simultaneous in,
  * 8-days-ago out), integer micro-unit credit, zero-touch NULL, and
  * consistency with the last-touch operator.
  */
class MultiTouchSpec extends SparkSpec {

  private val hourUs = 3600L * 1000000L
  private val dayUs = 86400L * 1000000L
  private val t0 = 1700000000000000L

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mt").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    dir
  }

  test("window membership and exact integer credit split") {
    val dir = writeEvents(Seq(
      // u1: purchase at t0+10d with clicks at −1h, exactly t0+10d
      // (simultaneous: counts), and 8 days before (outside window)
      (1L, t0 + 10 * dayUs, 1L, "purchase", 9.6025),
      (2L, t0 + 10 * dayUs - hourUs, 1L, "click", 0.0),
      (3L, t0 + 10 * dayUs, 1L, "click", 0.0),
      (4L, t0 + 2 * dayUs, 1L, "click", 0.0), // 8 days before: out
      // u2: purchase with no clicks at all
      (5L, t0 + 10 * dayUs, 2L, "purchase", 4.0),
      // u3: three clicks → floor division leaves a remainder
      (6L, t0 + 10 * dayUs, 3L, "purchase", 1.0001),
      (7L, t0 + 9 * dayUs, 3L, "click", 0.0),
      (8L, t0 + 8 * dayUs, 3L, "click", 0.0),
      (9L, t0 + 10 * dayUs - 1L, 3L, "click", 0.0)))
    val got = Temporal.multiTouchAttribution(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(3) === 2L, "simultaneous in, 8-days-ago out")
    // 9.6025 → 96025e4 units; /2 = 480125000 exactly
    assert(got(1L).getLong(4) === 480125000L)
    assert(got(5L).getLong(3) === 0L)
    assert(got(5L).isNullAt(4), "zero-touch keeps NULL credit")
    assert(got(6L).getLong(3) === 3L)
    // 1.0001 → 100010000 e8-units; div 3 = 33336666 floor (ledger rule)
    assert(got(6L).getLong(4) === 100010000L / 3L)
  }

  test("sf0.001: whenever touches exist, the last-touch click is one of them") {
    val dir = "/root/testdata/sf0.001"
    val mt = Temporal.multiTouchAttribution(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val lt = Temporal.lastTouchAttribution(spark, dir).collect()
    lt.foreach { r =>
      val purchase = r.getLong(0)
      val hasLast = !r.isNullAt(3)
      val gapOk = hasLast && r.getLong(5) <= Temporal.attributionLookbackUs
      if (gapOk) assert(mt(purchase) >= 1L,
        s"purchase $purchase has an in-window last touch but no multi-touch")
      if (mt(purchase) >= 1L) assert(hasLast,
        s"purchase $purchase splits credit but last-touch found nothing")
    }
  }
}
