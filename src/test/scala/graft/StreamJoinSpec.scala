package graft

import graft.streaming.StreamJoin
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join: in-window purchases match, out-of-window
  * and cross-user purchases don't.
  */
class StreamJoinSpec extends SparkSpec {

  test("clickPurchaseAttribution joins within the interval only") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)

    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamJoin.clickPurchaseAttribution(
      clicks.toDF().toDF("user_id", "click_ts", "click_id"),
      purchases.toDF().toDF("p_user_id", "purchase_ts", "purchase_id"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      clicks.addData((1L, t(0), 100L), (2L, t(0), 101L))
      purchases.addData(
        (1L, t(10), 200L), // in window → match
        (1L, t(45), 201L), // beyond 30 min → no match
        (3L, t(5), 202L))  // no such user's click → no match
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((100L, 200L)))
    } finally q.stop()
  }
}
