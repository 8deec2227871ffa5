package graft

import org.apache.spark.sql.functions._

/** Streaming Benford parity: the running digit census over a replayed
  * order stream must equal the batch operator's counts per digit —
  * the ppm/χ² columns are pure functions of these counts, so count
  * parity is full parity.
  */
class StreamingStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming digit census equals the batch Benford counts") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val prices = Tables(spark, dir, "orders")
      .select(col("o_totalprice").cast("string"))
      .as[String].collect()

    val in = MemoryStream[String]
    val q = streaming.StreamingStats.benfordCounts(
        in.toDF().select(col("value").cast("decimal(12,2)")
          .as("o_totalprice")))
      .writeStream.outputMode("complete").format("memory")
      .queryName("benford").start()
    try {
      val (w1, w2) = prices.splitAt(prices.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val got = spark.table("benford").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batch = operators.Stats.benfordDigits(spark, dir).collect()
        .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n_obs")).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("sub-unit amounts are excluded mid-stream, matching the contract") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[String]
    val q = streaming.StreamingStats.benfordCounts(
        in.toDF().select(col("value").cast("decimal(12,2)")
          .as("o_totalprice")))
      .writeStream.outputMode("complete").format("memory")
      .queryName("benford2").start()
    try {
      in.addData(Seq("0.50", "1000.00", "19.99", "0.01"))
      q.processAllAvailable()
      val got = spark.table("benford2").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got === Map(1 -> 2L))
    } finally q.stop()
  }
}
