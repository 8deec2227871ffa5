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

  test("streaming windowed HDR cells equal the batch sketch per window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // orders replayed as (event-time, cents) rows, OUT OF ORDER across
    // two batches (second half first) — the watermark must still land
    // every row in its window because the delay covers the disorder
    val rows = Tables(spark, dir, "orders")
      .select(col("o_orderdate").cast("timestamp").cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(Long, Long)].collect()

    val in = MemoryStream[(Long, Long)]
    val q = streaming.StreamingStats.hdrWindowCells(
        in.toDF().select(col("_1").cast("timestamp").as("ts"),
          col("_2").as("v")),
        "v", "ts", "7 days", "400 days")
      .writeStream.outputMode("complete").format("memory")
      .queryName("hdrcells").start()
    try {
      val (w1, w2) = rows.splitAt(rows.length / 2)
      in.addData(w2.toSeq); q.processAllAvailable()
      in.addData(w1.toSeq); q.processAllAvailable()
      val got = spark.table("hdrcells").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("w_start").getTime,
          r.getAs[Long]("e"), r.getAs[Long]("sub")) -> r.getAs[Long]("n"))
        .toMap

      // batch twin: the SAME window assignment (Spark's window() in a
      // batch frame) + the pinned batch bucket build per window
      val batch = operators.Sketches.hdrCells(
          Tables(spark, dir, "orders")
            .select(window(col("o_orderdate").cast("timestamp"), "7 days")
                .getField("start").as("w_start"),
              expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
            .filter(col("v") >= 1L)
            .withColumn("v2", col("v")), "v2")
      // hdrCells groups only by (e, sub) — regroup with the window for
      // the per-window expectation instead
      val expected = operators.Sketches.hdrBuckets(
          Tables(spark, dir, "orders")
            .select(window(col("o_orderdate").cast("timestamp"), "7 days")
                .getField("start").as("w_start"),
              expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
            .filter(col("v") >= 1L), "v")
        .groupBy("w_start", "e", "sub").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("w_start").getTime,
          r.getAs[Long]("e"), r.getAs[Long]("sub")) -> r.getAs[Long]("n"))
        .toMap
      assert(batch.columns.contains("key")) // batch build untouched
      assert(got === expected)
      assert(got.nonEmpty)
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
