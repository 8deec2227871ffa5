package graft

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

/** Streaming Bloom gate vs the batch incremental row: per-document
  * parity on the probe batch, the no-false-negative contract, and a
  * definitely-new document passing clean.
  */
class StreamingDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed probe batch matches bloomIncremental row for row") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (m, words) = Dedup.bloomArtifact(spark, dir)
    val batch = Dedup.bloomIncremental(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    val probeDocs = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.maybeDupStream(
        in.toDF().toDF("doc_id", "text"), m, words)
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_gate").start()
    try {
      in.addData(probeDocs: _*)
      q.processAllAvailable()
      val streamed = spark.table("bloom_gate").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (id, maybe) =>
        assert(maybe === batch(id)._1, s"doc $id diverges from the batch row")
        // no false negatives: exact dup ⇒ flagged
        if (batch(id)._2) assert(maybe, s"doc $id is a dup the gate missed")
      }
    } finally q.stop()
  }

  test("a never-seen document passes the gate clean") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (m, words) = Dedup.bloomArtifact(spark, dir)
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.maybeDupStream(
        in.toDF().toDF("doc_id", "text"), m, words)
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_gate2").start()
    try {
      in.addData((999999L,
        "a sentence that exists nowhere in the synthetic corpus xyzzy plugh"))
      q.processAllAvailable()
      val row = spark.table("bloom_gate2").collect().head
      assert(!row.getBoolean(2), "fresh content must not be flagged")
    } finally q.stop()
  }
}
