package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming serve half of the blocklist gate: documents arriving on a
  * stream get the SAME per-row verdict (all seven columns, density
  * rounding included) as the batch `blocklistFilter` — the per-row
  * parity pin every streaming serve half in the repo carries. Also
  * pins the mixed-case fold surviving the stateless path.
  */
class StreamingBlocklistSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamingBlocklistGate matches batch blocklistFilter per row") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    val batch = TextAnalysis.blocklistFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap

    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length >= 10)

    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.streamingBlocklistGate(
        in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("blgate").start()
    try {
      val (w1, w2) = docs.splitAt(docs.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      // a mixed-case planted hit arrives in wave 2 alongside real docs
      in.addData(w2.toSeq :+ (999999999L, "Merge conflicts are SLOW"))
      q.processAllAvailable()

      val got = spark.table("blgate").collect()
        .map(r => r.getLong(0) -> r.toSeq).toMap
      assert(got.keySet === batch.keySet + 999999999L)
      batch.foreach { case (id, row) =>
        assert(got(id) === row, s"doc $id diverges from the batch verdict")
      }
      // 4 tokens, 2 folded hits (merge, slow): 20·2 > 4 → dropped
      assert(got(999999999L) ===
        Seq(999999999L, 4L, 2L, 2L, "merge,slow", 0.5, false))
    } finally q.stop()
  }
}
