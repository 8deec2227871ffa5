package graft

import graft.operators.Opq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming serve half of the OPQ rotation: vectors arriving on a
  * stream, rotated with the FROZEN batch-trained artifact, must be
  * BIT-EQUAL per row to the batch `Opq.rotated` relation (same
  * broadcast artifact, same fold order, same exact-path round rule) —
  * the per-row parity pin every other streaming serve half in the
  * repo carries (E21c / E22p / hard-negatives discipline). Also pins
  * the drop rule: a vector with no observed dims leaves the stream,
  * mirroring the batch relation's flatMap semantics.
  */
class OpqStreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamingRotate matches batch rotated per row, bit-equal") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    val rot = Opq.trainedRotation(spark, dir)
    val batch = Opq.rotated(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    val vecs = Tables(spark, dir, "embeddings")
      .filter($"vec_id" % 17 === 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(vecs.length >= 5)

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Opq.streamingRotate(in.toDF().toDF("vec_id", "embedding"), rot)
      .writeStream.outputMode("append").format("memory")
      .queryName("opqrot").start()
    try {
      val (wave1, wave2) = vecs.splitAt(vecs.length / 2)
      in.addData(wave1.toSeq); q.processAllAvailable()
      // a second wave plus a no-observed-dims vector that must DROP
      in.addData(wave2.toSeq :+ (999999999L, Seq.empty[Float]))
      q.processAllAvailable()

      val got = spark.table("opqrot").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(got.keySet === vecs.map(_._1).toSet) // empty vec dropped
      got.foreach { case (id, y) =>
        assert(y === batch(id), s"vec $id diverges from batch rotation")
      }
    } finally q.stop()
  }
}
