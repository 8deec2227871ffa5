package graft

import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Batch-trained model → streaming inference: embeddings arriving on a
  * stream are assigned to the k-means cells trained in batch, with
  * per-row results matching an exact recomputation (same ordered-fold
  * double arithmetic, same round-then-argmax tie rule as the batch
  * assignment).
  */
class StreamingSimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamingCellScores matches a direct recomputation per arriving vector") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    val centroids = Similarity.trainedCentroids(spark, dir)
    assert(centroids.length ===
      Similarity.ivfCellCount(Tables(spark, dir, "embeddings").count()))

    val vecs = Tables(spark, dir, "embeddings")
      .filter($"vec_id" % 37 === 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(vecs.length >= 5)

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.streamingCellScores(
        in.toDF().toDF("vec_id", "embedding"), centroids)
      .writeStream.outputMode("append").format("memory").queryName("cells").start()
    try {
      val (wave1, wave2) = vecs.splitAt(vecs.length / 2)
      in.addData(wave1.toSeq); q.processAllAvailable()
      in.addData(wave2.toSeq); q.processAllAvailable()

      def dotD(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
      def round4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expected = vecs.map { case (id, emb) =>
        val v = emb.map(_.toDouble).toSeq
        val nrm = math.sqrt(dotD(v, v))
        val scored = centroids.map { case (cid, c) =>
          val cNrm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
          (round4(dotD(v, c) / (nrm * cNrm)), -cid, cid)
        }
        val best = scored.max
        id -> ((best._3, best._1))
      }.toMap

      val got = spark.table("cells").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet === expected.keySet)
      expected.foreach { case (id, e) => assert(got(id) === e, s"vec $id") }
    } finally q.stop()
  }
}
