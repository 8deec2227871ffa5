package graft

import graft.operators.Dedup
import org.apache.spark.sql.SaveMode

/** Asymmetric containment semantics (`dedup_containment`): a document
  * embedded inside a larger one must read near-1.0 in the contained
  * direction while symmetric Jaccard would dilute, and unrelated
  * documents never pair. Planted ids are multiples of 10 because the
  * verify family samples `doc_id % 10 = 0`.
  */
class ContainmentSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("containv").toString
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("a quoted sub-document reads near-1.0 containment, low the other way") {
    val inner = "the quarterly report shows revenue growing in every " +
      "region with margins holding steady across the product lines"
    val container = "aggregator page intro text before the quote — " +
      inner + " — and a long trailing commentary section that keeps " +
      "going with entirely different material about unrelated topics " +
      "such as weather patterns and historical shipping routes and " +
      "the construction schedules of several regional rail projects"
    val unrelated = "nothing in common with the others: kernel fusion " +
      "benchmarks on accelerator clusters with tiled matrix layouts"
    val dir = writeDocs(Seq((0L, inner), (10L, container), (20L, unrelated)))
    val out = Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("c_ab"), r.getAs[Double]("c_ba")))).toMap
    assert(out.contains((0L, 10L)), "contained doc must pair")
    val (cAb, cBa) = out((0L, 10L))
    assert(cAb >= 0.9, s"inner→container containment was $cAb")
    assert(cBa < Dedup.containmentThreshold,
      s"container→inner must stay below threshold, was $cBa")
    assert(out.keys.forall { case (a, b) => a != 20L && b != 20L })
  }

  test("identical documents read 1.0 in both directions") {
    val t = "same exact text in two documents that should fully " +
      "contain each other in both directions of the measure"
    val dir = writeDocs(Seq((0L, t), (10L, t)))
    val out = Dedup.containmentPairs(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("c_ab") === 1.0)
    assert(out.head.getAs[Double]("c_ba") === 1.0)
  }
}
