package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The hot-gram failure mode `text_novelty` is shaped against: one
  * 8-gram recurring across half the corpus (boilerplate headers).
  * The round-9 formulation joined the corpus-sized gram table back
  * onto the per-gram firsts — every occurrence of the hot gram on ONE
  * reducer, with AQE skew-splitting structurally unable to help (its
  * rule needs both join children to be bare shuffle stages; the fused
  * aggregate wasn't). The current formulation has no gram-keyed join
  * at all: n_novel is a count over the firsts table keyed by
  * first_doc, and the hot gram is absorbed by map-side partial
  * aggregation. This spec plants exactly that corpus and pins both
  * the exact numbers and the plan shape.
  */
class NoveltySkewSpec extends SparkSpec {

  /** Independent reference: distinct 8-gram windows per doc, first
    * corpus occurrence per gram, novel fraction rounded at 6.
    */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    val grams = docs.map { case (id, t) =>
      id -> (if (t.length < 8) Set.empty[String] else t.sliding(8).toSet)
    }.filter(_._2.nonEmpty)
    val firsts = grams.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    grams.map { case (id, gs) =>
      val novel = gs.count(g => firsts(g) == id).toLong
      id -> ((gs.size.toLong, novel,
        BigDecimal(novel.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
  }

  test("planted hot gram: rows stay exact; no gram-keyed join, combine absorbs the hot key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("novelty-skew").toString
    val hot = "ZZZZZZZZ" // one 8-gram planted in 50% of the corpus
    val docs = (0L until 1000L).map { id =>
      val text =
        if (id % 2 == 0) hot // hot docs: exactly the planted gram
        else s"q${id}x${id * 7919}y${id * 104729}z" // unique filler grams
      id -> text
    }
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.noveltyScores(spark, dir)
    val rows = out.collect()
    val expect = reference(docs)
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val got = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
        r.getAs[Double]("novelty"))
      assert(got === expect(id), s"doc $id")
    }
    // doc 0 owns the hot gram; every other even doc has zero novelty
    assert(rows.find(_.getLong(0) === 0L).get.getAs[Double]("novelty") === 1.0)
    assert(rows.find(_.getLong(0) === 2L).get.getAs[Double]("novelty") === 0.0)
    val plan = out.queryExecution.executedPlan.toString
    // the firsts aggregate must partial-combine map-side (this is what
    // absorbs the hot key: each mapper emits ONE row per gram)...
    assert(plan.contains("partial_min"),
      s"expected map-side combine on the gram aggregate:\n$plan")
    // ...and no join may key on the gram — the skew-exposed shape
    assert(!plan.contains("Join [g#") && !plan.contains("Join [g,"),
      s"gram-keyed join must not reappear:\n$plan")
  }
}
