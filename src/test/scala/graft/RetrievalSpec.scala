package graft

import graft.operators.{Retrieval, TextAnalysis}

/** Full direct recomputation of the retrieval + repetition operators
  * at sf0.001 — every row compared against a from-scratch Scala
  * evaluation of the same definitions (oracle-independent: locks the
  * semantics, not just the DuckDB parity).
  */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Map[Long, Seq[String]] =
    Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ").toSeq).toMap

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25 matches a direct recomputation over every document") {
    val docs = corpus
    val n = docs.size
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / n
    val terms = Retrieval.bm25QueryTerms
    val df = terms.map(t => t -> docs.values.count(_.contains(t))).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.size
      val contribs = terms.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * (Retrieval.bm25K1 + 1.0)) /
          (tf + Retrieval.bm25K1 *
            (1.0 - Retrieval.bm25B + Retrieval.bm25B * dl / avgdl))
      }
      val nTerms = terms.count(toks.contains)
      if (nTerms == 0) None
      else Some(id -> ((nTerms.toLong, round4(contribs.sum))))
    }
    val got = Retrieval.bm25Scores(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }

  test("tfidf keywords: exact (tf desc, df asc, token) top-3 with scores") {
    val docs = corpus
    val n = docs.size
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expected = tf.flatMap { case (id, m) =>
      m.toSeq.sortBy { case (t, f) => (-f, df(t), t) }.take(3).zipWithIndex
        .map { case ((t, f), i) =>
          (id, i + 1L, t) -> ((f, round4(f * math.log(n.toDouble / df(t)))))
        }
    }
    val got = Retrieval.tfidfKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"key $k") }
  }

  test("nDCG: planted perfect ranking scores 1, inverted scores its exact value") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // rels in rank order for the planted system ranking; k=10 frame
    def dcgScala(rels: Seq[Int]): Double =
      rels.zipWithIndex.map { case (rel, i) =>
        ((1L << rel) - 1).toDouble * Retrieval.ndcgDiscounts(i)
      }.sum
    val rels = Seq(3, 3, 2, 2, 1, 1, 1, 0, 0, 0)
    def ranked(order: Seq[Int]) =
      order.zipWithIndex.map { case (rel, i) => (i + 1L, rel.toLong) }
        .toDF("rank", "rel")
    // perfect: system order == ideal order -> nDCG exactly 1
    val perfect = Retrieval.dcgOf(ranked(rels), "dcg").head().getDouble(0)
    val ideal = Retrieval.dcgOf(ranked(rels.sorted.reverse), "idcg")
      .head().getDouble(0)
    assert(perfect === ideal)
    assert(perfect === dcgScala(rels)) // the Scala twin agrees term-for-term
    // inverted: worst order of the same rels -> strictly below, exact
    val inverted = Retrieval.dcgOf(ranked(rels.sorted), "dcg")
      .head().getDouble(0)
    assert(inverted === dcgScala(rels.sorted))
    assert(inverted < perfect)
    // missing ranks (fewer than k candidates) contribute zero gain
    val partial = Retrieval.dcgOf(ranked(Seq(3, 2)), "dcg")
      .head().getDouble(0)
    assert(partial === dcgScala(Seq(3, 2)))
  }

  test("nDCG driver row: bounds hold and rel labels are the coverage counts") {
    val row = Retrieval.ndcgQuality(spark, dir).head()
    assert(row.getAs[Long]("k") === Retrieval.ndcgK.toLong)
    val n = row.getAs[Long]("n_candidates")
    assert(n > 0)
    val dcg = row.getAs[Double]("dcg")
    val idcg = row.getAs[Double]("idcg")
    val ndcg = row.getAs[Double]("ndcg")
    assert(idcg > 0.0 && dcg >= 0.0 && dcg <= idcg + 1e-9)
    assert(ndcg >= 0.0 && ndcg <= 1.0)
    // cross-check n_candidates against the bm25 row count
    assert(n === Retrieval.bm25Scores(spark, dir).count())
  }

  test("repetition signals match a direct recomputation") {
    val expected = corpus.collect { case (id, toks) if toks.size >= 2 =>
      val bigs = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bigs.groupBy(identity).view.mapValues(_.size).toMap
      id -> ((toks.size.toLong,
        toks.distinct.size.toDouble / toks.size,
        1.0 - counts.size.toDouble / bigs.size,
        counts.values.max.toDouble / bigs.size))
    }
    val got = TextAnalysis.repetitionSignals(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }
}
