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
