package graft

import graft.operators.Dedup

/** Blocking-quality evaluation (Christen pairs-completeness +
  * reduction ratio): the report row must be the literal composition of
  * its two certified inputs — recompute every number from the
  * collected truth (exact τ-Jaccard pairs) and candidate (wide-LSH)
  * sets and assert exact agreement, plus the report's invariants.
  */
class BlockingEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("metrics replay exactly from the collected truth and candidate sets") {
    val row = Dedup.blockingEval(spark, dir).head()
    val truth = Dedup.prefixJaccardJoin(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.lshWideCandidatePairs(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = Tables(spark, dir, "documents").count()
    val caught = truth.intersect(cand)
    assert(row.getAs[Long]("n_docs") === nDocs)
    assert(row.getAs[Long]("n_truth") === truth.size.toLong)
    assert(row.getAs[Long]("n_candidates") === cand.size.toLong)
    assert(row.getAs[Long]("n_caught") === caught.size.toLong)
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("pairs_completeness") ===
      round6(caught.size.toDouble / truth.size))
    assert(row.getAs[Double]("reduction_ratio") ===
      round6(1.0 - 2.0 * cand.size / (nDocs.toDouble * (nDocs - 1.0))))
    // invariants: caught is bounded by both sets; the blocker must
    // actually block (ratio near 1 on any sane banding), and the
    // report is honest about what banding misses (completeness <= 1)
    assert(caught.size <= math.min(truth.size, cand.size))
    assert(row.getAs[Double]("reduction_ratio") > 0.9)
    val pc = row.getAs[Double]("pairs_completeness")
    assert(pc >= 0.0 && pc <= 1.0)
  }

  test("geometry sweep: 16x4 row equals the single eval; lever is monotone") {
    val rows = Dedup.blockingEvalSweep(spark, dir).collect()
      .map(r => r.getAs[Long]("n_bands") -> r).toMap
    assert(rows.keySet ===
      Dedup.blockingSweepGeometries.map(_._1.toLong).toSet)
    // the shipped geometry's sweep row is the certified blockingEval
    // row bit for bit (same sigs, same banding, same truth)
    val single = Dedup.blockingEval(spark, dir).head()
    val g16 = rows(16L)
    Seq("n_docs", "n_truth", "n_candidates", "n_caught").foreach(c =>
      assert(g16.getAs[Long](c) === single.getAs[Long](c), c))
    Seq("pairs_completeness", "reduction_ratio").foreach(c =>
      assert(g16.getAs[Double](c) === single.getAs[Double](c), c))
    // thresholds are the documented constants
    assert(g16.getAs[Double]("t_threshold") === 0.5)
    assert(rows(8L).getAs[Double]("t_threshold") === 0.7711)
    assert(rows(32L).getAs[Double]("t_threshold") === 0.1768)
    // the lever: more bands of fewer rows never catches FEWER truth
    // pairs and never generates fewer candidates (threshold drops)
    assert(rows(16L).getAs[Long]("n_caught") >=
      rows(8L).getAs[Long]("n_caught"))
    assert(rows(32L).getAs[Long]("n_caught") >=
      rows(16L).getAs[Long]("n_caught"))
    assert(rows(16L).getAs[Long]("n_candidates") >=
      rows(8L).getAs[Long]("n_candidates"))
    assert(rows(32L).getAs[Long]("n_candidates") >=
      rows(16L).getAs[Long]("n_candidates"))
    // and it costs: reduction ratio falls as the threshold loosens
    assert(rows(32L).getAs[Double]("reduction_ratio") <=
      rows(16L).getAs[Double]("reduction_ratio"))
  }

  test("minhash estimator audit: planted pairs pin the estimate's honesty") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.functions._
    val base = "the quarterly report shows revenue growing in every " +
      "region with margins holding steady across the product lines " +
      "while the operations team keeps shipping on schedule"
    val docs = Seq(
      0L -> base, // identical pair 0/1: jaccard 1, agreement 64/64
      1L -> base,
      2L -> (base + " plus one extra trailing clause about logistics"),
      3L -> ("nothing in common with the others kernel fusion " +
        "benchmarks on accelerator clusters with tiled matrix layouts"))
    val dir = java.nio.file.Files.createTempDirectory("mhest").toString
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val out = Dedup.minhashEstimatorAudit(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r).toMap
    // the identical pair MUST surface: identical texts collide in
    // every band; its estimate and truth are both exactly 1
    val ident = out((0L, 1L))
    assert(ident.getAs[Long]("n_agree") === Dedup.wideNumHashes.toLong)
    assert(ident.getAs[Double]("est_jaccard") === 1.0)
    assert(ident.getAs[Double]("exact_jaccard") === 1.0)
    assert(ident.getAs[Double]("abs_err") === 0.0)
    // every surfaced pair: est = n_agree/k exactly, err consistent,
    // and the k=64 estimator concentrates (|err| within 4 sigma)
    out.values.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("exact_jaccard")
      assert(est === r.getAs[Long]("n_agree").toDouble / Dedup.wideNumHashes)
      assert(r.getAs[Double]("abs_err") ===
        BigDecimal(math.abs(est - ex)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      val sigma = math.sqrt(ex * (1 - ex) / Dedup.wideNumHashes)
      assert(math.abs(est - ex) <= 4 * sigma + 1e-9,
        s"pair ${r.getAs[Long]("a_id")}/${r.getAs[Long]("b_id")}: " +
          s"est=$est exact=$ex")
    }
    // the unrelated doc never pairs
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }
}
