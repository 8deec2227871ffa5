package graft
// (degree-histogram conservation test appended at the end of this spec)

import graft.operators.RandomProjection
import org.apache.spark.sql.functions._

/** Sign-random-projection LSH + JL two-stage search: internal
  * consistency properties a hash mismatch with the oracle would not
  * localize — signature determinism, band/pair algebra, the
  * no-false-negative direction of the exact verify, and the exactness
  * of the JL rerank stage.
  */
class RandomProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("weights are integer-valued, bounded, and stream-disjoint") {
    val srp = (0 until RandomProjection.srpBits).flatMap(RandomProjection.srpPlane)
    val jl = (0 until RandomProjection.jlDim).flatMap(RandomProjection.jlRow)
    (srp ++ jl).foreach { w =>
      assert(w == w.floor, "LCG weight must be integer-valued")
      assert(w >= -1024 && w <= 1023)
    }
    // not all weights one sign (a degenerate stream would make every
    // signature bit constant)
    assert(srp.exists(_ > 0) && srp.exists(_ < 0))
    assert(jl.exists(_ > 0) && jl.exists(_ < 0))
  }

  test("signatures: one row per vector, bands recompose the signature") {
    val sig = RandomProjection.signatures(spark, dir)
    val n = Tables(spark, dir, "embeddings").count()
    assert(sig.count() === n)
    val bad = sig.filter(
      col("band_lo") + shiftleft(col("band_hi"), RandomProjection.srpBandBits)
        =!= col("srp_sig")).count()
    assert(bad === 0L)
    val range = sig.agg(min("srp_sig"), max("srp_sig")).head()
    assert(range.getLong(0) >= 0L)
    assert(range.getLong(1) < (1L << RandomProjection.srpBits))
  }

  test("pairs: every reported pair collides in a band and clears tau") {
    val sigs = RandomProjection.signatures(spark, dir)
      .select(col("vec_id"), col("band_lo"), col("band_hi"))
    val pairs = RandomProjection.pairs(spark, dir)
    val joined = pairs
      .join(sigs.select(col("vec_id").as("a_id"), col("band_lo").as("alo"),
        col("band_hi").as("ahi")), "a_id")
      .join(sigs.select(col("vec_id").as("b_id"), col("band_lo").as("blo"),
        col("band_hi").as("bhi")), "b_id")
    assert(joined.filter(col("alo") =!= col("blo") &&
      col("ahi") =!= col("bhi")).count() === 0L)
    assert(pairs.filter(col("cos") < RandomProjection.srpTau).count() === 0L)
    assert(pairs.filter(col("a_id") >= col("b_id")).count() === 0L)
  }

  test("recall audit counts are consistent") {
    val r = RandomProjection.recall(spark, dir).head()
    val nTrue = r.getLong(1)
    assert(r.getString(0) === s"srp${RandomProjection.srpBits}x2")
    if (nTrue > 0) {
      val nCaught = r.getLong(2)
      assert(nCaught >= 0L && nCaught <= nTrue)
      assert(math.abs(r.getDouble(3) - nCaught.toDouble / nTrue) < 1e-3)
    }
  }

  test("JL two-stage top-k: reported cosines are the exact full-width " +
    "cosines (rerank stage is exact)") {
    import graft.functions.DotProductD
    val topk = RandomProjection.jlTopK(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(DotProductD(col("embedding"), col("embedding"))).as("nrm"))
    val recomputed = topk
      .join(emb.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("nrm").as("qn")), "q_id")
      .join(emb.select(col("vec_id"), col("embedding").as("ce"),
        col("nrm").as("cn")), "vec_id")
      .withColumn("expect",
        round(DotProductD(col("qe"), col("ce")) / (col("qn") * col("cn")), 4))
    assert(recomputed.filter(col("cos") =!= col("expect")).count() === 0L)
    // per query: at most k rows, ranks are 1..k without gaps
    val byQ = topk.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"))
    assert(byQ.filter(col("n") > 3 || col("mx") =!= col("n") ||
      col("mn") =!= 1L).count() === 0L)
  }

  test("incremental: new-batch vectors only, dup targets are existing, " +
    "verified candidates only") {
    val inc = RandomProjection.incremental(spark, dir)
    assert(inc.filter(col("vec_id") % 11 =!= 5).count() === 0L)
    assert(inc.filter(col("dup_of") % 11 === 5).count() === 0L,
      "a duplicate target must be an existing-corpus vector")
    assert(inc.filter(col("is_dup") =!= col("dup_of").isNotNull)
      .count() === 0L)
    val expected = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 11 === 5).count()
    assert(inc.count() === expected, "every new vector gets a verdict")
  }

  test("streaming signatures match the batch index per arriving vector") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val vecs = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = RandomProjection.streamingSignatures(
        in.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("append").format("memory")
      .queryName("srp_stream").start()
    try {
      val (w1, w2) = vecs.splitAt(vecs.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val streamed = spark.table("srp_stream")
      val batch = RandomProjection.signatures(spark, dir)
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0L,
        "per-row signature + band parity with the batch index")
    } finally q.stop()
  }

  test("JL recall is a valid fraction over the query sample") {
    val r = RandomProjection.jlRecall(spark, dir).head()
    assert(r.getString(0) === s"jl${RandomProjection.jlDim}")
    assert(r.getLong(1) > 0L)
    val rec = r.getDouble(2)
    assert(rec >= 0.0 && rec <= 1.0)
  }

  test("planted cos-0.98 pairs: banding recall matches Charikar analytics") {
    // the corpus recall row honestly reports ≈0 (no high-cosine pairs
    // exist in the synthetic data); THIS certifies the selling
    // property on pairs planted at a controlled angle. b is built as
    // cosT·â + sinT·û with û ⊥ â, so cos(a,b) = 0.98 exactly (up to
    // float storage). Analytics: per-bit agreement p = 1 − θ/π =
    // 0.9364, per-16-bit-band collision p¹⁶ = 0.349, ≥1-of-2-bands =
    // 1 − (1 − p¹⁶)² = 0.576.
    import spark.implicits._
    val dimN = RandomProjection.dim
    val nPairs = 400
    val cosT = 0.98
    val sinT = math.sqrt(1 - cosT * cosT)
    val rnd = new java.util.Random(20260814L)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val planted = (0 until nPairs).map { i =>
      val a = unit(Array.fill(dimN)(rnd.nextGaussian()))
      val r = Array.fill(dimN)(rnd.nextGaussian())
      val proj = a.zip(r).map { case (ai, ri) => ai * ri }.sum
      val u = unit(r.zip(a).map { case (ri, ai) => ri - proj * ai })
      val b = a.zip(u).map { case (ai, ui) => cosT * ai + sinT * ui }
      (i.toLong, a.map(_.toFloat), b.map(_.toFloat))
    }
    val aDf = planted.map { case (i, a, _) => (i, a) }.toDF("vec_id", "embedding")
    val bDf = planted.map { case (i, _, b) => (i, b) }.toDF("vec_id", "embedding")
    val sa = RandomProjection.streamingSignatures(aDf)
      .select(col("vec_id"), col("srp_sig").as("sig_a"),
        col("band_lo").as("lo_a"), col("band_hi").as("hi_a"))
    val sb = RandomProjection.streamingSignatures(bDf)
      .select(col("vec_id"), col("srp_sig").as("sig_b"),
        col("band_lo").as("lo_b"), col("band_hi").as("hi_b"))
    val joined = sa.join(sb, "vec_id")
      .select(
        (lit(RandomProjection.srpBits) - expr("bit_count(sig_a ^ sig_b)"))
          .cast("double").as("bits_agree"),
        (col("lo_a") === col("lo_b")).cast("long").as("lo_hit"),
        (col("hi_a") === col("hi_b")).cast("long").as("hi_hit"),
        (col("lo_a") === col("lo_b") || col("hi_a") === col("hi_b"))
          .cast("long").as("any_hit"))
      .agg(avg(col("bits_agree")).as("mean_agree"),
        avg(col("lo_hit")).as("p_lo"), avg(col("hi_hit")).as("p_hi"),
        avg(col("any_hit")).as("recall"))
      .head()
    val meanAgreeFrac = joined.getDouble(0) / RandomProjection.srpBits
    val (pLo, pHi, recall) =
      (joined.getDouble(1), joined.getDouble(2), joined.getDouble(3))
    // per-bit agreement: analytic 0.9364 (planes are fixed pseudo-
    // random, pairs independent — ±0.02 covers both noise sources)
    assert(math.abs(meanAgreeFrac - 0.9364) < 0.02,
      s"mean bit agreement $meanAgreeFrac vs analytic 0.9364")
    // per-band collision: analytic 0.349
    assert(pLo > 0.22 && pLo < 0.48, s"band-lo collision $pLo vs 0.349")
    assert(pHi > 0.22 && pHi < 0.48, s"band-hi collision $pHi vs 0.349")
    // >=1-band recall: analytic 0.576 — the property the operator sells
    assert(recall > 0.45 && recall < 0.70, s"recall $recall vs 0.576")
  }

  test("planted mismatched pairs: near-orthogonal collisions stay at the 2^-16 floor") {
    // negative control for the test above: pair each a_i with b_{i+1}
    // (independent vectors, cos ≈ N(0, 1/8)) — band collisions should
    // sit at the ~2·2^-16 background, certifying the banding's
    // selectivity side as measured, not assumed
    import spark.implicits._
    val dimN = RandomProjection.dim
    val n = 400
    val rnd = new java.util.Random(20260815L)
    val vecs = (0 until 2 * n).map { i =>
      (i.toLong, Array.fill(dimN)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val s = RandomProjection.streamingSignatures(vecs)
    val a = s.filter(col("vec_id") < n)
      .select(col("vec_id").as("i"), col("band_lo").as("lo_a"),
        col("band_hi").as("hi_a"))
    val b = s.filter(col("vec_id") >= n)
      .select((col("vec_id") - n).as("i"), col("band_lo").as("lo_b"),
        col("band_hi").as("hi_b"))
    val hits = a.join(b, "i")
      .filter(col("lo_a") === col("lo_b") || col("hi_a") === col("hi_b"))
      .count()
    assert(hits <= 4, s"$hits of $n near-orthogonal pairs collided — " +
      "banding has lost its selectivity")
  }

  test("degree histogram: conserves the corpus and the pair mass") {
    import org.apache.spark.sql.functions._
    val hist = RandomProjection.srpDegreeHistogram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // every vector appears in exactly one degree bucket
    assert(hist.map(_._2).sum ===
      Tables(spark, dir, "embeddings").count())
    // handshake: Σ degree·count = 2 × pairs
    val nPairs = RandomProjection.pairs(spark, dir).count()
    assert(hist.map { case (d, n) => d * n }.sum === 2 * nPairs)
    // buckets are unique and sorted
    assert(hist.map(_._1).toSeq === hist.map(_._1).toSeq.sorted)
    assert(hist.map(_._1).distinct.length === hist.length)
  }
}
