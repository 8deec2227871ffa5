package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Product-quantization invariants the hash oracle cannot isolate:
  * code-table shape, the argmin property of every assignment, training
  * determinism, and the re-rank theorem (exact re-scoring of a
  * shortlist containing the true neighbor always surfaces it).
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("codes: M rows per vector, every code a trained codebook id, deterministic") {
    val codes = Pq.pqCodes(spark, dir).cache()
    try {
      val n = Tables(spark, dir, "embeddings").count()
      assert(codes.count() === n * Pq.numSubspaces)
      val perVec = codes.groupBy("vec_id").count()
      assert(perVec.filter(col("count") =!= Pq.numSubspaces).isEmpty)
      // every (m, code) pair exists in the trained codebook
      val cb = Pq.trainedCodebook(spark, dir)
        .map { case (m, cid, _) => (m, cid) }.toSet
      val used = codes.select("m", "code").distinct().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(used.subsetOf(cb), "codes reference trained centroids only")
      assert(cb.size <= Pq.numSubspaces * Pq.codebookSize)
      // deterministic across a second evaluation
      val again = Pq.pqCodes(spark, dir)
      assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty)
    } finally codes.unpersist()
  }

  test("assignment is the argmin: qerr is minimal over the whole subspace codebook") {
    import spark.implicits._
    val cb = Pq.trainedCodebook(spark, dir).toDF("m", "c_id", "c_emb")
    val codes = Pq.pqCodes(spark, dir)
    // recompute the distance to EVERY codebook entry and take the min —
    // it must equal the stored qerr (same rounding, same tie rule)
    val emb = Tables(spark, dir, "embeddings")
    val subDim = expr(s"size(embedding) div ${Pq.numSubspaces}")
    val sub = emb.select(col("vec_id"),
        explode(array((0 until Pq.numSubspaces).map(m =>
          struct(lit(m).as("m"),
            slice(col("embedding"), (lit(m) * subDim + 1).cast("int"),
              subDim.cast("int")).as("sub"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sub").as("sub"))
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.DotProductD(a, b)
    val best = sub.join(broadcast(cb), "m")
      .withColumn("d2", round(dot(col("sub"), col("sub"))
        - lit(2.0) * dot(col("sub"), col("c_emb"))
        + dot(col("c_emb"), col("c_emb")), 4))
      .groupBy("vec_id", "m")
      .agg(min(col("d2")).as("min_d2"))
    val joined = codes.join(best, Seq("vec_id", "m"))
    assert(joined.filter(col("qerr") =!= col("min_d2")).isEmpty,
      "stored qerr equals the true minimum distance")
  }

  test("re-ranked recall never falls below raw ADC recall") {
    val r = Pq.pqRecall(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "pq")
    val (nQ, adc, rr) = (row.getLong(1), row.getDouble(2), row.getDouble(3))
    assert(nQ > 0)
    assert(adc >= 0.0 && adc <= 1.0 && rr >= 0.0 && rr <= 1.0)
    // theorem: if the true neighbor made the ADC top-3 it is in the
    // shortlist, and exact re-scoring ranks it #1 — so re-rank recall
    // can only add hits, never lose them
    assert(rr >= adc)
  }

  test("packed codes: one row per vector, M bytes each, dense ids below K") {
    val k = Pq.productionCodebookSize
    val packed = Pq.pqCodesPacked(spark, dir, k).collect()
    val n = Tables(spark, dir, "embeddings").count()
    assert(packed.length === n)
    packed.foreach { r =>
      val hexWord = r.getString(1)
      assert(hexWord.length === 2 * Pq.numSubspaces,
        s"vec ${r.getLong(0)}: ${hexWord.length} hex chars")
      val denseIds = hexWord.grouped(2).map(Integer.parseInt(_, 16)).toSeq
      assert(denseIds.forall(d => d >= 0 && d < k))
    }
  }

  test("packed-LUT ADC shortlist equals the SQL join-form shortlist row-exactly") {
    // same rounded doubles, same (adc, vec_id) tie rule — at BOTH the
    // default and production codebook widths
    for (k <- Seq(Pq.codebookSize, Pq.productionCodebookSize)) {
      val join = Pq.pqAdcJoin(spark, dir, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val packed = Pq.pqAdcPacked(spark, dir, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(packed === join, s"packed vs join shortlist diverged at K=$k")
    }
  }

  test("production build: scalar encode bit-matches assign; prod trainer tracks the certified one") {
    // 1) the mapPartitions encode emits EXACTLY the SQL assign's codes
    //    against the same (certified, ordered-fold-trained) codebook —
    //    bit-identical arithmetic and tie rule, both widths
    for (k <- Seq(Pq.codebookSize, Pq.productionCodebookSize)) {
      val cb = Pq.trainedCodebook(spark, dir, k)
      val emb = Tables(spark, dir, "embeddings")
      val sql = Pq.assign(Pq.subspaceRows(emb), Pq.codebookDf(spark, dir, k))
        .select("vec_id", "m", "code", "qerr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val scalar = Pq.encodeScalar(emb, cb)
        .select("vec_id", "m", "code", "qerr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(scalar === sql, s"scalar encode diverged from assign at K=$k")
    }
    // 2) the plain-avg production trainer lands on the same codebook
    //    within float-reassociation tolerance (summation order is the
    //    ONLY difference on the means path)
    val oracle = Pq.trainedCodebook(spark, dir, Pq.productionCodebookSize)
      .map { case (m, c, e) => (m, c) -> e }.toMap
    val prod = Pq.trainCodebookProd(spark, dir)
      .map { case (m, c, e) => (m, c) -> e }.toMap
    assert(prod.keySet === oracle.keySet)
    prod.foreach { case (key, p) =>
      val o = oracle(key)
      assert(p.length === o.length)
      p.zip(o).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"entry $key diverged: $a vs $b")
      }
    }
    // 3) end to end: the production build emits the same packed code
    //    table as the certified encode+pack path
    val certified = Pq.pqCodesPacked(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val prodPacked = Pq.pqBuildProd(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(prodPacked === certified)
  }

  test("ivf-pq composition: same theorem, cell-bounded candidate sets") {
    val r = graft.operators.IvfPq.ivfPqRecall(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "ivfpq")
    val (nQ, adc, rr) = (row.getLong(1), row.getDouble(2), row.getDouble(3))
    // the IVF rows' 1-in-5 sample
    val expectedQ = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 5 === 3).count()
    assert(nQ === expectedQ)
    assert(adc >= 0.0 && adc <= 1.0 && rr >= 0.0 && rr <= 1.0)
    assert(rr >= adc, "exact re-rank of the shortlist never loses a hit")
  }
}
