package graft

import graft.operators.Similarity

/** IVF index shape: the √N cell-count rule and Lloyd training must
  * produce balanced cells at more than one corpus size — the property
  * that keeps per-query probe cost O(nprobe·√N) as the corpus grows
  * (a skewed or collapsed cell layout would quietly degrade toward a
  * full scan at exactly the scale where it matters).
  */
class IvfSpec extends SparkSpec {

  test("cell count follows ⌈√N⌉ with the driver-artifact cap") {
    assert(Similarity.ivfCellCount(500L) === 23)
    assert(Similarity.ivfCellCount(2000L) === 45)
    assert(Similarity.ivfCellCount(1000000L) === 1000)
    assert(Similarity.ivfCellCount(Long.MaxValue) === Similarity.ivfMaxCells)
  }

  // two corpus sizes: sf0.001 (N=500, k=23) and sf0.1 (N=2000, k=45)
  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1").foreach { dir =>
    test(s"trained cells are balanced at $dir") {
      val n = Tables(spark, dir, "embeddings").count()
      val k = Similarity.ivfCellCount(n)
      val hist = Similarity.ivfAssignments(spark, dir)
        .groupBy("cell").count().collect().map(_.getLong(1))
      val mean = n.toDouble / k
      assert(hist.length === k, s"expected $k non-empty cells, got ${hist.length}")
      assert(hist.sum === n)
      assert(hist.max <= 2 * mean,
        s"largest cell ${hist.max} exceeds 2× the mean $mean")
      assert(hist.min >= mean / 4,
        s"smallest cell ${hist.min} below mean/4 ($mean)")
    }
  }

  test("production plain-avg training matches the ordered-fold path") {
    val dir = "/root/testdata/sf0.001"
    val oracle = Similarity.trainedCentroids(spark, dir).toMap
    val prod = Similarity.trainCentroidsProd(spark, dir).toMap
    // same surviving cells, same dims, elementwise agreement within
    // float-reassociation tolerance (the two paths differ only in
    // double summation order)
    assert(prod.keySet === oracle.keySet)
    prod.foreach { case (cid, p) =>
      val o = oracle(cid)
      assert(p.length === o.length)
      p.zip(o).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"cell $cid diverged: $a vs $b")
      }
    }
    // the production assignment (what ann_ivf_assign_prod benches)
    // lands every vector in the same cell as the certified index
    val certified = Similarity.ivfAssignments(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val prodAsg = Similarity.ivfAssignProd(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prodAsg === certified)
    // and the production MEAN-UPDATE plan carries no per-member fold:
    // its only collect_list is the per-cell dim assembly (bounded by
    // dimensionality), so aggregation state is O(1) per (cell, dim)
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("nrm", org.apache.spark.sql.functions.expr(
        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, b) -> a + b))"))
    import spark.implicits._
    val cents = oracle.toSeq.toDF("c_id", "c_emb")
    val meansPlan = Similarity.cellMeansProd(
      Similarity.assignCells(emb, cents))
      .queryExecution.optimizedPlan.toString
    assert(!meansPlan.contains("collect_list(struct(vec_id"),
      "production mean update must not collect per-member lists")
    assert(meansPlan.contains("avg("),
      "production mean update is a plain avg aggregate")
  }

  test("nprobe=2 recall strictly improves on nprobe=1 at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def recall(np: Int): Double =
      Similarity.ivfRecall(spark, dir, np).collect()(0).getDouble(2)
    val np1 = recall(1)
    val np2 = recall(2)
    assert(np2 > np1, s"nprobe=2 recall $np2 not above nprobe=1 $np1")
  }

  test("semantic dedup: dup pointers are earlier, same-cell, above threshold") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val sd = Similarity.semanticDedup(spark, dir)
    val rows = sd.collect()
    // flag ↔ pointer consistency, pointer strictly earlier
    assert(rows.forall { r =>
      r.getBoolean(3) === !r.isNullAt(2) &&
        (r.isNullAt(2) || r.getLong(2) < r.getLong(0))
    })
    val nDup = rows.count(_.getBoolean(3))
    assert(nDup > 0 && nDup < rows.length,
      s"degenerate dedup: $nDup of ${rows.length} marked dup")
    // every (dup_of, vec_id) pair really is same-cell and cos ≥ τ
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    def side(p: String) = emb
      .select(col("vec_id").as(s"${p}_vid"), col("embedding").as(s"${p}_e"))
    val asg = Similarity.ivfAssignments(spark, dir)
    def cellOf(p: String) = asg
      .select(col("vec_id").as(s"${p}_vid"), col("cell").as(s"${p}_cell"))
    val checked = sd.filter(col("is_semantic_dup"))
      .join(side("v"), col("vec_id") === col("v_vid"))
      .join(side("d"), col("dup_of") === col("d_vid"))
      .join(cellOf("vc"), col("vec_id") === col("vc_vid"))
      .join(cellOf("dc"), col("dup_of") === col("dc_vid"))
      .select(
        (col("vc_cell") === col("dc_cell")).as("same_cell"),
        (round(graft.functions.DotProductD(col("v_e"), col("d_e")) /
          (sqrt(graft.functions.DotProductD(col("v_e"), col("v_e"))) *
           sqrt(graft.functions.DotProductD(col("d_e"), col("d_e")))), 4)
          >= Similarity.semanticDupTau).as("above_tau"))
      .collect()
    assert(checked.nonEmpty)
    assert(checked.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }
}
