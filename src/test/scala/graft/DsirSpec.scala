package graft

import graft.operators.{Dsir, Retrieval}
import org.apache.spark.sql.functions._

/** DSIR importance weights + RRF hybrid fusion: the semantic
  * properties the oracle hash can't localize — weight direction,
  * importance-sampling coverage, and fusion rank algebra.
  */
class DsirSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dsir: one row per document, token counts conserved") {
    val w = Dsir.weights(spark, dir)
    val docs = Tables(spark, dir, "documents")
    assert(w.count() === docs.count())
    val expected = docs
      .select(size(split(trim(col("text")), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(w.agg(sum("n_tokens")).head().getLong(0) === expected)
  }

  test("dsir: target-source documents average a higher weight than the rest") {
    val w = Dsir.weights(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "source"), "doc_id")
    val Array(tgt, rest) = w
      .groupBy(col("source").isInCollection(Dsir.targetSources).as("t"))
      .agg(avg("dsir_logw").as("m"))
      .orderBy(col("t").desc).collect().map(_.getDouble(1))
    // the estimator must, on average, prefer the domain it was aimed at
    assert(tgt > rest,
      s"target-avg $tgt should exceed non-target-avg $rest")
  }

  test("dsir: selected direction agrees with the sign of the weight") {
    val w = Dsir.weights(spark, dir)
    assert(w.filter(col("selected") =!= (col("dsir_logw") > 0)).count() === 0L)
  }

  test("dsir resample: positive-weight docs always accepted, acceptance " +
    "monotone in weight given the hash, deterministic under recompute") {
    val r1 = Dsir.resample(spark, dir)
    // p_accept = 1 exactly for every positively-weighted doc, and such
    // docs are always accepted (u28 < 2^28 strictly)
    assert(r1.filter(col("dsir_logw") > 0 && col("p_accept") =!= 1.0)
      .count() === 0L)
    assert(r1.filter(col("p_accept") === 1.0 && !col("accepted"))
      .count() === 0L)
    // acceptance test is the stated integer comparison
    assert(r1.filter(col("accepted") =!=
      (col("u28") * 1000000L <
        round(col("p_accept") * 1000000).cast("long") * 268435456L))
      .count() === 0L)
    // deterministic: a second run accepts the identical set
    val r2 = Dsir.resample(spark, dir)
    assert(r1.select("doc_id", "accepted")
      .exceptAll(r2.select("doc_id", "accepted")).count() === 0L)
    // both directions occur on this corpus
    val n = r1.count()
    val acc = r1.filter(col("accepted")).count()
    assert(acc > 0 && acc < n)
  }

  test("rrf: ranks are dense 1..top, every row carries at least one side") {
    val f = Retrieval.rrfFusion(spark, dir)
    val n = f.count()
    assert(n > 0 && n <= Retrieval.rrfTop)
    assert(f.agg(max("rank")).head().getLong(0) === n)
    assert(f.filter(col("r_dense").isNull && col("r_sparse").isNull)
      .count() === 0L)
    val depth = Retrieval.rrfDepth.toLong
    assert(f.filter(col("r_dense") > depth || col("r_sparse") > depth)
      .count() === 0L)
  }

  test("rrf: fused score is the reciprocal-rank sum and ordering is stable") {
    val f = Retrieval.rrfFusion(spark, dir).collect()
    val k = Retrieval.rrfK
    f.foreach { r =>
      val d = Option(r.get(2)).map(_.asInstanceOf[Long])
      val s = Option(r.get(3)).map(_.asInstanceOf[Long])
      val expect = d.map(x => 1.0 / (k + x)).getOrElse(0.0) +
        s.map(x => 1.0 / (k + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(4) - expect) < 1e-6)
    }
    // rrf non-increasing in rank order; ties broken by id ascending
    f.sliding(2).foreach {
      case Array(a, b) =>
        val (ra, rb) = (a.getDouble(4), b.getDouble(4))
        assert(ra > rb || (ra == rb && a.getLong(1) < b.getLong(1)))
      case _ =>
    }
  }

  test("rrf: a doc ranked top on both sides outranks one ranked on one side") {
    val f = Retrieval.rrfFusion(spark, dir)
    val both = f.filter(col("r_dense").isNotNull && col("r_sparse").isNotNull)
    val one = f.filter(col("r_dense").isNull || col("r_sparse").isNull)
    if (both.count() > 0 && one.count() > 0) {
      // not universally true of arbitrary ranks, but the best both-sides
      // doc must beat the worst single-side doc at equal depth
      val bestBoth = both.agg(min("rank")).head().getLong(0)
      val worstOne = one.agg(max("rank")).head().getLong(0)
      assert(bestBoth < worstOne)
    }
  }
}
