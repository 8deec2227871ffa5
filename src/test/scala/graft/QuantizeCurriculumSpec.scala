package graft

import graft.operators.{Quantize, Sampling}
import org.apache.spark.sql.functions._

/** Semantic properties behind the `emb_int8_quant` and `q_curriculum`
  * oracle hashes: quantization code bounds and error envelopes
  * (including planted exact and degenerate vectors), and the
  * curriculum cut's balance/monotonicity guarantees.
  */
class QuantizeCurriculumSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("int8 codes are bounded and errors sit inside the trunc envelope") {
    val a = Quantize.int8Audit(spark, dir)
    val n = Tables(spark, dir, "embeddings").count()
    assert(a.count() === n)
    // symmetric int8: |q_i| <= 127 always (trunc of x*127/maxabs)
    assert(a.filter(col("min_q") < -127 || col("max_q") > 127).count() === 0L)
    // at least one element hits the scale endpoint: the element at
    // maxabs quantizes to exactly +-127
    assert(a.filter(col("max_q") =!= 127 && col("min_q") =!= -127)
      .count() === 0L)
    // truncation error envelope: per element |err| < c = maxabs/127,
    // so the squared sum over dim d is < d*c^2 (and never negative)
    val d = Tables(spark, dir, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    assert(a.filter(col("recon_err") < -1e-6).count() === 0L)
    assert(a.filter(col("recon_err") >
      lit(d) * (col("maxabs") / 127d) * (col("maxabs") / 127d) + 1e-6)
      .count() === 0L)
  }

  test("int8 planted vectors: exact grid points are lossless, zero vector is safe") {
    import spark.implicits._
    // grid vector: elements k*maxabs/127 for integer k quantize with
    // ZERO error (127/maxabs * x lands exactly on integers because
    // maxabs = 127 * unit here, so x*127/maxabs = x/unit is integral)
    val unit = 0.25f
    val grid = Array[Float](127 * unit, -127 * unit, 64 * unit, 0f,
      -32 * unit, 1 * unit, -1 * unit, 16 * unit)
    val zero = Array.fill(8)(0f)
    val plain = Array[Float](0.3f, -0.7f, 0.11f, 0.94f, -0.27f, 0.5f,
      -0.01f, 0.08f)
    val out = Quantize.int8AuditOf(
      Seq((1L, grid), (2L, zero), (3L, plain))
        .toDF("vec_id", "embedding"))
      .orderBy("vec_id").collect()
    val g = out(0)
    assert(g.getDouble(g.fieldIndex("recon_err")) === 0.0)
    assert(g.getLong(g.fieldIndex("sum_q")) === (127L - 127 + 64 + 0 - 32 + 1 - 1 + 16))
    val z = out(1)
    assert(z.getDouble(z.fieldIndex("maxabs")) === 0.0)
    assert(z.getLong(z.fieldIndex("sum_q")) === 0L)
    assert(z.getDouble(z.fieldIndex("recon_err")) === 0.0)
    val p = out(2)
    assert(p.getDouble(p.fieldIndex("recon_err")) >= 0.0)
    assert(p.getLong(p.fieldIndex("max_q")) === 127L)
  }

  test("int8 kernel tri-parity: native == composed HOF == SQL, and codegen plan") {
    // the fused Int8QuantStats kernel must be bit-identical to the
    // composed transform/aggregate/DotProductD reference on every
    // corpus row (same IEEE ops in the same order), and reachable as
    // a SQL function — the kernel discipline every graft native
    // expression follows
    val vecs = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val native = Quantize.int8AuditOf(vecs)
    val composed = Quantize.int8AuditComposed(vecs)
    assert(native.exceptAll(composed).count() === 0L)
    assert(composed.exceptAll(native).count() === 0L)
    graft.functions.GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("int8_vecs")
    val viaSql = spark.sql(
      """SELECT vec_id, s.maxabs AS maxabs, s.sum_q AS sum_q,
        |  s.min_q AS min_q, s.max_q AS max_q,
        |  round(s.recon_err, 6) AS recon_err
        |FROM (SELECT vec_id, int8_quant_stats(embedding) AS s
        |      FROM int8_vecs)""".stripMargin)
    assert(viaSql.exceptAll(native).count() === 0L)
    // the registered query's plan runs the native kernel, not lambdas
    val p = Quantize.int8Audit(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("int8_quant_stats"), s"expected native kernel:\n$p")
    assert(!p.toLowerCase.contains("lambdafunction"),
      s"no interpreted lambda in the audit path:\n$p")
  }

  test("int8 audit: streaming serve matches the batch audit per row") {
    // the audit is a stateless narrow projection, so it must run
    // unchanged over an arriving stream — the train-batch/serve-stream
    // split discipline (classifier / DSIR / SRP / BPE precedent)
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val vecs = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val in = MemoryStream[(Long, Array[Float])]
    val q = Quantize.int8AuditOf(in.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("append").format("memory")
      .queryName("int8_stream").start()
    try {
      val (w1, w2) = vecs.splitAt(vecs.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val streamed = spark.table("int8_stream")
      val batch = Quantize.int8Audit(spark, dir)
      assert(streamed.count() === vecs.length.toLong)
      assert(streamed.exceptAll(batch).count() === 0L)
      assert(batch.exceptAll(streamed).count() === 0L)
    } finally q.stop()
  }

  test("zipf coverage: monotone, bounded, consistent with exact recounts") {
    val z = operators.TextAnalysis.zipfCoverage(spark, dir)
      .orderBy("k").collect()
    assert(z.map(_.getLong(0)).toSeq === operators.TextAnalysis.zipfCutoffs)
    val vocab = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .agg(countDistinct("w"), count(lit(1))).head()
    val (nVocab, totalOcc) = (vocab.getLong(0), vocab.getLong(1))
    z.foreach { r =>
      val (k, nTypes, covered, total, cov) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nTypes === math.min(k, nVocab))
      assert(total === totalOcc)
      assert(covered <= total && cov >= 0.0 && cov <= 1.0)
    }
    // more types can only cover more occurrences; full vocab covers all
    z.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(2))
      case _ =>
    }
    if (nVocab <= z.last.getLong(0))
      assert(z.last.getLong(2) === totalOcc)
  }

  test("curriculum: balanced equal-size phases, quality-monotone") {
    val c = Sampling.curriculumSchedule(spark, dir)
    val n = Tables(spark, dir, "documents").count()
    assert(c.count() === n)
    // rank is the 1..N permutation
    assert(c.agg(countDistinct("rank")).head().getLong(0) === n)
    assert(c.agg(min("rank"), max("rank")).head() match {
      case r => r.getLong(0) == 1L && r.getLong(1) == n
    })
    // phases are 1..K and equal-size to within 1 (the div cut)
    val sizes = c.groupBy("phase").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (1L to Sampling.curriculumPhaseCount).toSet)
    assert(sizes.values.max - sizes.values.min <= 1L)
    // score never increases as rank increases (quality-ordered):
    // check every adjacent rank pair via a self-join (no global window
    // — the same ban the operators live under)
    val nxt = c.select((col("rank") - 1).as("rank"), col("score").as("s2"))
    assert(c.join(nxt, "rank").filter(col("s2") > col("score")).count() === 0L)
    val byPhase = c.groupBy("phase")
      .agg(min("rank").as("lo"), max("rank").as("hi"))
      .orderBy("phase").collect()
    byPhase.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
      case _ =>
    }
  }

  /** Planted matryoshka corpus: the signal lives entirely in the first
    * [[Quantize.mrlDim]] dims (tail zeroed), so prefix-cosine and
    * full-cosine rank IDENTICALLY and the overlap audit must read 1.0.
    */
  private def plantedMrlDir(): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mrl").toString
    val rows = (0L until 40L).map { i =>
      val head = Array.tabulate(Quantize.mrlDim)(j =>
        math.sin(i * 31 + j * 7).toFloat)
      (i, head ++ Array.fill(64 - Quantize.mrlDim)(0f), i.toInt % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("mrl: zero-tail corpus makes prefix ranking exact — overlap 1.0") {
    val dir = plantedMrlDir()
    val row = Quantize.mrlOverlap(spark, dir).collect().head
    assert(row.getAs[String]("method") === s"mrl${Quantize.mrlDim}")
    assert(row.getAs[Long]("n_queries") === 8L) // 40 ids, 1-in-5 sample
    assert(row.getAs[Double]("mean_overlap") === 1.0)
  }

  test("mrl topk: matches a JVM brute force over sliced vectors") {
    val dir = plantedMrlDir()
    val vecs = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).take(Quantize.mrlDim).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Quantize.mrlTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val expect = vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(3)
      val inRank = rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(inRank === expect, s"query $q top-3")
    }
  }

  test("dim variance: JVM parity, shares sum to 1, cumulative is monotone") {
    val rows = Quantize.dimVariance(spark, dir).collect()
    assert(rows.length === Quantize.embeddingDim)
    // cumulative share ends at exactly 1 and never decreases
    assert(rows.last.getAs[Double]("cum_share") === 1.0)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("cum_share") >= a.getAs[Double]("cum_share"))
      case _ =>
    }
    assert(math.abs(rows.map(_.getAs[Double]("var_share")).sum - 1.0) < 1e-4)
    // dim-0 variance against a direct recomputation
    val xs = Tables(spark, dir, "embeddings").collect()
      .map(_.getSeq[Float](1).head.toDouble)
    val n = xs.length
    val (s, ss) = (xs.sum, xs.map(x => x * x).sum)
    val expect = BigDecimal((ss - s * (s / n)) / (n - 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.head.getAs[Double]("variance") - expect) < 1e-5)
  }

  test("label separation: planted separable classes read separation >> 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def vec(center: Int): Array[Float] =
      Array.tabulate(64)(d =>
        (if (d == center) 10f else 0f) + rnd.nextFloat() * 0.1f)
    val rows = (0 until 30).map(i => (i.toLong, vec(0), 0)) ++
      (30 until 60).map(i => (i.toLong, vec(1), 1))
    val d = java.nio.file.Files.createTempDirectory("sep").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Quantize.labelSeparation(spark, d).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getInt(0), r.getInt(1)) === ((0, 1)))
    assert(r.getAs[Long]("n_a") === 30L && r.getAs[Long]("n_b") === 30L)
    // centroids ~(10,0,..) vs (0,10,..): distance ~ sqrt(200) = 14.14
    assert(math.abs(r.getAs[Double]("centroid_dist") - math.sqrt(200)) < 0.5)
    // intra spread is the 0.1-amplitude noise — far below the gap
    assert(r.getAs[Double]("separation") > 10)
  }

  test("centroid drift: a planted shift in one dimension is localized and sized") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("drift").toString
    // even ids (old half) at the origin, odd ids (new half) shifted
    // +1.0 in dim 3 only — expect centroid_dist = max_dim_drift = 1.0
    val rows = (0L until 40L).map { i =>
      val v = Array.fill(64)(0.5f)
      if (i % 2 == 1) v(3) = 1.5f
      (i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Quantize.centroidDrift(spark, d).collect().head
    assert(r.getAs[Long]("n_old") === 20L && r.getAs[Long]("n_new") === 20L)
    assert(r.getAs[Double]("centroid_dist") === 1.0)
    assert(r.getAs[Double]("max_dim_drift") === 1.0)
  }

  test("mrl at sf0.001: overlap bounded and honest on noise-like vectors") {
    val row = Quantize.mrlOverlap(spark, "/root/testdata/sf0.001")
      .collect().head
    val ov = row.getAs[Double]("mean_overlap")
    assert(ov >= 0.0 && ov <= 1.0)
    assert(row.getAs[Long]("n_queries") > 0)
  }
}
