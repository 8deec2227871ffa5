package graft

import org.apache.spark.sql.functions._

/** Certifies the column profiler against per-column direct aggregates
  * and the hard-negative miner against a definitional replay of the
  * centroid-distance arithmetic at sf0.001.
  */
class ProfilingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("column profile matches per-column direct aggregates") {
    val prof = operators.Profiling.columnProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val orders = Tables(spark, dir, "orders")
    val exprs = Map(
      "o_orderkey" -> col("o_orderkey").cast("string"),
      "o_custkey" -> col("o_custkey").cast("string"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_totalprice" -> col("o_totalprice").cast("string"),
      "o_orderdate" -> col("o_orderdate").cast("date").cast("string"),
      "o_orderpriority" -> col("o_orderpriority"))
    assert(prof.keySet === exprs.keySet)
    val n = orders.count()
    exprs.foreach { case (name, e) =>
      val d = orders.select(e.as("v"))
        .agg(sum(when(col("v").isNull, 1L).otherwise(0L)),
          countDistinct(col("v")), min(col("v")), max(col("v")))
        .head()
      val row = prof(name)
      assert(row.getAs[Long]("n_rows") === n, name)
      assert(row.getAs[Long]("n_null") === d.getLong(0), name)
      assert(row.getAs[Long]("n_distinct") === d.getLong(1), name)
      assert(row.getAs[String]("min_val") === d.getString(2), name)
      assert(row.getAs[String]("max_val") === d.getString(3), name)
    }
  }

  test("incremental profile merge equals the full recompute") {
    val inc = operators.Profiling.profileIncremental(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val full = operators.Profiling.columnProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(inc.keySet === full.keySet)
    full.foreach { case (name, f) =>
      val i = inc(name)
      // the mergeable scalars are slice-invariant: bit-equal to full
      assert(i.getAs[Long]("n_rows") === f.getAs[Long]("n_rows"), name)
      assert(i.getAs[Long]("n_null") === f.getAs[Long]("n_null"), name)
      assert(i.getAs[String]("min_val") === f.getAs[String]("min_val"), name)
      assert(i.getAs[String]("max_val") === f.getAs[String]("max_val"), name)
      // the honesty column is the full table's exact distinct
      assert(i.getAs[Long]("n_exact") === f.getAs[Long]("n_distinct"), name)
      // 64 registers: typical rel err ~13%; generous envelope, and the
      // estimate must be a positive finite number
      assert(i.getAs[Double]("distinct_est") > 0.0, name)
      assert(i.getAs[Double]("rel_err") < 0.6, name)
    }
  }

  test("hard negatives replay the definitional centroid arithmetic") {
    val rows = operators.Quantize.hardNegatives(spark, dir).collect()
    val embs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def round(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byLabel = embs.groupBy(_._2)
    val centroids = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(vs.head._3.length) { d =>
        round(vs.map(_._3(d)).sum / vs.length, 6)
      }
    }
    def dist(v: Array[Double], c: Array[Double]) =
      round(math.sqrt(v.zip(c).map { case (a, b) =>
        (a - b) * (a - b) }.sum), 4)
    assert(rows.length === embs.length)
    val rowsById = rows.map(r => r.getLong(0) -> r).toMap
    embs.foreach { case (id, label, v) =>
      val r = rowsById(id)
      val dOwn = dist(v, centroids(label))
      val others = centroids.toSeq.filter(_._1 != label)
        .map { case (l, c) => (dist(v, c), l) }
      val dOther = others.map(_._1).min
      // the unordered float sums inside the engine can differ from
      // this sequential replay by ulps before the round-4; compare at
      // the rounded grain with a one-ulp-of-grain slack, and accept
      // any label whose replay distance sits within that slack of the
      // replay minimum (a grain-tie can flip the argmin either way)
      assert(math.abs(r.getAs[Double]("d_own") - dOwn) < 2e-4, id)
      assert(math.abs(r.getAs[Double]("d_other") - dOther) < 2e-4, id)
      val nearTies = others.filter(_._1 <= dOther + 2e-4).map(_._2).toSet
      assert(nearTies.contains(r.getAs[Int]("other_label")), id)
      assert(math.abs(r.getAs[Double]("margin") -
        (r.getAs[Double]("d_other") - r.getAs[Double]("d_own"))) < 1e-9, id)
      assert(r.getAs[Boolean]("is_hard") ===
        (r.getAs[Double]("d_other") - r.getAs[Double]("d_own") <
          operators.Quantize.hardNegativeMargin), id)
    }
    // the statistic is only useful if both classes occur on this corpus
    assert(rows.exists(_.getAs[Boolean]("is_hard")))
    assert(rows.exists(!_.getAs[Boolean]("is_hard")))
  }

  test("streaming hard negatives hit batch parity per vector") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val centroids = operators.Quantize.labelCentroids(spark, dir)
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()

    val in = MemoryStream[(Long, Int, Seq[Float])]
    val q = operators.Quantize.streamingHardNegatives(
        in.toDF().toDF("vec_id", "label", "embedding"), centroids)
      .writeStream.outputMode("append").format("memory")
      .queryName("hardneg").start()
    try {
      val (w1, w2) = vecs.splitAt(vecs.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val got = spark.table("hardneg").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Double]("d_own"), r.getAs[Int]("other_label"),
            r.getAs[Double]("d_other"), r.getAs[Double]("margin"),
            r.getAs[Boolean]("is_hard"))).toMap
      val batch = operators.Quantize.hardNegatives(spark, dir).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Double]("d_own"), r.getAs[Int]("other_label"),
            r.getAs[Double]("d_other"), r.getAs[Double]("margin"),
            r.getAs[Boolean]("is_hard"))).toMap
      assert(got.size === batch.size)
      // the stream's ordered ascending-dim fold must be BIT-equal to
      // the batch aggregation's posexplode-order partials
      batch.foreach { case (id, b) =>
        assert(got(id) === b, s"vec $id")
      }
    } finally q.stop()
  }

  test("order gaps replay the per-customer (day, orderkey) total order") {
    val rows = operators.Analytics.orderGaps(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val orders = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = orders.groupBy(_._1)
    val multi = byCust.filter(_._2.length >= 2)
    assert(rows.keySet === multi.keySet)
    multi.foreach { case (ck, os) =>
      val seqd = os.sortBy(o => (o._3, o._2))
      // gap rows keyed by the LATER order's key (the lag convention)
      val gaps = seqd.sliding(2).map { case Array(a, b) =>
        (b._3 - a._3, b._2) }.toArray
      val r = rows(ck)
      assert(r.getAs[Long]("n_orders") === os.length.toLong, ck)
      assert(r.getAs[Long]("n_gaps") === gaps.length.toLong, ck)
      assert(r.getAs[Long]("min_gap") === gaps.map(_._1).min, ck)
      assert(r.getAs[Long]("max_gap") === gaps.map(_._1).max, ck)
      val sorted = gaps.sortBy(identity)
      assert(r.getAs[Long]("median_gap") ===
        sorted((gaps.length + 1) / 2 - 1)._1, ck)
      assert(math.abs(r.getAs[Double]("mean_gap") -
        gaps.map(_._1).sum.toDouble / gaps.length) < 5e-7, ck)
    }
  }

  test("mutual kNN edges are exactly the reciprocal bucket-local top-k") {
    val got = operators.Similarity.mutualKnnPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("cos"), r.getAs[Long]("rank_ab"),
          r.getAs[Long]("rank_ba"))).toMap
    val embs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def bucketOf(v: Array[Double]) =
      (0 until 6).map(j => if (v(j) > 0) 1 << j else 0).sum
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byBucket = embs.groupBy { case (_, v) => bucketOf(v) }
    val topk = embs.flatMap { case (id, v) =>
      val cands = byBucket(bucketOf(v)).filter(_._1 != id)
        .map { case (cid, cv) =>
          (round4(dot(v, cv) / (math.sqrt(dot(v, v)) *
            math.sqrt(dot(cv, cv)))), cid) }
        .sortBy { case (c, cid) => (-c, cid) }
        .take(operators.Similarity.mutualK).zipWithIndex
      cands.map { case ((c, cid), i) => (id, cid) -> (c, i.toLong + 1) }
    }.toMap
    val mutual = topk.keys.filter { case (a, b) =>
      a < b && topk.contains((b, a)) }.toSet
    assert(got.keySet === mutual)
    mutual.foreach { case (a, b) =>
      val (c, rab) = topk((a, b)); val (_, rba) = topk((b, a))
      assert(got((a, b)) === ((c, rab, rba)), s"($a,$b)")
    }
    assert(got.nonEmpty, "the sign buckets must yield reciprocal pairs")
  }

  test("kNN label accuracy replays the majority vote per label") {
    val got = operators.Similarity.knnLabelAccuracy(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_scored"),
        r.getAs[Long]("n_correct"), r.getAs[Double]("accuracy"))).toMap
    val labels = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the certified bucket-local top-k from the production operator
    val topk = operators.Similarity.bucketTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
    val preds = topk.groupBy(_._1).map { case (q, vs) =>
      val votes = vs.map(v => labels(v._2)).groupBy(identity)
        .view.mapValues(_.size).toMap
      val topN = votes.values.max
      q -> votes.filter(_._2 == topN).keys.min
    }
    val perLabel = preds.toSeq.groupBy { case (q, _) => labels(q) }
      .map { case (l, ps) =>
        l -> (ps.size.toLong, ps.count { case (q, p) => p == labels(q) }.toLong)
      }
    assert(got.keySet === perLabel.keySet)
    perLabel.foreach { case (l, (n, c)) =>
      val (gn, gc, acc) = got(l)
      assert(gn === n, l); assert(gc === c, l)
      assert(math.abs(acc - c.toDouble / n) < 5e-7, l)
    }
  }

  test("per-source KL replays the smoothed full-vocab fold") {
    val rows = operators.Sampling.sourceKlDrift(spark, dir).collect()
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (s, t) =>
      t.trim.split(" ").map(s -> _) }
    val corpus = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = corpus.size.toLong
    val tc = corpus.values.sum
    val bySource = toks.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === bySource.keySet)
    rows.foreach { r =>
      val s = r.getString(0)
      val st = bySource(s).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val ts = st.values.sum
      assert(r.getAs[Long]("n_docs") === docs.count(_._1 == s).toLong, s)
      assert(r.getAs[Long]("n_tokens") === ts, s)
      val kl = corpus.toSeq.sortBy(_._1).map { case (tok, cc) =>
        val p = (st.getOrElse(tok, 0L) + 1).toDouble / (ts + v)
        val q = (cc + 1).toDouble / (tc + v)
        p * math.log(p / q)
      }.sum
      assert(math.abs(r.getAs[Double]("kl_source_corpus") - kl) < 5e-6, s)
      assert(r.getAs[Double]("kl_source_corpus") >= 0.0, s)
    }
  }
}
