package graft

import graft.operators.Sketches

/** Count-min sketch invariants at sf0.001, checked against a direct
  * recomputation: the estimate never undercounts, equals the minimum
  * over the token's cells, and the overestimate respects the εN bound
  * with ε = e/w (deterministic data + fixed hash family, so the
  * "with high probability" bound is simply checkable).
  */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cms estimates: overestimate-only, exact min-of-cells, εN bound") {
    val rows = Sketches.cmsTokenCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)

    // direct recomputation of the sketch from the raw corpus
    val toks = Tables(spark, dir, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).trim.split(" ").toSeq)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def bucket(j: Int, tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((tok + s"#$j").getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Sketches.cmsWidth
    }
    val cells = toks
      .flatMap(t => (0 until Sketches.cmsDepth).map(j => (j, bucket(j, t))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val n = toks.size.toLong
    val epsN = math.E / Sketches.cmsWidth * n
    assert(rows.map(_._1).toSet === exact.keySet)
    rows.foreach { case (tok, exactN, est) =>
      assert(exactN === exact(tok), s"exact count for $tok")
      val expectedEst = (0 until Sketches.cmsDepth)
        .map(j => cells((j, bucket(j, tok)))).min
      assert(est === expectedEst, s"min-of-cells for $tok")
      assert(est >= exactN, s"CMS must never undercount ($tok)")
      assert(est - exactN <= epsN,
        s"overestimate ${est - exactN} above eN=$epsN for $tok")
    }
    // width 16 vs a wider vocabulary: collisions must actually occur
    // somewhere, or the test is vacuous
    assert(rows.exists { case (_, exactN, est) => est > exactN },
      "expected at least one colliding bucket at width 16")
  }

  /** JVM recomputation of one key's (register, ρ) — the reference the
    * distributed sketch must match bit-for-bit.
    */
  private def regRho(key: Long): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    val w = h & ((1L << Sketches.hllWordBits) - 1)
    val rho = if (w == 0) Sketches.hllWordBits + 1L
      else java.lang.Long.numberOfTrailingZeros(w) + 1L
    (h >> Sketches.hllWordBits, rho)
  }

  test("hll registers: bit-exact vs direct recomputation; all 64 present") {
    val keys = Tables(spark, dir, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    val expect = keys.map(regRho)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val got = Sketches.hllRegistersQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === Sketches.hllRegisters)
    assert(got.keySet === (0L until Sketches.hllRegisters.toLong).toSet)
    (0L until Sketches.hllRegisters.toLong).foreach { r =>
      assert(got(r) === expect.getOrElse(r, 0L), s"register $r")
    }
  }

  test("hll registers are mergeable: shard-wise MAX equals the whole") {
    // the 100-TB property: per-shard sketches union by register-wise
    // max — split the table by parity and merge
    val orders = Tables(spark, dir, "orders")
    import org.apache.spark.sql.functions._
    val a = Sketches.hllRegistersOf(
      orders.filter(col("o_orderkey") % 2 === 0), "o_custkey")
    val b = Sketches.hllRegistersOf(
      orders.filter(col("o_orderkey") % 2 === 1), "o_custkey")
    val merged = a.unionByName(b).groupBy("reg")
      .agg(max(col("max_rho")).as("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Sketches.hllRegistersOf(orders, "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("hll streaming registers equal the batch sketch on the same keys") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val keys = Tables(spark, dir, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    val in = MemoryStream[Long]
    val q = Sketches.streamingRegisters(in.toDF().toDF("k"), "k")
      .writeStream.outputMode("complete").format("memory")
      .queryName("hllregs").start()
    try {
      val (w1, w2) = keys.splitAt(keys.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val got = spark.table("hllregs").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = Sketches.hllRegistersOf(keys.toSeq.toDF("k"), "k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until Sketches.hllRegisters.toLong).foreach { r =>
        assert(got.getOrElse(r, 0L) === batch(r), s"register $r")
      }
    } finally q.stop()
  }

  test("daily hll: day sketches roll up by register-max to the global sketch") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.hllDailyUsers(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-day estimates stay inside a generous 4-sigma envelope where
    // the exact count is meaningful (small days are linear-counted)
    rows.filter(_.getAs[Long]("n_exact") >= 10).foreach { r =>
      assert(r.getAs[Double]("rel_err") < 4 * 1.04 / 8,
        s"day ${r.getLong(0)}: ${r.getAs[Double]("rel_err")}")
    }
    // union property across GROUPS: max over the per-day registers ==
    // the flat whole-table registers over the same keys
    val ev = Tables(spark, dir, "events")
      .select(expr("unix_micros(ts) div 86400000000L").as("day"),
        col("user_id"))
    val flat = Sketches.hllRegistersOf(
      ev.select(col("user_id").as("k")), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute daily registers via the public flat entry per day,
    // then merge
    val days = ev.select("day").distinct().collect().map(_.getLong(0))
    val merged = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    days.foreach { d =>
      Sketches.hllRegistersOf(
        ev.filter(col("day") === d).select(col("user_id").as("k")), "k")
        .collect().foreach { r =>
          merged(r.getLong(0)) = math.max(merged(r.getLong(0)), r.getLong(1))
        }
    }
    (0L until Sketches.hllRegisters.toLong).foreach { reg =>
      assert(merged(reg) === flat(reg), s"register $reg")
    }
  }

  test("cms streaming cells equal the batch cells on the same tokens") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val toks = Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text")), " ")).as("token"))
      .collect().map(_.getString(0))
    val in = MemoryStream[String]
    val q = Sketches.streamingCmsCells(in.toDF().toDF("token"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cmscells").start()
    try {
      val (w1, w2) = toks.splitAt(toks.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val got = spark.table("cmscells").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sketches.streamingCmsCells(toks.toSeq.toDF("token"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === batch)
      // linearity: total mass per row equals the token count
      (0 until Sketches.cmsDepth).foreach { j =>
        assert(got.collect { case ((r, _), c) if r == j => c }.sum ===
          toks.length.toLong)
      }
    } finally q.stop()
  }

  test("histogram quantiles: brackets the exact quantile; state is mergeable") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.histogramQuantiles(spark, dir).collect()
    assert(rows.length === Sketches.hqTargets.length)
    val cents = Tables(spark, dir, "orders")
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    rows.foreach { r =>
      val (qn, qd) = (r.getAs[Long]("q_num"), r.getAs[Long]("q_den"))
      val tRank = r.getAs[Long]("t_rank")
      assert(tRank === (qn * cents.length + qd - 1) / qd)
      // the exact order statistic at the target rank sits inside the
      // reported bucket
      val exact = cents(tRank.toInt - 1)
      assert(exact >= r.getAs[Long]("lo_cents") &&
        exact <= r.getAs[Long]("hi_cents"),
        s"q=$qn/$qd exact=$exact bucket=[${r.getAs[Long]("lo_cents")}," +
          s"${r.getAs[Long]("hi_cents")}]")
      assert(r.getAs[Long]("cum_le") >= tRank)
    }
    // mergeability: bucket-wise SUM of two parity shards' histograms
    // equals the whole histogram (the union rule a 1000-executor run
    // applies shard-wise)
    val orders = Tables(spark, dir, "orders")
    def histOf(df: org.apache.spark.sql.DataFrame) = df
      .select((length(bin(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
        - 1).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = histOf(orders.filter(col("o_orderkey") % 2 === 0))
    val b = histOf(orders.filter(col("o_orderkey") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === histOf(orders))
  }

  test("grouped hdr quantiles: every segment's bracket contains its exact rank") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.hdrQuantilesBySegment(spark, dir).collect()
    val bySeg = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .select(col("c_mktsegment"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 >= 1L)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.length === bySeg.size * Sketches.hqTargets.length)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val cents = bySeg(seg)
      val (qn, qd) = (r.getAs[Long]("q_num"), r.getAs[Long]("q_den"))
      val tRank = r.getAs[Long]("t_rank")
      assert(r.getAs[Long]("n_total") === cents.length.toLong)
      assert(tRank === (qn * cents.length + qd - 1) / qd)
      val exact = cents(tRank.toInt - 1)
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(exact >= lo && exact <= hi,
        s"$seg q=$qn/$qd exact=$exact [$lo,$hi]")
      assert(hi - lo + 1 <=
        math.max(1L, lo / (1L << (Sketches.hdrSubBits - 1))),
        s"$seg bracket [$lo,$hi] too wide")
    }
  }

  test("hdr quantiles: tight relative bracket; merge == recompute exactly") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.hdrQuantiles(spark, dir).collect()
    assert(rows.length === Sketches.hqTargets.length)
    val cents = Tables(spark, dir, "orders")
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0)).filter(_ >= 1L).sorted
    rows.foreach { r =>
      val (qn, qd) = (r.getAs[Long]("q_num"), r.getAs[Long]("q_den"))
      val tRank = r.getAs[Long]("t_rank")
      assert(tRank === (qn * cents.length + qd - 1) / qd)
      val exact = cents(tRank.toInt - 1)
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(exact >= lo && exact <= hi, s"q=$qn/$qd exact=$exact [$lo,$hi]")
      // the HDR guarantee the plain histogram row lacks: the bracket is
      // narrow RELATIVE to its own magnitude (1/2^subBits at e>subBits)
      assert(hi - lo + 1 <= math.max(1L, lo / (1L << (Sketches.hdrSubBits - 1))),
        s"bracket [$lo,$hi] too wide for 2^-${Sketches.hdrSubBits} rel err")
      assert(r.getAs[Long]("cum_le") >= tRank)
    }
    // merge == recompute is an IDENTITY for the log-linear cells:
    // bucket-wise sum of two parity shards equals the union's sketch
    // cell for cell — the t-digest property that fails is exact here
    val orders = Tables(spark, dir, "orders")
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.hdrCells(
          df.select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
            .filter(col("v") >= 1L), "v")
        .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("n")).toMap
    val a = cellsOf(orders.filter(col("o_orderkey") % 2 === 0))
    val b = cellsOf(orders.filter(col("o_orderkey") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === cellsOf(orders))
    // sub-buckets genuinely refine: more live cells than octaves
    val full = cellsOf(orders)
    assert(full.keySet.map(_ / (1L << Sketches.hdrSubBits)).size <
      full.size, "sub-bucketing must split octaves")
  }

  test("hll estimate: inside the 3-sigma error envelope of exact") {
    val row = Sketches.hllDistinct(spark, dir).collect().head
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("est_distinct")
    assert(exact > 0)
    // standard error 1.04/√64 = 13%; allow 3σ
    assert(math.abs(est - exact) / exact < 3 * 1.04 / 8,
      s"est=$est exact=$exact")
    assert(math.abs(row.getAs[Double]("rel_err") -
      math.abs(est - exact) / exact) < 1e-4)
  }

  test("running hll: exact prefix counts, monotone, final day equals the corpus") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.hllRunningUsers(spark, dir).collect()
    assert(rows.nonEmpty)
    // exact side recomputed independently from the raw (day, user) pairs
    val pairs = Tables(spark, dir, "events")
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { r =>
      val d = r.getLong(0)
      val want = pairs.filter(_._1 <= d).map(_._2).distinct.length.toLong
      assert(r.getLong(1) === want, s"day $d cumulative exact")
    }
    // cumulative counts never decrease; the last day covers everyone
    val exacts = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a <= b })
    assert(exacts.last === pairs.map(_._2).distinct.length.toLong)
    // estimates stay inside the 3σ envelope on every prefix
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(3)
      assert(math.abs(est - exact) / exact < 3 * 1.04 / 8,
        s"day ${r.getLong(0)}: est=$est exact=$exact")
    }
  }
}
