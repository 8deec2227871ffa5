package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic checks for the extension operators (value-level parity with
  * DuckDB is the driver gate; these assert the *properties* each
  * operator must hold).
  */
class ExtensionOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_exact: survivors are unique and keep the smallest doc_id") {
    val out = Dedup.exact(spark, dir)
    val n = out.count()
    assert(out.select("doc_id").distinct().count() === n)
    val total = Tables(spark, dir, "documents").count()
    assert(out.agg(sum("n_copies")).head().getLong(0) === total)
  }

  test("dup spans: a planted shared sentence is found in both docs; unique corpus is span-free") {
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val shared = "exact duplicated sentence planted here"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon", "en", "s"),
      (2L, s"zeta eta $shared theta iota kappa", "en", "s"),
      (3L, "a wholly different record with no repeats at all", "en", "s"))
    val tmp = java.nio.file.Files.createTempDirectory("dupspan").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val spans = Dedup.dupSpans(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the span cover in each doc contains the full planted sentence
    Seq(1L, 2L).foreach { id =>
      val text = docs.find(_._1 == id).get._2
      val expectStart = text.indexOf(shared) + 1 // 1-based
      val mine = spans.filter(_._1 == id)
      assert(mine.nonEmpty, s"doc $id has no span")
      assert(mine.exists { case (_, s, e, _, _) =>
        s <= expectStart && e >= expectStart + shared.length - 1
      }, s"doc $id span does not cover the planted sentence")
    }
    assert(!spans.exists(_._1 == 3L), "the unique doc must be span-free")
    // span removal: the planted sentence is gone, untouched docs pass
    // through, and removed-char counts reconcile with the span lengths
    val cleaned = Dedup.spanClean(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(cleaned.length === docs.length)
    cleaned.foreach { case (id, clean, removed) =>
      assert(!clean.contains(shared), s"doc $id still contains the planted span")
      val spanSum = spans.filter(_._1 == id).map(_._4).sum
      assert(removed === spanSum, s"doc $id removed $removed != span sum $spanSum")
      assert(clean.length === docs.find(_._1 == id).get._2.length - removed)
    }
    assert(cleaned.find(_._1 == 3L).get._2 ===
      docs.find(_._1 == 3L).get._2, "span-free doc must pass through verbatim")
    // invariants: spans ordered, non-overlapping, length >= k
    spans.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(ss.toSeq === sorted.toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3, "spans must not overlap")
        case _ =>
      }
      ss.foreach { case (_, s, e, len, nw) =>
        assert(len === e - s + 1)
        assert(len >= Dedup.dupSpanK.toLong)
        assert(nw >= 1L && nw <= len - Dedup.dupSpanK + 1)
      }
    }
  }

  test("minhash signatures: identical text ⇒ identical signature") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an utterly different string with other grams"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ignore") // not used; direct call below
    val grams = expr("transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))")
    val sig = docs.withColumn("g", grams)
      .select($"doc_id", array_min(transform($"g",
        g => md5(concat(lit("s0:"), g).cast("binary")))).as("h0"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("LSH pairs ⊇ identical-signature docs and are ordered a<b") {
    val pairs = Dedup.lshCandidatePairs(spark, dir).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("simhash: deterministic and uses the full 64-bit range") {
    val s1 = Dedup.simhash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val s2 = Dedup.simhash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.toSeq === s2.toSeq)
    // fingerprints must spread beyond any 16-bit subrange
    assert(s1.map(_._2).exists(h => h < 0 || h >= (1L << 32)),
      "no fingerprint used the high bits — still 16-bit?")
  }

  test("simhash pairs: zero missed pairs at Hamming ≤ 3 (banding recall guarantee)") {
    import spark.implicits._
    // Exact all-pairs Hamming scan (viable only at test scale) — the
    // 4×16-bit banding must find every pair the exact scan finds: ≤3
    // flips touch ≤3 bands, so one band is always intact (pigeonhole).
    val sh = Dedup.simhash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
    val banded = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === exact,
      s"missed: ${(exact -- banded).take(5)}; extra: ${(banded -- exact).take(5)}")
  }

  test("jaccard pairs are within (0,1]") {
    val j = Dedup.ngramJaccardPairs(spark, dir).collect()
    assert(j.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
  }

  test("brute-force ANN: k results per query, cos within [-1,1], self excluded") {
    val out = Similarity.bruteForceTopK(spark, dir)
    val perQ = out.groupBy("q_id").count().collect()
    assert(perQ.forall(_.getLong(1) === 5L))
    assert(out.filter(col("q_id") === col("vec_id")).count() === 0)
    assert(out.filter(col("cos") > 1.0 || col("cos") < -1.0).count() === 0)
  }

  test("bucketed ANN results are a subset of the same-bucket candidates and rank-1 ≤ brute-force rank-1 cos") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, dir)
      .filter($"rn" === 1).select($"q_id", $"cos".as("brute_cos"))
    val bucketed = Similarity.bucketedTopK(spark, dir)
      .filter($"rn" === 1).select($"q_id", $"cos".as("bucket_cos"))
    val joined = brute.join(bucketed, "q_id").collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getDouble(2) <= r.getDouble(1) + 1e-9))
  }

  test("trained IVF: rank-1 recall ≥ the untrained first-k stand-in") {
    // True nearest neighbor per sampled query (vec_id ≡ 3 mod 5) by
    // rounded cosine — same 4-decimal rounding + smallest-id tie rule
    // as the engine's topPerQuery ranking.
    val vecs = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val queries = vecs.keys.filter(_ % 5 == 3).toSeq.sorted
    val trueNN = queries.map { q =>
      q -> vecs.collect { case (id, v) if id != q => id -> cos(vecs(q), v) }
        .maxBy { case (id, c) => (c, -id) }._1
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      queries.count(q => got.getOrElse(q, Set.empty).contains(trueNN(q))).toDouble /
        queries.size
    }
    val trained = recall(Similarity.ivfTopK(spark, dir))
    val standin = recall(Similarity.ivfTopKStandin(spark, dir))
    assert(trained >= standin,
      s"trained recall $trained < stand-in recall $standin")
  }

  test("gopher rules: each constructed violation trips exactly its rule") {
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val good = (("the quick brown fox jumps with energy and " * 7) +
      "grace that we have seen of late").trim // ~50+ clean words
    val docs = Seq(
      (1L, good, "en", "s"),
      (2L, good + " " + Seq.fill(9)("###").mkString(" "), "en", "s"), // symbol-heavy
      (3L, (1 to 60).map(_ => "12345").mkString(" "), "en", "s"),     // no alpha, no stops
      (4L, (1 to 60).map(i => s"- bullet $i the of and that be with have to").mkString("\n"), "en", "s"),
      (5L, "too short to pass the word count gate", "en", "s"))
    val tmp = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.gopherRules(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(9), "the clean doc must pass all rules")
    assert(!out(2L).getBoolean(4) && !out(2L).getBoolean(9), "symbols must trip symbol_ok")
    assert(!out(3L).getBoolean(7) && !out(3L).getBoolean(8), "digit words trip alpha_ok and stop_ok")
    assert(!out(4L).getBoolean(5), "bullet lines trip bullet_ok")
    assert(!out(5L).getBoolean(2), "a short doc trips wordcount_ok")
  }

  test("quality scores: ratios in [0,1], avg token length positive") {
    val q = TextAnalysis.qualityScores(spark, dir).collect()
    assert(q.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
    assert(q.forall(r => r.getDouble(2) > 0))
  }

  test("fingerprints: token-order insensitive") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"))
      .toDF("doc_id", "text")
    val fp = docs.select(md5(array_join(array_sort(array_distinct(
      split(trim($"text"), " "))), " ").cast("binary")).as("f"))
      .collect().map(_.getString(0))
    assert(fp(0) === fp(1))
  }

  test("unigram NLL: nonnegative scores, per-lang buckets ordered head ≤ middle ≤ tail") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.unigramNll(spark, dir).collect()
    assert(rows.length === Tables(spark, dir, "documents").count())
    // p(token) ≤ 1 ⇒ every log-likelihood ≤ 0 ⇒ mean NLL ≥ 0
    assert(rows.forall(_.getAs[Double]("nll") >= 0.0))
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      def nlls(b: String) =
        rs.filter(_.getAs[String]("bucket") == b).map(_.getAs[Double]("nll"))
      val (h, m, t) = (nlls("head"), nlls("middle"), nlls("tail"))
      if (rs.length >= 3) {
        assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, s"$lang: empty tercile")
        assert(h.max <= m.min, s"$lang: head ${h.max} above middle ${m.min}")
        assert(m.max <= t.min, s"$lang: middle ${m.max} above tail ${t.min}")
      }
    }
  }

  test("multimodal: fallback featurizer preserves ids, fixed feature width, deterministic") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, dir)
      .as[Multimodal.MediaRow]
    val feats = Multimodal.decodeFeatures(media, dim = 8).collect()
    assert(feats.length === Tables(spark, dir, "documents").count())
    assert(feats.forall(_.features.length === 8))
    val byId = feats.map(f => f.media_id -> f.features.toSeq).toMap
    val again = Multimodal.decodeFeatures(media, dim = 8).collect()
    assert(again.forall(f => byId(f.media_id) === f.features.toSeq))
  }

  test("multimodal: resize keeps ids 1:1, stamps target dims, bounds payload") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
      .as[Multimodal.MediaRow](org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.resize(media, 64, 64).collect()
    assert(out.length === Tables(spark, dir, "documents").count())
    assert(out.forall(r => r.width === 64 && r.height === 64))
    assert(out.forall(_.content.length <= 64 * 64 / 64))
  }

  test("multimodal: fixture frame sampler explodes 1→N with monotone timestamps") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
      .as[Multimodal.MediaRow](org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val frames = Multimodal.frameSampleFixture(media, everyNthMs = 100L, maxFrames = 4)
      .collect()
    val srcCount = Tables(spark, dir, "documents").count()
    assert(frames.length >= srcCount) // every media row yields ≥1 frame
    val perId = frames.groupBy(_.media_id)
    assert(perId.values.forall(_.length <= 4))
    assert(perId.values.forall { fs =>
      fs.sortBy(_.frame_idx).map(_.ts_ms).toSeq.sliding(2).forall {
        case Seq(a, b) => b == a + 100L
        case _ => true
      }
    })
  }

  test("approx percentiles: certification query asserts both rank bounds") {
    import graft.operators.Analytics
    val rows = Analytics.approxOrderPercentiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val prio = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("n") > 0, s"$prio: empty group")
      assert(r.getAs[Boolean]("med_ok"), s"$prio: median rank bound failed")
      assert(r.getAs[Boolean]("p95_ok"), s"$prio: p95 rank bound failed")
    }
  }

  test("raw approx_percentile: positional error within the accuracy contract") {
    // independent recomputation against the raw expression, outside
    // the certification query, so the contract stays externally checked
    val approx = Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr(
        "approx_percentile(o_totalprice, array(0.5D, 0.95D), 1000)").as("p"))
      .select(col("o_orderpriority"),
        element_at(col("p"), 1).as("med"), element_at(col("p"), 2).as("p95"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val orders = Tables(spark, dir, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet === orders.keySet)
    // approx_percentile(accuracy = 1000) bounds the returned value's
    // RANK to within n/1000 of the target rank (plus one for the
    // returned-element discretization)
    approx.foreach { case (prio, (med, p95)) =>
      val xs = orders(prio)
      val tol = xs.length / 1000.0 + 1
      def rankOf(v: Double): Int = xs.count(_ <= v)
      assert(math.abs(rankOf(med) - 0.5 * xs.length) <= tol,
        s"$prio median rank off: $med")
      assert(math.abs(rankOf(p95) - 0.95 * xs.length) <= tol,
        s"$prio p95 rank off: $p95")
    }
  }

  test("length histogram: conserves docs/tokens, buckets bound their members") {
    import org.apache.spark.sql.functions._
    val hist = operators.TextAnalysis.lengthHistogram(spark, dir).collect()
    val docs = Tables(spark, dir, "documents")
      .select(size(split(trim(col("text")), " ")).cast("long").as("n"))
      .collect().map(_.getLong(0))
    assert(hist.map(_.getAs[Long]("n_docs")).sum === docs.length)
    assert(hist.map(_.getAs[Long]("n_tokens")).sum === docs.sum)
    // every doc's token count falls inside its bucket's [lo, hi]
    hist.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("bucket_lo"), r.getAs[Long]("bucket_hi"))
      val members = docs.filter(n => n >= lo && n <= hi)
      assert(members.length === r.getAs[Long]("n_docs"),
        s"bucket [$lo,$hi]")
    }
    assert(math.abs(hist.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-4)
  }

  test("gini: equal spends read ~0, a monopolist reads ~(n-1)/n") {
    import spark.implicits._
    def writeOrders(spends: Seq[Double]): String = {
      val d = java.nio.file.Files.createTempDirectory("gini").toString
      spends.zipWithIndex.map { case (s, i) =>
        (i.toLong, i.toLong, "O", s,
          new java.sql.Timestamp(1700000000000L), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
      d
    }
    val equal = operators.Analytics.spendGini(
      spark, writeOrders(Seq.fill(10)(100.0))).collect().head
    assert(equal.getAs[Long]("n_customers") === 10L)
    assert(math.abs(equal.getAs[Double]("gini")) < 1e-9)
    // 9 customers at ~0, one at 1000: G -> (n-1)/n = 0.9 (approached
    // from below as the small spends vanish)
    val skewed = operators.Analytics.spendGini(
      spark, writeOrders(Seq.fill(9)(0.01) :+ 1000.0)).collect().head
    assert(math.abs(skewed.getAs[Double]("gini") - 0.9) < 1e-3)
  }

  test("pmi pairs: a planted exclusive collocation tops the ranking") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pmi").toString
    // "zork quux" co-occurs 8 times and the two tokens never appear
    // apart; filler tokens pair promiscuously
    val filler = Seq("the", "cat", "sat", "on", "a", "mat")
    val rnd = new scala.util.Random(11)
    val docs = (0 until 8).map { i =>
      val pad = Seq.fill(12)(filler(rnd.nextInt(filler.length)))
      (i.toLong, (pad ++ Seq("zork", "quux")).mkString(" "), "en", "web", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = operators.TextAnalysis.pmiPairs(spark, tmp).collect()
    assert(out.nonEmpty)
    // canonical order and threshold hold everywhere
    out.foreach { r =>
      assert(r.getString(0) <= r.getString(1))
      assert(r.getAs[Long]("c_xy") >= operators.TextAnalysis.pmiMinCount)
    }
    val top = out.head
    assert((top.getString(0), top.getString(1)) === ("quux", "zork"))
    // exclusive pair: c_xy appears >= 8 (both window directions may add)
    assert(top.getAs[Long]("c_xy") >= 8L)
  }

  test("novelty: first doc scores 1.0, an exact copy 0.0, fresh content 1.0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("novel").toString
    val a = "completely original first document with its own words " +
      "stretching long enough to shed many distinct character grams"
    val c = "another fresh document that shares no phrasing at all with " +
      "the first one and brings entirely new material to the corpus"
    Seq((0L, a), (1L, a), (2L, c))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = operators.TextAnalysis.noveltyScores(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("novelty")).toMap
    assert(out(0L) === 1.0) // everything first-seen
    assert(out(1L) === 0.0) // exact copy: every gram seen in doc 0
    assert(out(2L) > 0.9) // fresh text (an incidental shared gram allowed)
  }

  test("rfm segments: balanced deciles, ordered boundaries, code composition") {
    val rows = operators.Analytics.rfmSegments(spark, dir).collect()
    val n = rows.length
    assert(n > 0)
    // every decile column is 1..10 and balanced to within one row
    Seq("r_decile", "f_decile", "m_decile").foreach { c =>
      val byDec = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.length)
      assert(byDec.keys.forall(d => d >= 1 && d <= 10), c)
      assert(byDec.values.max - byDec.values.min <= 1, s"$c imbalance")
    }
    // decile 1 of monetary dominates decile 10
    val m1 = rows.filter(_.getAs[Long]("m_decile") === 1L)
      .map(_.getAs[Double]("monetary")).min
    val m10 = rows.filter(_.getAs[Long]("m_decile") === 10L)
      .map(_.getAs[Double]("monetary")).max
    assert(m1 >= m10)
    rows.foreach { r =>
      assert(r.getAs[Long]("rfm_code") ===
        r.getAs[Long]("r_decile") * 100 + r.getAs[Long]("f_decile") * 10 +
          r.getAs[Long]("m_decile"))
    }
  }
}
