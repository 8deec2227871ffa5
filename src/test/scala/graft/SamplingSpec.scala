package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Split determinism: the assignment is a pure function of content —
  * invariant under repartitioning and re-evaluation — and roughly
  * matches the 90/5/5 target.
  */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("split assignment is stable under repartitioning") {
    val docs = Tables(spark, dir, "documents")
    val base = docs.withColumn("split", Sampling.splitAssign(col("text")))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val reparted = docs.repartition(13)
      .withColumn("split", Sampling.splitAssign(col("text")))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(base === reparted)
  }

  test("split proportions are near 90/5/5 and exhaustive") {
    val counts = Tables(spark, dir, "documents")
      .withColumn("split", Sampling.splitAssign(col("text")))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train").toDouble / total > 0.8)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("stratified sample: exact per-stratum quota, stable under repartitioning") {
    val s = Sampling.stratifiedSample(spark, dir, perGroup = 7)
    val perLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = Tables(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet === strata.keySet)
    perLang.foreach { case (lang, n) =>
      assert(n === math.min(7L, strata(lang)), s"stratum $lang")
    }
    // content-hash ranking: the chosen ids are a pure function of content
    val again = Sampling.stratifiedSample(spark, dir, perGroup = 7)
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(again === s.collect().map(_.getLong(2)).sorted.toSeq)
  }

  test("sequence packing: conserves docs and tokens, bins start at 0") {
    val packed = Sampling.packSequences(spark, dir).collect()
    assert(packed.map(_.getLong(2)).sum ===
      Tables(spark, dir, "documents").count())
    val expectedTokens = Tables(spark, dir, "documents")
      .select(sum(size(split(trim(col("text")), " ")).cast("long")))
      .collect().head.getLong(0)
    assert(packed.map(_.getLong(3)).sum === expectedTokens)
    packed.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(1)).min === 0L, s"first bin of $lang")
      assert(rows.forall(_.getLong(3) > 0))
    }
  }

  test("packing and budget mix are stable under repartitioning") {
    val base = Sampling.packSequences(spark, dir).collect().map(_.toSeq).toSet
    val mixBase = Sampling.tokenBudgetMix(spark, dir).collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      assert(Sampling.packSequences(spark, dir).collect().map(_.toSeq).toSet === base)
      assert(Sampling.tokenBudgetMix(spark, dir).collect().map(_.toSeq).toSet === mixBase)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("BPE-true packing/budget twins: tokenizer counts, conservation, " +
    "greedy contract") {
    import graft.operators.BpeTrainer
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.count()
    val wsTotal = docs
      .select(sum(size(split(trim(col("text")), " ")).cast("long")))
      .collect().head.getLong(0)
    val encTotal = BpeTrainer.encode(spark, dir)
      .select(sum(col("n_tokens"))).collect().head.getLong(0)
    // the twin budgets on the counts the trained tokenizer emits —
    // >= whitespace words always (every word is >= 1 subword); equality
    // happens only at full-merge saturation (sf0.001's tiny vocabulary
    // merges every word type back to one token), > on real corpora
    assert(encTotal >= wsTotal,
      s"BPE counts ($encTotal) must be >= whitespace counts ($wsTotal)")
    val packed = Sampling.packSequencesBpe(spark, dir).collect()
    assert(packed.map(_.getLong(2)).sum === nDocs)
    assert(packed.map(_.getLong(3)).sum === encTotal,
      "packing must conserve exactly the tokenizer's token mass")
    packed.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(1)).min === 0L, s"first bin of $lang")
    }
    // budget twin: each language either filled its BPE budget (the
    // greedy overshoot-by-at-most-one-doc contract) or ran out of docs
    val langTotals = BpeTrainer.encode(spark, dir)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(
        sum(col("n_tokens")).as("tot"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    Sampling.tokenBudgetBpe(spark, dir).collect().foreach { r =>
      val (lang, nd, nt) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (tot, n) = langTotals(lang)
      assert(nt >= math.min(Sampling.bpeMixBudgetTokens.toLong, tot),
        s"$lang under-filled: $nt of budget ${Sampling.bpeMixBudgetTokens}")
      assert(nd <= n)
    }
  }

  test("temperature mix: tau<1 compresses shares toward uniform, budget conserved") {
    val rows = Sampling.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.length >= 2)
    val uniform = 1.0 / rows.length
    rows.foreach { case (lang, _, nat, temp, _) =>
      assert(math.abs(temp - uniform) <= math.abs(nat - uniform) + 1e-9,
        s"$lang: temp share $temp further from uniform than natural $nat")
    }
    // shares each sum to 1 (within the 4-decimal rounding), targets to
    // the budget (within one rounding unit per language)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._5).sum - Sampling.tempBudgetTokens) <=
      rows.length)
  }

  test("exact dedup by content hash equals dedup by raw text") {
    val docs = Tables(spark, dir, "documents")
    val byHash = graft.operators.Dedup.exact(spark, dir).count()
    val byText = docs.groupBy(lower(trim(col("text")))).count().count()
    assert(byHash === byText) // md5 grouping introduced no collisions
  }

  test("weighted sample: deterministic, keys replayable, biased toward heavy docs") {
    val dir = "/root/testdata/sf0.001"
    val s1 = Sampling.weightedSample(spark, dir).collect()
    assert(s1.length === Sampling.weightedSampleK)
    // stable under repartitioning (hash-uniforms, not RNG)
    val s2 = Sampling.weightedSample(spark, dir).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    // key replay: ln((u28+1)/2^28)/w rounded at 9
    s1.take(20).foreach { r =>
      val expect = BigDecimal(
        math.log((r.getAs[Long]("u28") + 1).toDouble / 268435456.0) /
          r.getAs[Long]("n_tokens"))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("wkey") - expect) < 1e-12)
    }
    // inclusion ∝ tokens: the sample's mean token count must exceed
    // the corpus mean (heavier docs are likelier picks)
    val corpusMean = Tables(spark, dir, "documents")
      .select(avg(size(split(trim(col("text")), " ")))).head.getDouble(0)
    val sampleMean = s1.map(_.getAs[Long]("n_tokens")).sum.toDouble / s1.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("split KL drift matches a JVM recomputation; both directions >= 0") {
    val dir = "/root/testdata/sf0.001"
    val row = Sampling.splitKlDrift(spark, dir).collect().head

    // independent recomputation: same md5 split, same smoothing, same
    // sorted-token fold order
    def bucket(text: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = Tables(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val ct = scala.collection.mutable.Map.empty[String, Long]
    val cv = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { t =>
      val b = bucket(t)
      val target = if (b < 90) Some(ct) else if (b < 95) Some(cv) else None
      target.foreach { m =>
        t.trim.split(" ").foreach(w => m(w) = m.getOrElse(w, 0L) + 1)
      }
    }
    val vocab = (ct.keySet ++ cv.keySet).toSeq.sorted
    val (tt, tv, v) = (ct.values.sum, cv.values.sum, vocab.size.toLong)
    def fold(f: String => Double): Double =
      vocab.foldLeft(0.0)((acc, w) => acc + f(w))
    def p(w: String) = (ct.getOrElse(w, 0L) + 1).toDouble / (tt + v).toDouble
    def q(w: String) = (cv.getOrElse(w, 0L) + 1).toDouble / (tv + v).toDouble
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("n_train_tokens") === tt)
    assert(row.getAs[Long]("n_val_tokens") === tv)
    assert(row.getAs[Long]("vocab_size") === v)
    assert(row.getAs[Double]("kl_train_val") ===
      round6(fold(w => p(w) * math.log(p(w) / q(w)))))
    assert(row.getAs[Double]("kl_val_train") ===
      round6(fold(w => q(w) * math.log(q(w) / p(w)))))
    // Gibbs: KL >= 0 in both directions
    assert(row.getAs[Double]("kl_train_val") >= 0.0)
    assert(row.getAs[Double]("kl_val_train") >= 0.0)
  }

  test("pareto frontier equals the definitional dominance scan") {
    // the prefix-max grid walk must agree with the O(n²) definition:
    // keep d iff no d' is >= on both axes and > on one
    val got = Sampling.paretoFrontier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stops = Set("the", "a", "of", "and", "in", "to", "is")
    val scored = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.split(" ", -1)
        val t = toks.length.toLong
        val ns = toks.count(stops.contains).toLong
        (r.getLong(0), t, 1000000L * ns / t)
      }
      .filter(_._2 > 0L)
    val expect = scored.filter { case (_, t, q) =>
      !scored.exists { case (_, t2, q2) =>
        t2 >= t && q2 >= q && (t2 > t || q2 > q)
      }
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
