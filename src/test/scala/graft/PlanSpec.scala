package graft

import graft.operators.{Analytics, Dedup, EventsCdc, Temporal}

/** Physical-plan guardrails: the scale properties each operator's plan
  * must keep (filter pushdown to the parquet scan, column pruning,
  * broadcast dimension joins, shuffle counts). These are the properties
  * that make the difference at 100 TB; a refactor that silently loses
  * one should fail here, not in production.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffles(p: String): Int = p.split("Exchange hashpartitioning").length - 1

  test("changelog scan: predicate pushed to parquet, columns pruned") {
    val p = EventsCdc.changelogScan(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("In(event_type") || p.contains("IsNotNull(event_type"), p)
    // projection is 4 columns; ts/props must not be read
    assert(!p.contains("props"), s"props not pruned:\n$p")
  }

  test("q5 snowflake: every dimension joins via broadcast, facts shuffle once") {
    val p = plan(Analytics.nationRevenue(spark, dir))
    val broadcasts = p.split("BroadcastHashJoin").length - 1
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, plan:\n$p")
    // only the lineitem ⋈ orders join and the final agg may shuffle
    assert(shuffles(p) <= 3, s"too many shuffles (${shuffles(p)}):\n$p")
  }

  test("finalView dedup: exactly one shuffle on the key") {
    val p = plan(EventsCdc.latestEvents(spark, dir))
    assert(shuffles(p) === 1, s"expected 1 hash shuffle:\n$p")
  }

  test("asof join and sessionize: single shuffle each") {
    assert(shuffles(plan(Temporal.lastTouchAttribution(spark, dir))) === 1)
    assert(shuffles(plan(Temporal.sessionize(spark, dir))) === 1)
  }

  test("correlated-subquery window form: one shuffle, no self-join") {
    val p = plan(Analytics.aboveAvgOrders(spark, dir))
    assert(shuffles(p) === 1, s"expected 1 shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("minhash signatures: spread below the kernel, no post-kernel hash shuffle") {
    val df = Dedup.minhashSignatures(spark, dir)
    val p = plan(df)
    // exactly ONE hash exchange: the r18 Tables.spread repartition that
    // parallelizes the md5 kernel off a single-row-group scan — and it
    // must sit BELOW the kernel (spread rows, then hash), with nothing
    // hash-shuffling the wide signature rows after the kernel
    // (rangepartitioning for the final orderBy is fine)
    assert(shuffles(p) === 1, s"signature pass: spread exchange only:\n$p")
    // printed plans list downstream first: the kernel projection must
    // appear ABOVE (before) the spread exchange it consumes
    assert(p.indexOf("ngram_minhash_md5") <
      p.indexOf("Exchange hashpartitioning(pmod(xxhash64"),
      s"spread must run below the kernel:\n$p")
    // the single-pass native expression is in the plan (not a UDF or
    // a composed shingle-array pipeline)
    assert(p.contains("ngram_minhash_md5"), s"expected native expression:\n$p")
  }

  test("wide minhash signatures: spread below the kernel, native affine expr") {
    val p = plan(Dedup.minhashWide(spark, dir))
    assert(shuffles(p) === 1, s"wide signature pass: spread exchange only:\n$p")
    assert(p.contains("ngram_minhash_affine"), s"expected native expression:\n$p")
  }

  test("jaccard df-cap: broadcast anti-join blocklist, no full-width window pass") {
    // the blocklist subtree runs inside the eager localCheckpoint, so
    // the final plan can't show the anti-join; the observable guardrail
    // is that no stage windows the full gram table
    val p = plan(Dedup.ngramJaccardPairs(spark, dir))
    assert(!p.contains("Window"), s"df-cap must not window the gram table:\n$p")
  }

  test("top-k: TakeOrderedAndProject, not a global sort") {
    val p = plan(Analytics.topKOrders(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("runtime bloom filter: selective dim predicate reaches the fact scan as might_contain") {
    import org.apache.spark.sql.functions._
    // at 100 TB the shuffle-join equivalent of broadcast pruning is the
    // runtime bloom filter: the selective side's join keys build a
    // bloom filter that drops fact rows BEFORE the exchange. Thresholds
    // are sized for production scans, so pin them down for the fixture.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val orders = Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val joined = Tables(spark, dir, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      val p = plan(joined)
      assert(p.contains("might_contain"), s"expected injected bloom filter:\n$p")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("tfidf: df and corpus-size come back as broadcasts over the tf table") {
    // tf is checkpointed (corpus scanned once); downstream the plan may
    // only hash-shuffle the tf table for its group-bys and the ranking
    // window — df and N must join via broadcast, never shuffle tf again
    val p = plan(operators.Retrieval.tfidfKeywords(spark, dir))
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, s"df join must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"scalar N must broadcast:\n$p")
    assert(shuffles(p) <= 2, s"expected <=2 hash shuffles (df agg + window):\n$p")
  }

  test("bm25: per-term stats broadcast; no corpus self-join") {
    val p = plan(operators.Retrieval.bm25Scores(spark, dir))
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, p)
    assert(!p.contains("SortMergeJoin"), s"no sort-merge join at corpus width:\n$p")
  }

  test("cms: sketch cells join back as a broadcast") {
    val p = plan(operators.Sketches.cmsTokenCounts(spark, dir))
    assert(p.split("BroadcastHashJoin").length - 1 >= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("repetition signals: explode reads the materialized projection, not raw expressions") {
    // the pre-explode checkpoint hides the scan; the visible plan must
    // contain only the generate + the two aggregates
    val p = plan(operators.TextAnalysis.repetitionSignals(spark, dir))
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("array_distinct"),
      s"token-level expressions must be materialized pre-explode:\n$p")
  }

  test("bloom dedup: bit-set and fingerprint-set probes are broadcast joins") {
    val p = plan(Dedup.bloomIncremental(spark, dir))
    // the two membership probes must broadcast (the m-bit bitmap shape
    // at scale), never sort-merge the batch against the corpus sets
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"probe side must not shuffle-sort:\n$p")
  }

  test("merge apply: version cuts ride as broadcast, source collapse is a partial agg") {
    val p = plan(operators.MergeInto.mergeApply(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row cut aggregate must broadcast:\n$p")
    // max_by collapse of the change slice runs with map-side combine
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      p.contains("ObjectHashAggregate"), s"source collapse must combine map-side:\n$p")
  }

  test("snapshot diff: single aggregation pass, no self-join of the log") {
    val p = plan(operators.CdcHistory.snapshotDiff(spark, dir))
    assert(!p.contains("SortMergeJoin"), s"no snapshot self-join:\n$p")
    assert(shuffles(p) === 1, s"one key shuffle only (${shuffles(p)}):\n$p")
  }

  test("fuzzy joins: broadcast under the measured budget, shuffled hash " +
    "join past it — never sort-merge") {
    // default budgets at sf0.001: the delta forms measure far under
    // the 3M-row maxBroadcastForms budget and the name re-attach far
    // under the 200k-row maxBroadcastNames budget (both calibrated
    // against spark.driver.maxResultSize, not heap) → every guarded
    // join is a broadcast hash join, nothing shuffled-hash
    val under = plan(operators.Fuzzy.nameJoinIncremental(spark, dir))
    assert(under.contains("BroadcastHashJoin"), s"broadcast shape:\n$under")
    assert(!under.contains("ShuffledHashJoin"), s"no fallback yet:\n$under")
    // forced threshold 0: the guard must switch every one of those
    // joins to its shuffled-HASH fallback (hinted — the bare default
    // would auto-broadcast at this scale and sort-merge at 100 TB,
    // paying a pointless sort on the probe side)
    val over = plan(operators.Fuzzy.nameJoinIncremental(spark, dir, 0L, 0L))
    assert(over.contains("ShuffledHashJoin"), s"fallback shape:\n$over")
    assert(!over.contains("BroadcastHashJoin"), s"no unguarded broadcast:\n$over")
    // nameJoin2's candidate joins (j22/jle1) are guarded too — the
    // forms table is a mapPartitions product whose Catalyst size
    // estimate does NOT scale with the corpus, so "leave it to stats"
    // auto-broadcast a 250M-row side at x100 (caught by the round-17
    // rehearsal). Forcing every budget to 0 must leave NO broadcast
    // join anywhere in the plan: two ShuffledHashJoins on the id
    // re-attach keys, and (checked on the RAW candidate plan — the
    // round-18 session memo collapses the materialized candidate set
    // to a checkpoint scan in downstream plans) shuffled candidate
    // joins with no broadcast.
    val over2 = plan(operators.Fuzzy.nameJoin2(spark, dir, 0L, 0L))
    assert(over2.split("ShuffledHashJoin \\[id").length - 1 === 2,
      s"both name re-attaches must take the shuffled fallback:\n$over2")
    assert(!over2.contains("BroadcastHashJoin"),
      s"no join may broadcast in the fully-forced plan:\n$over2")
    val cand = plan(operators.Fuzzy.candidates2Raw(spark, dir, 0L))
    assert(cand.contains("ShuffledHashJoin"),
      s"forced candidate joins must take the shuffled fallback:\n$cand")
    assert(!cand.contains("BroadcastHashJoin"),
      s"no candidate join may broadcast when forced past budget:\n$cand")
    // and under the default budgets at this scale the measured form
    // counts fit — the fast broadcast shape
    val candUnder = plan(operators.Fuzzy.candidates2Raw(spark, dir))
    assert(candUnder.contains("BroadcastHashJoin"),
      s"under-budget candidate joins broadcast:\n$candUnder")
  }

  test("pq encode: one narrow corpus pass — no join, no hash shuffle") {
    // the production encode streams the corpus once against the
    // broadcast codebook artifact inside mapPartitions: the only
    // exchange in the whole plan is the presentation sort
    val p = plan(operators.Pq.pqCodes(spark, dir))
    assert(p.contains("MapPartitions"), s"scalar encode must be a mapPartitions pass:\n$p")
    assert(!p.contains("Join"), s"no codebook join on the encode path:\n$p")
    assert(shuffles(p) === 0, s"no hash exchange (${shuffles(p)}):\n$p")
  }
}
