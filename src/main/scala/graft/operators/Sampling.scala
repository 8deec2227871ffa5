package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and filtering for training-data
  * pipelines.
  *
  * Splits must be a pure function of content identity — never `rand()`
  * — so re-runs, replays, and incremental additions land every document
  * in the same split, on any cluster, at any parallelism. The bucket is
  * derived from the md5 of the key (the one hash primitive shared
  * bit-for-bit with the DuckDB oracle), taking 28 bits of hex → a
  * uniform integer mod 100.
  */
object Sampling {

  /** Percent bucket 0-99, deterministic per key. */
  def pctBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("binary")), 1, 7), 16, 10).cast("long"),
      lit(100))

  /** Train/val/test assignment: 90/5/5 by content-hash bucket. */
  def splitAssign(key: Column): Column = {
    val b = pctBucket(key)
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  /** Driver-checkable query: split sizes and token volume per split and
    * language — the reproducibility audit every corpus build ships.
    */
  def splitSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("split", splitAssign(col("text")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " "))).cast("long").as("n_tokens"))
      .orderBy("split", "lang")

  /** Stratified per-group sample: exactly `perGroup` documents per
    * language (fewer if the stratum is smaller), chosen by content-hash
    * rank — deterministic under replay and insertion order, like
    * [[splitAssign]], but with an exact per-stratum quota instead of a
    * global rate. The rank is a window per stratum: at scale each
    * language partition sorts independently (one shuffle on `lang`;
    * skewed strata would salt-prefilter by [[pctBucket]] first to cut
    * the sort input to ~quota size).
    */
  def stratifiedSample(spark: SparkSession, dir: String,
                       perGroup: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    Tables(spark, dir, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perGroup)
      .select("lang", "rk", "doc_id")
      .orderBy("lang", "rk")
  }

  /** Context length for [[packSequences]] — the target token budget of
    * one packed training sequence.
    */
  val packContextLen = 512

  /** Greedy sequence packing: per language, documents in doc_id order
    * are packed into fixed-budget bins — bin = floor(tokens-before-me /
    * context) — the standard first-pass packing plan for LLM training
    * batches (documents spanning a boundary are split downstream; the
    * plan stage only needs the bin assignment to be deterministic).
    * One window (running token sum per lang) + one aggregate; both
    * shuffle on `lang` only.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tok"))
      .withColumn("before", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", floor(col("before") / packContextLen))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy("lang", "bin")
  }

  /** Tokenizer-TRUE per-document token counts: the trained BPE's
    * word-type segmentation artifact (memoized — train once per
    * dataset, [[BpeTrainer.segmentation]]) broadcast-joined onto the
    * exploded word stream, summed per document. This is what
    * [[packSequencesBpe]] / [[tokenBudgetBpe]] budget on: whitespace
    * counts differ from what a trainer's tokenizer actually sees
    * (each word segments into ≥1 subwords + the `</w>` marker
    * convention), so a whitespace-budgeted pack silently over- or
    * under-fills real context windows. Same scale shape as
    * [[BpeTrainer.encode]]: one narrow posexplode pass, the model side
    * a broadcast (shuffle equi-join past broadcast range), one
    * map-side-combined per-doc aggregate — never corpus × vocab.
    */
  private def bpeDocTokens(spark: SparkSession, dir: String): DataFrame = {
    val ns = BpeTrainer.segmentation(spark, dir)
      .select(col("w"), size(col("sub")).cast("long").as("ns"))
    Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        explode(split(trim(col("text")), " ")).as("w"))
      .join(broadcast(ns), "w")
      .groupBy(col("lang"), col("doc_id"))
      .agg(sum(col("ns")).as("n_tok"))
  }

  /** Context length for [[packSequencesBpe]] — wider than the
    * whitespace row's budget because BPE counts run ~3× higher on this
    * corpus (subwords + end-of-word markers); the VALUE is a free
    * parameter, the accounting unit is the point.
    */
  val bpePackContextLen = 1024

  /** [[packSequences]] with tokenizer-true accounting: identical plan
    * (one per-lang running-sum window + one aggregate, both shuffling
    * on `lang` only — the token-count join adds one narrow broadcast
    * stage upstream), but bins fill by the token counts the trained
    * tokenizer will actually emit.
    */
  def packSequencesBpe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bpeDocTokens(spark, dir)
      .withColumn("before", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", floor(col("before") / bpePackContextLen))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy("lang", "bin")
  }

  /** Token budget per language for [[tokenBudgetBpe]] (scaled like
    * [[bpePackContextLen]] for the same reason).
    */
  val bpeMixBudgetTokens = 6000

  /** [[tokenBudgetMix]] with tokenizer-true accounting: the quality
    * ORDER is unchanged (the whitespace-feature quality score — what
    * ranks a document is a separate decision from how its cost is
    * counted), but the budget fills by trained-BPE token counts, so
    * "N tokens of each language" means N tokens the trainer will see.
    * One doc_id-keyed join attaches quality to the counted frame; the
    * window and aggregate shuffle on `lang` exactly like the
    * whitespace row.
    */
  def tokenBudgetBpe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = TextAnalysis.representativeQuality(col("text"))
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"), quality.as("quality"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bpeDocTokens(spark, dir)
      .join(scored, "doc_id")
      .withColumn("before", sum(col("n_tok")).over(w) - col("n_tok"))
      .filter(col("before") < bpeMixBudgetTokens)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        round(min(col("quality")), 4).as("min_quality"))
      .orderBy("lang")
  }

  /** Token budget per language for [[tokenBudgetMix]]. */
  val mixBudgetTokens = 2000

  /** Token-budget mixture selection: per language, take documents in
    * descending quality order (ties to smallest doc_id) until the
    * running token total passes [[mixBudgetTokens]] — the corpus-mixing
    * primitive behind "N tokens of each language, best documents
    * first". A document is kept while the budget is not yet exhausted
    * BEFORE it (so the budget may be overshot by at most one doc —
    * the standard greedy contract). One window per stratum + one
    * aggregate; shuffles on `lang` only.
    */
  def tokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(col("text")), " ")
    val quality = TextAnalysis.representativeQuality(col("text"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(toks).cast("long").as("n_tok"), quality.as("quality"))
      .withColumn("before", sum(col("n_tok")).over(w) - col("n_tok"))
      .filter(col("before") < mixBudgetTokens)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        round(min(col("quality")), 4).as("min_quality"))
      .orderBy("lang")
  }

  /** Temperature exponent and token budget for [[temperatureMix]]. */
  val mixTau = 0.7
  val tempBudgetTokens = 1000000L

  /** Temperature-based language mixture (the mT5/XLM-R resampling
    * rule): sampling share pₗ ∝ cₗ^τ with τ = [[mixTau]] < 1, which
    * compresses shares toward uniform so low-resource languages are
    * upsampled relative to their natural share. Emits natural share,
    * temperature share, and the token allocation out of
    * [[tempBudgetTokens]].
    *
    * Float-parity discipline: the only cross-engine risks in x^τ
    * normalization are libm `pow` ULPs and float-sum order. The
    * weights are rounded to 6 decimals and summed as DECIMAL —
    * order-independent exactness — then converted to double for ONE
    * division; the natural share divides exact integer sums. One
    * corpus scan, one map-side-combined per-language aggregate; the
    * two normalization totals come back as a 1-row broadcast
    * cross-join (the tfidf scalar-N discipline) rather than an
    * unpartitioned window, keeping the empty-partition WindowExec ban
    * uniform.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(trim(col("text")), " ")).cast("long")).as("n_tokens"))
      .withColumn("w",
        round(pow(col("n_tokens").cast("double"), lit(mixTau)), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
    val totals = perLang.agg(sum(col("w")).as("w_tot"),
      sum(col("n_tokens")).as("tok_tot"))
    perLang.crossJoin(broadcast(totals))
      .withColumn("p", col("w").cast("double") / col("w_tot").cast("double"))
      .withColumn("nat", col("n_tokens").cast("double") / col("tok_tot"))
      .select(col("lang"), col("n_tokens"),
        round(col("nat"), 4).as("natural_share"),
        round(col("p"), 4).as("temp_share"),
        round(col("p") * tempBudgetTokens, 0).cast("long").as("target_tokens"))
      .orderBy("lang")
  }

  /** Quality-gate filter: keep documents passing the pretraining-corpus
    * heuristics (enough tokens, sane token length, some stopword mass —
    * the thresholds are illustrative; the shape is a conjunctive
    * predicate pushed into one narrow scan).
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val nTok = size(toks)
    val avgLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio = size(filter(toks, t =>
      t.isInCollection(Seq("the", "a", "of", "and", "in", "to", "is"))))
      .cast("double") / nTok
    Tables(spark, dir, "documents")
      .filter(nTok >= 5 && avgLen >= 2.0 && avgLen <= 12.0 && stopRatio >= 0.05)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Per-source document cap (the CommonCrawl-style per-domain cap):
    * keep at most `perSource` documents per source, best-first by token
    * count with doc_id as the total-order tiebreak. Differs from
    * [[stratifiedSample]] in WHAT ranks: a quality signal, not a
    * content hash — the cap keeps the best of an over-represented
    * domain rather than a uniform sample of it. One window shuffle on
    * `source`; at scale a skewed source would pre-filter to ~cap size
    * by a per-partition top-k (`rank <= cap` within each map partition
    * keeps at most cap·P rows) before the global window — same output,
    * sort input cut from the domain's size to cap·P.
    */
  def sourceCap(spark: SparkSession, dir: String,
                perSource: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(split(trim(col("text")), " "))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    Tables(spark, dir, "documents")
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perSource)
      .select("source", "rk", "doc_id", "n_tokens")
      .orderBy("source", "rk")
  }

  /** Context-window chunking: size / stride in tokens (16-token
    * overlap) — the fixed-window segmentation that prepares documents
    * for a bounded-context trainer or a RAG index.
    */
  val chunkSize = 64
  val chunkStride = 48

  /** Overlapping fixed-token windows per document: window k covers
    * tokens [k·stride, k·stride + size); the window count is exactly
    * enough that the final window reaches the document's tail (no
    * degenerate all-overlap windows after it). Map-only shape — one
    * scan, a per-row `sequence` explode, slices from the already-split
    * token array; no shuffle anywhere but the output presentation
    * sort.
    */
  def chunkWindows(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), toks.as("toks"), size(toks).as("nt"))
    val nChunks = lit(1) + when(col("nt") > chunkSize,
      floor((col("nt") - chunkSize + (chunkStride - 1)) /
        lit(chunkStride)).cast("int")).otherwise(lit(0))
    d.withColumn("k", explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
        (col("k") * chunkStride).cast("long").as("start_tok"),
        slice(col("toks"), col("k") * chunkStride + 1, lit(chunkSize)).as("c"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("c")).cast("long").as("n_tok"),
        array_join(col("c"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic global shuffle order — the reproducible permutation
    * a training run reads the corpus in: position = rank under
    * (md5(doc_id ‖ salt), doc_id). A pure function of identity, so
    * re-runs and incremental rebuilds reproduce the same order on any
    * cluster at any parallelism (the same property [[splitAssign]]
    * gives splits). The rank runs as [[Ranks.global]]'s two-pass
    * range-partitioned sort — every partition ranks in parallel, only
    * the numPartitions-row offset table touches the driver.
    */
  def shuffleOrder(spark: SparkSession, dir: String): DataFrame = {
    val key = md5(concat(col("doc_id").cast("string"),
      lit("#graft-shuffle-1")).cast("binary"))
    val keyed = Tables(spark, dir, "documents")
      .select(col("doc_id"), key.as("skey"))
    Ranks.global(keyed, "position", col("skey"), col("doc_id"))
      .select("position", "doc_id")
      .orderBy("position")
  }

  /** Number of curriculum phases for [[curriculumSchedule]]. */
  val curriculumPhaseCount = 4

  /** Curriculum schedule: rank every document by an integer quality
    * score (stopword count ×1000 — the prose signal — plus token
    * count, both exact integers so the order is bit-identical across
    * engines) and cut the ranking into [[curriculumPhaseCount]]
    * equal-size phases, cleanest prose first — the quality-ordered
    * data schedule curriculum-training runs consume (easy/clean
    * early phases, tail-quality late phases).
    *
    * Scale shape: the score is one narrow map pass; the global rank is
    * [[Ranks.global]]'s two-pass range-partitioned sort (no
    * single-partition window); the phase cut needs only the corpus
    * COUNT, read as max(rank) from the rank pass's own checkpointed
    * frame (never a second corpus scan) and joined back as a 1-row
    * broadcast. Integer phase arithmetic (`(rank−1)·K div N`) avoids
    * any float boundary.
    */
  def curriculumSchedule(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val nStop = size(filter(toks, t =>
      t.isInCollection(Seq("the", "a", "of", "and", "in", "to", "is"))))
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        (nStop.cast("long") * 1000L + size(toks).cast("long")).as("score"))
    val ranked = Ranks.global(scored, "rank", col("score").desc, col("doc_id"))
    val n = ranked.agg(max(col("rank")).as("n_total"))
    ranked
      .crossJoin(broadcast(n))
      .select(col("rank"), col("doc_id"), col("score"),
        (expr(s"((rank - 1) * $curriculumPhaseCount) div n_total") + 1L)
          .as("phase"))
      .orderBy("rank")
  }

  /** Weighted-sample size for [[weightedSample]]. */
  val weightedSampleK = 100

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each document draws a hash-deterministic uniform u ∈ (0,1] (28
    * md5 bits of doc_id — replayable, insertion-order-free, the
    * [[graft.operators.Dsir]] resampling discipline) and scores
    * key = ln(u)/w with w = its token count; the top-k keys ARE a
    * without-replacement sample with inclusion probability ∝ weight.
    * The cut is `orderBy().limit(k)` — TakeOrdered, O(N) scan and
    * O(k) result at any scale, no global window — ordered on
    * (rounded key DESC, doc_id) so the boundary is engine-exact.
    * This is the token-weighted subset selection a mixture build uses
    * when "sample documents ∝ tokens" must be reproducible across
    * engines and reruns.
    */
  def weightedSample(spark: SparkSession, dir: String,
                     k: Int = weightedSampleK): DataFrame = {
    val u28 = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit("#wsample")).cast("binary")), 1, 7), 16, 10).cast("long")
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
        u28.as("u28"))
      .filter(col("n_tokens") > 0)
      // u ∈ (0,1]: (u28+1)/2^28; key = ln(u)/w — larger is better
      // (equivalent to ranking u^(1/w))
      .withColumn("wkey",
        round(log((col("u28") + 1L).cast("double") / 268435456.0d) /
          col("n_tokens"), 9))
      .orderBy(col("wkey").desc, col("doc_id"))
      .limit(k)
  }

  /** Token-distribution drift between the train and val splits:
    * add-1-smoothed KL divergence in both directions over the union
    * vocabulary — the audit that certifies a hash split didn't shear
    * the distribution (a near-zero KL) and, run between two corpus
    * VERSIONS, the drift monitor a recurring ingest reads. One row:
    * split token totals, vocab size, KL(train‖val), KL(val‖train).
    *
    * Determinism: counts are exact integers; each token's KL term is
    * one fixed float expression (both engines see identical rounded
    * inputs), and the vocab-sized term lists fold in SORTED TOKEN
    * ORDER on both sides (`sort_array` + `aggregate` here, `list(...
    * ORDER BY token)` + `list_reduce` in the oracle) — no unordered
    * float sum anywhere, the unigram-NLL discipline.
    *
    * Scale shape (100 TB): one corpus scan into a map-side-combined
    * (token, split-conditional counts) reduction; everything after
    * aggregates the VOCAB table (checkpointed once) with 1-row
    * broadcast totals. The ordered fold is a single vocab-length
    * array on the driver-bound final row — at a 10⁸-type vocabulary
    * swap it for the tree-reduce sum and round coarser; documented,
    * not hidden.
    */
  def splitKlDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .withColumn("split", splitAssign(col("text")))
      .filter(col("split").isin("train", "val"))
      .select(col("split"), explode(split(trim(col("text")), " ")).as("token"))
    val counts = toks.groupBy("token")
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("ct"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("cv"))
      .localCheckpoint() // vocab-sized; feeds totals + terms
    val totals = counts.agg(sum(col("ct")).as("tt"), sum(col("cv")).as("tv"),
      count(lit(1)).as("v"))
    val p = (col("ct") + 1L).cast("double") / (col("tt") + col("v")).cast("double")
    val q = (col("cv") + 1L).cast("double") / (col("tv") + col("v")).cast("double")
    val terms = counts.crossJoin(broadcast(totals))
      .select(col("token"), col("tt"), col("tv"), col("v"),
        (p * log(p / q)).as("t_tv"), (q * log(q / p)).as("t_vt"))
    terms
      .agg(first(col("tt")).as("n_train_tokens"),
        first(col("tv")).as("n_val_tokens"),
        first(col("v")).as("vocab_size"),
        sort_array(collect_list(struct(col("token"), col("t_tv")))).as("atv"),
        sort_array(collect_list(struct(col("token"), col("t_vt")))).as("avt"))
      .select(col("n_train_tokens"), col("n_val_tokens"), col("vocab_size"),
        round(aggregate(col("atv"), lit(0.0d),
          (acc, x) => acc + x.getField("t_tv")), 6).as("kl_train_val"),
        round(aggregate(col("avt"), lit(0.0d),
          (acc, x) => acc + x.getField("t_vt")), 6).as("kl_val_train"))
  }

  /** Per-source distribution drift — the data-mix diagnostic behind
    * source weighting: for every source, KL(P_source ‖ P_corpus) over
    * add-1-smoothed unigram distributions on the SHARED corpus vocab
    * (tokens the source never emits still contribute their smoothed
    * mass — the full-vocab cross is what makes the divergences
    * comparable across sources). A source that parrots the corpus mix
    * reads ≈ 0; a specialized source reads high — the signal
    * `q_token_budget_mix`-style samplers act on.
    *
    * Float discipline: the [[splitKlDrift]] convention — every term is
    * a fixed IEEE expression over exact integer counts, and the
    * per-source sum is an ORDERED fold over the token-sorted term
    * list, round-6; identical in the oracle.
    *
    * Shape (100 TB): one map-side-combined (source, token) count, the
    * corpus marginal derived by re-aggregating it (no second corpus
    * pass), the full cross built from the vocab-sized marginal × the
    * broadcast source list, and one fold per source over the
    * vocab-bounded term frame.
    */
  def sourceKlDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val st = docs
      .select(col("source"), explode(split(trim(col("text")), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cs"))
      .localCheckpoint() // (source, token) counts: marginal + cross
    val corpus = st.groupBy("token").agg(sum(col("cs")).as("cc"))
    val srcTot = st.groupBy("source").agg(sum(col("cs")).as("ts"))
    val tot = corpus.agg(sum(col("cc")).as("tc"), count(lit(1)).as("v"))
    val p = (coalesce(col("cs"), lit(0L)) + 1L).cast("double") /
      (col("ts") + col("v")).cast("double")
    val q = (col("cc") + 1L).cast("double") /
      (col("tc") + col("v")).cast("double")
    val terms = corpus
      .crossJoin(broadcast(srcTot))
      .join(st, Seq("source", "token"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("ts"),
        struct(col("token"), (p * log(p / q)).as("t")).as("term"))
    terms.groupBy(col("source"), col("ts"))
      .agg(sort_array(collect_list(col("term"))).as("a"))
      .join(broadcast(nDocs), "source")
      .select(col("source"), col("n_docs"), col("ts").as("n_tokens"),
        round(aggregate(col("a"), lit(0.0d),
          (acc, x) => acc + x.getField("t")), 6).as("kl_source_corpus"))
      .orderBy("source")
  }

  /** Pareto-frontier document selection — the multi-objective cut a
    * curation pipeline runs when no single score ranks documents: keep
    * every document NOT dominated on (prose-likeness, content volume),
    * i.e. no other document is at least as good on both axes and
    * strictly better on one. Axes are exact integers — stopword parts
    * per million by floor division (the Gopher integer discipline; a
    * float ratio would put the frontier on ULP noise) and the
    * whitespace token count — so membership is bit-identical on both
    * engines.
    *
    * Distributed shape (never a global sort, never all-pairs over the
    * corpus): one map-side-combined aggregate collapses the corpus to
    * its (stop_ppm → max tokens) grid — BOUNDED at 10⁶+1 rows by the
    * ppm scale, corpus-size-independent — then the dominance test is
    * ONE [[Ranks.prefixMax]] pass in ppm-DESCENDING order (m(q) = max
    * tokens over all strictly-better ppm = the exclusive running max;
    * q survives iff its own max beats m(q)), and frontier documents
    * come back via one broadcast semi-join on the surviving
    * (ppm, tokens) cells. The prefix pass replaces the earlier
    * triangular inequality self-join over the grid — worst case that
    * join was quadratic in distinct-ppm cells (~5·10¹¹ comparisons at
    * the full 10⁶ grid), while the two-pass range-partitioned running
    * max is linear and never leaves the distributed plan. Within a
    * dominated ppm cell every document dies with it; within a
    * surviving cell exactly the max-token documents are non-dominated
    * — both facts fall out of the grid reduction, which is why the
    * corpus never self-joins.
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val stop = size(filter(toks,
      t => t.isInCollection(Seq("the", "a", "of", "and", "in", "to", "is"))))
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(toks).cast("long").as("t"),
        stop.cast("long").as("ns"))
      .filter(col("t") > 0L)
      .select(col("doc_id"), col("t"),
        expr("(1000000 * ns) div t").as("q"))
      .localCheckpoint() // feeds the grid and the member read-back
    val grid = scored.groupBy("q").agg(max(col("t")).as("tm"))
    // exclusive running max of tm in q-DESC order = max over strictly
    // better ppm (q is distinct after the groupBy, so the order is
    // total); NULL marks "no better cell exists"
    val better = Ranks.prefixMax(grid, "tm", "m", col("q").desc)
    val frontier = better
      .filter(col("m").isNull || col("tm") > col("m"))
      .select(col("q").as("fq"), col("tm").as("ftm"))
    scored.join(broadcast(frontier),
        col("q") === col("fq") && col("t") === col("ftm"))
      .select(col("doc_id"), col("t").as("n_tokens"),
        col("q").as("stop_ppm"))
      .orderBy("doc_id")
  }

  /** Documents per training micro-batch for [[paddingWaste]]. */
  val paddingBatchSize = 8

  /** Padding-waste audit (`q_padding_waste`) — the batching-efficiency
    * number a trainer reads before choosing a batching policy: when
    * fixed-size batches pad every member to the batch's longest
    * sequence, what fraction of the padded token grid is waste? Both
    * policies side by side, per language:
    *
    *  - `arrival`: batches of [[paddingBatchSize]] docs in doc_id
    *    order (the naive loader);
    *  - `length_sorted`: the same docs batched after sorting by
    *    length (the standard bucketing optimization — near-equal
    *    lengths per batch, minimal padding).
    *
    * Lengths are whitespace token counts (the q_pack_sequences
    * convention; the BPE-true twin discipline would compose here the
    * same way). All counting is exact integers — batch cost =
    * members·max(len), one shuffle per policy (per-lang rank window →
    * per-batch aggregate → per-lang aggregate); the waste share is
    * the single rounded division at the edge. Batch ranks are
    * per-LANGUAGE windows (bounded key space), never a global sort.
    */
  def paddingWaste(spark: SparkSession, dir: String): DataFrame =
    paddingWasteOver(Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("len")))

  /** [[paddingWaste]] with tokenizer-TRUE accounting
    * (`q_padding_waste_bpe`): identical batch policies and grids, but
    * member cost is the trained BPE's token count (the memoized
    * segmentation broadcast join — the E22g2 composition), so the
    * waste numbers describe the grids a real trainer pads. Whitespace
    * and BPE lengths rank documents DIFFERENTLY (a long word is one
    * whitespace token but many subwords), so even the length-sorted
    * policy's batch membership shifts — the twin is a distinct
    * measurement, not a rescale.
    */
  def paddingWasteBpe(spark: SparkSession, dir: String): DataFrame =
    paddingWasteOver(bpeDocTokens(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_tok").as("len")))

  /** Both padding policies over a (lang, doc_id, len) frame — one
    * shuffle per policy (per-LANG rank window → per-batch aggregate →
    * per-lang aggregate; bounded key space, never a global sort).
    */
  private def paddingWasteOver(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def policy(name: String, order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col("lang")).orderBy(order: _*)
      docs
        .withColumn("batch",
          ((row_number().over(w) - 1) / paddingBatchSize).cast("long"))
        .groupBy(col("lang"), col("batch"))
        .agg(count(lit(1)).as("members"), sum(col("len")).as("toks"),
          max(col("len")).as("max_len"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("members")).as("n_docs"),
          sum(col("toks")).as("tokens"),
          sum(col("members") * col("max_len")).as("padded_tokens"))
        .select(lit(name).as("method"), col("lang"), col("n_docs"),
          col("n_batches"), col("tokens"), col("padded_tokens"),
          when(col("padded_tokens") > 0,
            round((col("padded_tokens") - col("tokens")).cast("double") /
              col("padded_tokens").cast("double"), 6)).as("waste_share"))
    }
    policy("arrival", Seq(col("doc_id")))
      .unionByName(policy("length_sorted", Seq(col("len"), col("doc_id"))))
      .orderBy("method", "lang")
  }
}
