package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — tokenizer
  * induction over the corpus, the standard subword-vocabulary
  * construction (Sennrich et al.) every LLM data pipeline runs before
  * tokenizing.
  *
  * Shape: the corpus reduces ONCE to weighted word types (the only
  * corpus-sized pass); training then iterates over the word-type
  * table — each round one map-side-combined pair count (output:
  * symbol-pair vocabulary, tiny), an O(1) driver argmax for the best
  * pair, and a narrow per-word merge application. At web scale the
  * word-type table is millions of rows against a corpus of trillions
  * of tokens — the 1000× reduction is what makes iterating affordable,
  * and each round's shuffle carries pair counts, never text.
  *
  * Determinism: best pair = max count, ties to lexicographically
  * smallest (left, right) — replay-stable, no RNG.
  */
object BpeTrainer {

  /** Merge rounds for the registered query (small vocab ⇒ few rounds
    * exhaust the interesting pairs).
    */
  val defaultMerges = 8

  /** Left-to-right, non-overlapping application of merge (a, b) to a
    * symbol array — the classic BPE scan ("aaa" + (a,a) → ["aa","a"]) —
    * as a pure `aggregate` fold with (accumulated, pending) state.
    * Interpreted HOF, but per WORD TYPE per round, not per token.
    */
  private def applyMerge(sym: Column, a: String, b: String): Column = {
    val emptyAcc = array().cast("array<string>")
    val noPend = lit(null).cast("string")
    aggregate(
      sym,
      struct(emptyAcc.as("acc"), noPend.as("pend")),
      (st, x) => {
        val acc = st.getField("acc")
        val pend = st.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), x.as("pend")))
          .when(pend === lit(a) && x === lit(b),
            struct(concat(acc, array(lit(a + b))).as("acc"), noPend.as("pend")))
          .otherwise(struct(concat(acc, array(pend)).as("acc"), x.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
  }

  /** Adjacent symbol pairs of a word, weighted by its corpus count. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("sym")) > 1)
      .select(col("n"), explode(zip_with(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1),
        (x, y) => struct(x.as("left"), y.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("n"))

  /** Train `merges` BPE merge rules over the corpus; returns the merge
    * table (rank, left, right, merged, n) in training order. Stops
    * early if no pair repeats.
    */
  def train(spark: SparkSession, dir: String,
            merges: Int = defaultMerges): DataFrame = {
    import spark.implicits._
    // the one corpus-sized pass: whitespace word types with counts,
    // split into character symbols + the end-of-word marker
    var vocab = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(split(col("w"), ""), array(lit("</w>"))).as("sym"), col("n"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 1L
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
      else {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        learned += ((rank, a, b, a + b, n))
        vocab = vocab.select(applyMerge(col("sym"), a, b).as("sym"), col("n"))
          .localCheckpoint() // bound lineage: one materialization per round
        rank += 1
      }
    }
    learned.toSeq.toDF("rank", "left", "right", "merged", "n")
  }

  /** Train-then-apply: segment the corpus with the learned merges and
    * report per-language subword fertility (subwords per whitespace
    * token) before/after BPE. Application runs on the WORD-TYPE table
    * (merges applied in rank order), then rejoins the corpus by word
    * via broadcast — the corpus itself is never re-segmented row by
    * row. The fertility drop vs raw characters is the metric tokenizer
    * training optimizes.
    */
  def fertility(spark: SparkSession, dir: String,
                merges: Int = defaultMerges): DataFrame = {
    val ruleRows = train(spark, dir, merges)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    var types = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .distinct()
      .select(col("w"), concat(split(col("w"), ""), array(lit("</w>"))).as("sym"))
    ruleRows.foreach { case (a, b) =>
      types = types.select(col("w"), applyMerge(col("sym"), a, b).as("sym"))
    }
    val segmented = types
      .select(col("w"), size(col("sym")).cast("long").as("n_subwords"))
    Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(trim(col("text")), " ")).as("w"))
      .join(broadcast(segmented), "w")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(length(col("w")) + 1).cast("long").as("n_chars_eow"))
      .select(col("lang"), col("n_words"),
        (col("n_subwords").cast("double") / col("n_words")).as("bpe_fertility"),
        (col("n_chars_eow").cast("double") / col("n_words")).as("char_fertility"))
      .orderBy("lang")
  }
}
