package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: TF-IDF keyword
  * extraction and BM25 relevance scoring — the term-statistics
  * counterpart to the embedding-based [[Similarity]] surface (real
  * corpus tooling runs both: BM25 recalls, vectors re-rank).
  *
  * Scale shape (100 TB): the only corpus-sized intermediate is the
  * exploded token table, reduced immediately by a map-side-combined
  * (doc, token) count; document frequency and the corpus-size scalar
  * aggregate FROM that reduction (vocab-sized / 1 row) and come back
  * as broadcasts — the corpus is scanned once and shuffled once, on
  * the (doc, token) count key.
  *
  * Float parity with the DuckDB oracle: ranking never compares
  * doubles — TF-IDF ranks on (tf DESC, df ASC, token), integers all
  * the way down — and every reported score is a fixed-shape
  * expression over identical integer inputs, rounded to 4 decimals
  * (ln is the one libm call; one ULP cannot move the 4th decimal off
  * a boundary). BM25's per-document sum is written as a fixed-order
  * chain over the query terms, not a float `sum()`, so aggregation
  * order can't reorder the additions.
  */
object Retrieval {

  private def tokens = split(trim(col("text")), " ")

  /** (doc_id, token, tf) — one narrow pass + one map-side-combined
    * count; the shared front half of both scorers.
    */
  private def termFreq(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  /** Top-k keywords per document by TF-IDF. Rank order is
    * (tf DESC, df ASC, token ASC) — the same ordering tf·idf induces
    * for a fixed corpus, stated on integers so no float comparison
    * decides a rank. The reported score is tf · ln(N/df).
    */
  def tfidfKeywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // materialized once: df aggregates FROM tf — without the checkpoint
    // the exploded-token scan runs twice (cluster analog: write the tf
    // table, then derive df from it)
    val tf = termFreq(spark, dir).localCheckpoint()
    // df/N aggregate from the (vocab-sized) tf table, not the corpus
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = Tables(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(n))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("token"), col("tf"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4)
          .as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  /** The fixed query the BM25 row scores the corpus against: one rare
    * term (high idf) and two common ones — exercises the full idf
    * range of the synthetic vocabulary.
    */
  val bm25QueryTerms = Seq("dup", "customer", "vector")
  val bm25K1 = 1.2
  val bm25B = 0.75

  /** Okapi BM25 score of every document matching ≥1 query term, with
    * the robust idf ln(1 + (N−df+0.5)/(df+0.5)). Term contributions
    * are pivoted into fixed columns and added in declaration order —
    * a deterministic float sum (see class doc). `avgdl` is the exact
    * integer token total divided once, not a running float mean.
    */
  def bm25Scores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val dl = docs.select(col("doc_id"), size(tokens).cast("long").as("dl"))
    val globals = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n_docs"))
    val tf = termFreq(spark, dir)
      .filter(col("token").isInCollection(bm25QueryTerms))
      .localCheckpoint() // tiny (matched terms only); feeds tf and df
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(globals))
      .select(col("doc_id"), col("token"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * (bm25K1 + 1.0)) /
          (col("tf") + lit(bm25K1) *
            (lit(1.0 - bm25B) + lit(bm25B) * col("dl") / col("avgdl"))))
          .as("c"))
    // fixed-order sum: one conditional max per query term, added in
    // bm25QueryTerms order (each (doc, token) group holds ≤1 row)
    val perTerm = bm25QueryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("token") === t, col("c"))).as(s"c$i")
    }
    val total = bm25QueryTerms.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _)
    contrib.groupBy("doc_id")
      .agg(perTerm.head, perTerm.tail: _*)
      .withColumn("n_terms",
        bm25QueryTerms.indices
          .map(i => when(col(s"c$i").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
      .select(col("doc_id"), col("n_terms"), round(total, 4).as("bm25"))
      .orderBy("doc_id")
  }

  /** Reciprocal-rank-fusion constants: the standard k=60 damping, two
    * top-50 input lists, top-20 fused output. The dense side's query
    * is the embedding of a fixed corpus vector (doc ids and vec ids
    * share the id space in the synthetic corpus).
    */
  val rrfK = 60
  val rrfDepth = 50
  val rrfTop = 20
  val rrfQueryVec = 42L

  /** Hybrid retrieval: BM25 (lexical, the fixed [[bm25QueryTerms]]
    * query) fused with cosine nearest-neighbors of a fixed query
    * vector by reciprocal-rank fusion, rrf = Σ 1/(k + rank) — the
    * recall-then-fuse pattern every hybrid search stack runs.
    *
    * Determinism: both input rankings order by (rounded score DESC,
    * id) — integer ranks come out; the fused score is a fixed
    * two-term sum of exact-operand divisions (dense term + sparse
    * term, in that order), rounded to 6, with id as the final
    * tiebreak. No float aggregation anywhere.
    *
    * Scale shape: each side is its production operator (BM25's one
    * scan + one (doc, token) shuffle; the dense side a 1-row
    * broadcast against the corpus) cut to its top-depth by
    * `orderBy().limit()` — a TakeOrderedAndProject, the distributed
    * per-partition-top-k + driver-merge — so the corpus never flows
    * through a global window. Ranks are then assigned INSIDE the
    * bounded 50-row results ([[Ranks.boundedRank]]'s broadcast
    * join-count), and the fused frame (≤100 rows) ranks the same way.
    */
  /** nDCG cut-off and the per-rank discount constants 1/log₂(r+1),
    * r = 1..k — computed ONCE here and embedded as the SAME double
    * literals in the oracle SQL (the affine-MinHash / Benford
    * constants discipline: Double.toString round-trips exactly, so no
    * libm call on either engine meets the hash).
    */
  val ndcgK = 10
  val ndcgDiscounts: Seq[Double] =
    (1 to ndcgK).map(r => math.log(2.0) / math.log(r + 1.0))

  /** Graded-relevance ranking quality of the production BM25 ranking —
    * the standard nDCG@k eval the retrieval family (BM25, RRF fusion,
    * recall audits) was missing: gain 2^rel − 1, discount 1/log₂(r+1),
    * nDCG = DCG@k / IDCG@k with the ideal ranking ordered by rel DESC.
    *
    * Relevance labels: rel = n_terms, the count of distinct query
    * terms the document contains (0–3 graded) — independent enough of
    * the BM25 ordering (which weighs tf·idf, not term coverage) that
    * nDCG is non-trivially below 1 on a real corpus, while a perfect
    * coverage-ordered ranking scores exactly 1 (spec-pinned with
    * planted perfect/inverted rankings).
    *
    * Determinism: both rankings order by (score DESC, doc_id) over the
    * ROUNDED bm25 (the rrf sparse-side discipline) with integer ranks
    * from [[Ranks.boundedRank]] inside the TakeOrdered-bounded top-k
    * frame; gains are exact integers; DCG is a FIXED-ORDER sum of k
    * pivoted per-rank terms (the bm25 conditional-max discipline) each
    * gain·discount with the shared literal discounts — one association
    * order on both engines; single round-6 read-offs, NULL nDCG when
    * IDCG = 0 (no candidates), never an ANSI 0/0.
    *
    * Scale shape: the corpus reduces to the matched-candidate frame
    * (BM25's one scan + one (doc, token) shuffle), each top-k is a
    * TakeOrderedAndProject, and everything after is ≤ k rows.
    */
  def ndcgQuality(spark: SparkSession, dir: String): DataFrame = {
    val cand = bm25Scores(spark, dir)
      .select(col("doc_id"), col("n_terms").as("rel"), col("bm25"))
      .localCheckpoint() // candidate frame feeds both rankings + count
    val n = cand.agg(count(lit(1)).as("n_candidates"))
    val sys = Ranks.boundedRank(
      cand.orderBy(col("bm25").desc, col("doc_id")).limit(ndcgK),
      "rank", "bm25", "doc_id")
    val ideal = Ranks.boundedRank(
      cand.orderBy(col("rel").desc, col("doc_id")).limit(ndcgK),
      "rank", "rel", "doc_id")
    dcgOf(sys, "dcg").crossJoin(dcgOf(ideal, "idcg")).crossJoin(n)
      .select(lit(ndcgK.toLong).as("k"), col("n_candidates"),
        round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        when(col("idcg") > 0.0, round(col("dcg") / col("idcg"), 6))
          .as("ndcg"))
  }

  /** DCG@k of a (rank, rel) frame as ONE row: per-rank gains pivoted
    * into fixed columns (each rank holds ≤1 row), then the
    * declaration-order sum Σ gain_r · discount_r — engine-identical
    * association. Shared by the system and ideal sides and by the
    * planted-ranking specs.
    */
  private[graft] def dcgOf(ranked: DataFrame, out: String): DataFrame = {
    val gain = (expr("shiftleft(1L, CAST(rel AS INT))") - 1L)
      .cast("double")
    val cols = (1 to ndcgK).map(r =>
      max(when(col("rank") === r, gain)).as(s"g$r"))
    val dcg = (1 to ndcgK).map(r =>
        coalesce(col(s"g$r"), lit(0.0)) * lit(ndcgDiscounts(r - 1)))
      .reduce(_ + _)
    ranked.agg(cols.head, cols.tail: _*).select(dcg.as(out))
  }

  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val sparseTop = bm25Scores(spark, dir)
      .select(col("doc_id").as("id"), col("bm25"))
      .orderBy(col("bm25").desc, col("id")).limit(rrfDepth)
    val sparse = Ranks.boundedRank(sparseTop, "r_sparse", "bm25", "id")
      .select(col("id"), col("r_sparse"))
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("nrm",
        sqrt(graft.functions.DotProductD(col("embedding"), col("embedding"))))
    val q = emb.filter(col("vec_id") === rrfQueryVec)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val denseTop = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= rrfQueryVec)
      .select(col("vec_id").as("id"),
        round(graft.functions.DotProductD(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(rrfDepth)
    val dense = Ranks.boundedRank(denseTop, "r_dense", "cos", "id")
      .select(col("id"), col("r_dense"))
    val fused = dense.join(sparse, Seq("id"), "full_outer")
      .select(col("id"), col("r_dense"), col("r_sparse"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("r_dense")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("r_sparse")), lit(0.0)), 6)
          .as("rrf"))
    Ranks.boundedRank(fused, "rank", "rrf", "id")
      .filter(col("rank") <= rrfTop)
      .select("rank", "id", "r_dense", "r_sparse", "rrf")
      .orderBy("rank")
  }
}
