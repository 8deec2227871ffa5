package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over the duplication graph: PageRank on the
  * winnowed passage-overlap pairs ([[TextAnalysis.winnowPassagePairs]]
  * — docs sharing selected fingerprints). High-centrality documents
  * are the corpus's boilerplate/template hubs — text that overlaps
  * MANY other documents — which is exactly what a cleaning pipeline
  * wants surfaced rather than sampled into training data.
  *
  * Integer-exact iteration: ranks are scaled to [[prScale]] and every
  * step is integer arithmetic — contribution = r ⌊÷⌋ degree, update =
  * teleport + (85·Σ) ⌊÷⌋ 100 — so there is NO float anywhere, no
  * summation-order sensitivity, and the DuckDB oracle replays all
  * [[prIters]] iterations bit-exactly as unrolled CTEs (the k-means /
  * perceptron / BPE oracle discipline applied to graph iteration).
  *
  * Scale shape (100 TB): edges and ranks are tables keyed by node —
  * each iteration is one join-aggregate shuffled on the node id, the
  * standard distributed PageRank step; nothing collects but the
  * final rank's numPartitions-row offset table ([[Ranks.global]]).
  * The rank scale bounds overflow: a hub's incoming Σ contributions
  * is bounded only by the total mass N·prScale, and the update
  * multiplies that sum by dampNum BEFORE dividing, so the worst-case
  * intermediate is 85·N·prScale — at prScale=10⁹ the signed-64-bit
  * ceiling lands near N ≈ 1.1·10⁸ nodes. Shrink prScale (or fold the
  * damping into the per-edge contribution, re-deriving the oracle)
  * before ranking a graph past ~10⁸ nodes.
  */
object GraphRank {

  /** Fixed-point scale of one unit of rank mass. */
  val prScale = 1000000000L

  /** Damping 0.85 as an integer ratio, and the per-node teleport mass
    * (1 − d)·prScale — both exact.
    */
  val dampNum = 85L
  val dampDen = 100L
  val teleport: Long = (dampDen - dampNum) * prScale / dampDen

  /** Power-iteration count — enough to separate hubs from leaves on a
    * sparse dup graph; the oracle unrolls exactly this many.
    */
  val prIters = 3

  /** Triangle census of the duplication graph: node/edge/triangle
    * counts and the global clustering coefficient — the structure
    * audit that distinguishes a boilerplate CLIQUE (template shared by
    * a whole crawl — triangles everywhere) from chain-shaped
    * near-duplicate drift (few triangles), which decide different
    * cleaning actions (drop the template vs keep one representative).
    *
    * All-integer: triangles count ordered triples a<b<c via two joins
    * on the a<b edge list (each wedge keyed on its middle vertex, then
    * a semi-join closes it — the standard distributed triangle count;
    * at scale both joins shuffle on node ids, and the a<b orientation
    * means each triangle is found EXACTLY once with no 3× dedup);
    * wedges = Σ deg(deg−1)/2 exactly; the clustering coefficient
    * 3·triangles/wedges is the single rounded division.
    */
  def triangleStats(spark: SparkSession, dir: String): DataFrame =
    triangleStatsOf(TextAnalysis.winnowPassagePairs(spark, dir)
      .select(col("a_id"), col("b_id")).distinct().localCheckpoint())

  /** The census over any a<b edge list (planted-graph spec entry). */
  private[graft] def triangleStatsOf(e: DataFrame): DataFrame = {
    val nodes = e.select(col("a_id").as("id"))
      .unionByName(e.select(col("b_id").as("id"))).distinct()
    val deg = e.select(col("a_id").as("id"))
      .unionByName(e.select(col("b_id").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val wedges = deg.agg(sum(expr("d * (d - 1) div 2")).as("wedges"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b_id") === col("e2.a_id"))
      .select(col("e1.a_id").as("a"), col("e1.b_id").as("b"),
        col("e2.b_id").as("c"))
      .join(e.select(col("a_id").as("a"), col("b_id").as("c")),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(broadcast(tri))
      .crossJoin(broadcast(wedges))
      .select(col("n_nodes"), col("n_edges"), col("triangles"),
        col("wedges"),
        when(col("wedges") > 0,
          round(lit(3.0) * col("triangles") / col("wedges"), 6))
          .as("clustering"))
  }

  /** PageRank over the passage-overlap graph: (rank, doc_id, deg,
    * pr_scaled), hubs first. Nodes are the documents that appear in at
    * least one overlap pair (isolated documents carry no duplication
    * signal and stay out of the graph — and out of the O(nodes)
    * state).
    */
  def pagerankDupGraph(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextAnalysis.winnowPassagePairs(spark, dir)
      .select("a_id", "b_id")
    // symmetric edge list + degrees, reused every iteration
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var r = deg.select(col("src").as("id"), lit(prScale).as("r"))
    for (_ <- 1 to prIters) {
      val contrib = edges
        .join(r.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      r = deg.select(col("src").as("id"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("r"))
    }
    val ranked = r.join(deg.withColumnRenamed("src", "id"), "id")
    Ranks.global(ranked, "rank", col("r").desc, col("id"))
      .select(col("rank"), col("id").as("doc_id"), col("deg"),
        col("r").as("pr_scaled"))
      .orderBy("rank")
  }
}
