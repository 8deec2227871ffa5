package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Association-rule mining over order baskets — the co-purchase
  * analytics a warehouse serves ("customers who bought X also
  * bought Y"), reduced to its exact, deterministic core: frequent item
  * PAIRS with support, confidence, and lift.
  *
  * Scale notes (100 TB):
  *  - the pair generator self-joins the basket table on the order key
  *    ONLY — fan-out per order is C(k,2) with k the basket width
  *    (bounded small by the domain, ~4 here), never corpus-quadratic;
  *  - the a-priori downward-closure prune runs first: an item pair can
  *    reach the support floor only if BOTH items do, so the basket
  *    table is semi-joined against the (broadcast, item-universe-sized)
  *    frequent-item set before any pair is formed;
  *  - item counts and the basket total are map-side-combined
  *    aggregates; the two stats joins onto the (post-floor, small)
  *    pair frame broadcast the item-count side.
  */
object Associations {

  /** Minimum orders a pair must co-occur in. Spelled as an integer
    * floor (never a fractional support cut) so the predicate is exact
    * on both engines at every scale factor.
    */
  val pairSupportFloor = 2

  /** Frequent item pairs over `lineitem` baskets: for every pair of
    * parts co-ordered in ≥ [[pairSupportFloor]] orders, the pair count,
    * each item's order count, support = n_both/N, confidence(p1→p2) =
    * n_both/n_p1, and lift = n_both·N/(n_p1·n_p2).
    *
    * Float discipline: every metric is a fixed expression over exact
    * int64 counts evaluated in double (products stay far below 2⁵³)
    * and rounded at 6 — the multiplication/division order is stated
    * identically in the oracle.
    */
  def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.spread(spark, dir, "lineitem") // spread: 6M-row distinct partials
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // feeds the total, item counts, and the pair join
    val nBaskets = items.agg(countDistinct(col("o")).as("n_baskets"))
    val itemCnt = items.groupBy("p").agg(count(lit(1)).as("n_item"))
      .localCheckpoint() // item-universe-sized: broadcast below
    // a-priori prune: only items that individually clear the floor can
    // be half of a pair that clears it
    val frequent = itemCnt.filter(col("n_item") >= pairSupportFloor)
      .select("p")
    val pruned = items.join(broadcast(frequent), Seq("p"), "left_semi")
    val pairs = pruned.as("a")
      .join(pruned.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= pairSupportFloor)
    val nD = col("n_baskets").cast("double")
    pairs
      .join(broadcast(itemCnt.select(col("p").as("p1"),
        col("n_item").as("n_p1"))), "p1")
      .join(broadcast(itemCnt.select(col("p").as("p2"),
        col("n_item").as("n_p2"))), "p2")
      .crossJoin(broadcast(nBaskets))
      .select(col("p1"), col("p2"), col("n_both"), col("n_p1"), col("n_p2"),
        round(col("n_both").cast("double") / nD, 6).as("support"),
        round(col("n_both").cast("double") / col("n_p1").cast("double"), 6)
          .as("confidence"),
        round(col("n_both").cast("double") * nD /
          (col("n_p1").cast("double") * col("n_p2").cast("double")), 6)
          .as("lift"))
      .orderBy("p1", "p2")
  }

  /** Frequent item TRIPLES — the next A-priori level over the same
    * baskets: for every part triple co-ordered in ≥
    * [[pairSupportFloor]] orders, the triple count, the (p1,p2) pair
    * count, support = n_all/N, and confidence((p1,p2)→p3) =
    * n_all/n_p12 — both round-6 single divisions of exact int64s.
    *
    * Scale notes (100 TB), beyond [[marketBasket]]'s:
    *  - downward closure runs at BOTH levels: items prune to the
    *    frequent-item set before any pair forms, and the (a,b) leg
    *    semi-joins against the frequent-PAIR set before the third item
    *    joins — a triple can only reach the floor if all three of its
    *    sub-pairs did, so the candidate fan-out after the prune is
    *    bounded by the frequent-pair census, not C(k,3);
    *  - the frequent-pair set is floor-cut and item-universe²-bounded;
    *    it broadcasts here, and past broadcast size the same semi-joins
    *    run as shuffle joins unchanged (AQE picks);
    *  - basket width k is schema-bounded (≤ 7 lineitems/order), so even
    *    the raw per-order expansion is a constant, never corpus-scaled.
    */
  def basketTriples(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.spread(spark, dir, "lineitem") // spread: 6M-row distinct partials
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // feeds the total, item counts, pairs, triples
    val nBaskets = items.agg(countDistinct(col("o")).as("n_baskets"))
    val itemCnt = items.groupBy("p").agg(count(lit(1)).as("n_item"))
    val frequent = itemCnt.filter(col("n_item") >= pairSupportFloor)
      .select("p")
    val pruned = items.join(broadcast(frequent), Seq("p"), "left_semi")
      .localCheckpoint() // both the pair pass and the triple legs scan it
    val pairs = pruned.as("a")
      .join(pruned.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.o").as("o"), col("a.p").as("p1"), col("b.p").as("p2"))
    val freqPairs = pairs.groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_p12"))
      .filter(col("n_p12") >= pairSupportFloor)
      .localCheckpoint() // floor-cut pair census: broadcast below
    // A-priori: the (p1,p2) leg must itself be frequent before the
    // third item joins; the (p1,p3)/(p2,p3) closures prune after
    val ab = pairs.join(broadcast(freqPairs.select("p1", "p2")),
      Seq("p1", "p2"), "left_semi")
    val abc = ab.join(pruned.select(col("o"), col("p").as("p3")), "o")
      .filter(col("p2") < col("p3"))
      .join(broadcast(freqPairs.select(col("p1"),
        col("p2").as("p3"))), Seq("p1", "p3"), "left_semi")
      .join(broadcast(freqPairs.select(col("p1").as("p2"),
        col("p2").as("p3"))), Seq("p2", "p3"), "left_semi")
    abc.groupBy("p1", "p2", "p3")
      .agg(count(lit(1)).as("n_all"))
      .filter(col("n_all") >= pairSupportFloor)
      .join(broadcast(freqPairs), Seq("p1", "p2"))
      .crossJoin(broadcast(nBaskets))
      .select(col("p1"), col("p2"), col("p3"), col("n_all"), col("n_p12"),
        round(col("n_all").cast("double") /
          col("n_baskets").cast("double"), 6).as("support"),
        round(col("n_all").cast("double") / col("n_p12").cast("double"), 6)
          .as("confidence"))
      .orderBy("p1", "p2", "p3")
  }
}
