package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of [[graft.operators.Associations.marketBasket]]:
  * live pair-count maintenance over a basket stream, so the
  * co-purchase dashboard updates as orders land instead of waiting for
  * the nightly batch.
  *
  * Input contract: one row per COMPLETE basket with `items` the
  * basket's DISTINCT item ids SORTED ascending (the CDC-compacted
  * order form — an order's lines are folded into one array before
  * they enter the stream; a raw line-item stream would need per-order
  * buffering first, the [[StreamingFunnel]] timer pattern, because a
  * pair can only be counted once its whole basket is visible).
  *
  * Shape: the pair expansion is a STATELESS per-row flatten — element
  * i pairs with every later element, so sortedness makes (p1, p2)
  * canonical with p1 < p2 and C(k,2) rows exactly — and the only
  * state is the running count per distinct co-occurrence pair
  * (update mode, map-side combined), never basket history. Per-pair
  * equality with the batch self-join form is spec-pinned
  * (StreamingBasketSpec) — two independent formulations, one count.
  */
object StreamingBasket {

  /** Running pair counts over a `(items: array<long>)` basket stream;
    * emits `(p1, p2, n_both)` with p1 < p2.
    */
  def pairCounts(baskets: DataFrame): DataFrame =
    baskets
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "y -> struct(x AS p1, y AS p2))))")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_both"))
}
