package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the "describe at scale" audit a warehouse runs on
  * every new drop before queries touch it: per column the row count,
  * null count, exact distinct cardinality, and lexicographic min/max
  * of the STRING form.
  *
  * The profile is deliberately defined over each column's canonical
  * string rendering (integers bare, decimals with their scale,
  * timestamps read off as dates) so one schema covers every column and
  * the min/max order is engine-independent bytewise comparison —
  * documented contract: min_val/max_val are lexicographic on that
  * form, not numeric. Doubles render identically cross-engine below
  * the scientific-notation threshold (orders totalprice tops out
  * ~6·10⁵, far under the 10⁷ switch).
  *
  * Shape (100 TB): one stack projection (ncols× row fan-out, purely
  * narrow) into ONE map-side-combined aggregate keyed by column name;
  * counts/min/max combine partially, and the exact distinct count is
  * the one genuinely shuffle-heavy term (partial distinct aggregation
  * — Spark's two-phase HashAggregate). A deployment that can tolerate
  * ±2% swaps `countDistinct` for `approx_count_distinct` and the rest
  * of the plan is unchanged (the `q_approx_distinct` precedent).
  */
object Profiling {

  /** The profiled projection of `orders`: every column in its
    * canonical string form, named.
    */
  private val orderCols: Seq[(String, String)] = Seq(
    "o_orderkey" -> "cast(o_orderkey as string)",
    "o_custkey" -> "cast(o_custkey as string)",
    "o_orderstatus" -> "o_orderstatus",
    "o_totalprice" -> "cast(o_totalprice as string)",
    "o_orderdate" -> "cast(cast(o_orderdate as date) as string)",
    "o_orderpriority" -> "o_orderpriority")

  /** Per-column profile of the orders table, one row per column. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val stackArgs = orderCols
      .map { case (n, e) => s"'$n', $e" }.mkString(", ")
    Tables(spark, dir, "orders")
      .select(expr(
        s"stack(${orderCols.size}, $stackArgs) as (col_name, val)"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
      .orderBy("col_name")
  }
}
