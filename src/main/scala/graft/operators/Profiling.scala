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

  /** The canonical-string stack projection of orders. */
  private def stacked(o: DataFrame): DataFrame = {
    val stackArgs = orderCols
      .map { case (n, e) => s"'$n', $e" }.mkString(", ")
    o.select(expr(s"stack(${orderCols.size}, $stackArgs) as (col_name, val)"))
  }

  /** Per-column profile of the orders table, one row per column. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    stacked(Tables.spread(spark, dir, "orders")) // spread: 6x stack + distinct partials
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
      .orderBy("col_name")

  /** The MERGEABLE per-slice profile state: scalar stats per column
    * plus the per-(column, register) HLL max-ρ table over the string
    * form — every piece merges by sum (counts), least/greatest
    * (min/max), or register-wise max (distinct sketch).
    */
  private def sliceState(o: DataFrame): (DataFrame, DataFrame) = {
    val st = stacked(o)
    val scal = st.groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
    val h = Sketches.hllHash(col("val"))
    val regs = st.filter(col("val").isNotNull)
      .select(col("col_name"),
        shiftright(h, Sketches.hllWordBits).as("reg"),
        Sketches.rhoExpr(h.bitwiseAND(lit((1L << Sketches.hllWordBits) - 1)))
          .as("rho"))
      .groupBy("col_name", "reg")
      .agg(max(col("rho")).as("max_rho"))
    (scal, regs)
  }

  /** Incremental column profile — the daily-ingest form of
    * [[columnProfile]] that completes the incremental family
    * (LSH/Bloom/dHash/CC deltas): the historical corpus
    * (o_orderkey % 10 ≠ 0) and the new batch (% 10 = 0) each reduce to
    * a MERGEABLE state — count sums, lexicographic min/max, and a
    * per-column 64-register HLL for distinct — and the merge
    * (sum / least / greatest / register-wise max) is provably equal to
    * a full recompute, which is exactly what the oracle states (it
    * profiles the whole table directly; slice-invariance of every
    * merged piece IS the theorem). At 100 TB the base state is a
    * frozen O(columns × registers) artifact: profiling a daily drop
    * never rescans history.
    *
    * The exact distinct count rides alongside as the honesty column
    * (the `dedup_bloom` convention) with the round-4 relative error —
    * at scale a deployment drops it and keeps only the sketch.
    */
  def profileIncremental(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val (bs, br) = sliceState(o.filter(expr("o_orderkey % 10 != 0")))
    val (ds, dr) = sliceState(o.filter(expr("o_orderkey % 10 = 0")))
    val scal = bs.unionByName(ds).groupBy("col_name")
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_null")).as("n_null"),
        min(col("min_val")).as("min_val"), max(col("max_val")).as("max_val"))
    val m = Sketches.hllRegisters
    val est = br.unionByName(dr)
      .groupBy("col_name", "reg").agg(max(col("max_rho")).as("max_rho"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_present"),
        sum(pow(lit(2.0), -col("max_rho"))).as("harm_present"))
      .select(col("col_name"),
        (lit(m.toLong) - col("n_present")).as("zeros"),
        (lit(Sketches.hllAlpha) * m * m /
          (col("harm_present") + (lit(m.toDouble) -
            col("n_present").cast("double")))).as("raw"))
      .select(col("col_name"),
        round(when(col("raw") <= lit(2.5) * m && col("zeros") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw")), 4).as("distinct_est"))
    val exact = stacked(o).filter(col("val").isNotNull)
      .groupBy("col_name").agg(countDistinct(col("val")).as("n_exact"))
    scal.join(est, "col_name").join(exact, "col_name")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_val"), col("max_val"), col("distinct_est"), col("n_exact"),
        when(col("n_exact") > 0,
          round(abs(col("distinct_est") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 4)).as("rel_err"))
      .orderBy("col_name")
  }
}
