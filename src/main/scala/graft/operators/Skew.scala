package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation tooling for hot join keys.
  *
  * AQE's skew-join rule (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) already splits oversized sort-merge partitions at
  * runtime; salting remains the tool for the cases it does not reach —
  * a hash-partitioned join whose single hottest key exceeds one
  * executor, or a pre-partitioned layout that must stay stable across
  * stages. The classic trade: the big side's hot partitions split
  * `saltBuckets` ways at the cost of replicating the small side
  * `saltBuckets`×, so keep the small side genuinely small.
  */
object Skew {

  /** Inner equi-join with a salted key: the big side gets a
    * deterministic per-row salt in `[0, saltBuckets)` (hash of all
    * columns — no RNG, so retries/replays place rows identically), the
    * small side is replicated once per salt value, and the join runs on
    * `(key, salt)` — spreading a hot key over `saltBuckets` reducers.
    * Result set is exactly the plain inner join's.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2, got $saltBuckets")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver-checkable query: revenue per supplier through the salted
    * join — the result is identical to the plain join (the oracle
    * states the plain SQL), the plan spreads each supplier key over 8
    * salt buckets before the aggregate.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    saltedJoin(li, sup, "l_suppkey", saltBuckets = 8)
      .groupBy(col("s_name"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount")).cast(dec)).cast("double"), 4)
          .as("revenue"))
      .orderBy("s_name")
  }

  /** A key counts as HOT (remedy-worthy) when its count reaches this
    * multiple of the mean key count — below it the partitioner is
    * already balanced and any remedy only adds shuffle width. The
    * [[joinKeySkew]] remedy column tests it in exact integers
    * (cnt·n_keys ≥ ratio·n_rows), never on the rounded double.
    */
  val hotKeyRatio = 2L

  /** Join-key skew diagnostic — the measurement that decides whether
    * [[saltedSupplierRevenue]]'s salting is worth its fan-out: the
    * top-k heaviest join keys with each key's row share, its skew
    * ratio (count ÷ mean count), and the REMEDY adjudication: a ratio
    * near 1 says the partitioner is already balanced and any remedy
    * only adds shuffle width; a hot key (≥ [[hotKeyRatio]]× mean)
    * first gets AQE's runtime skew-join split — on by default, it
    * subdivides the oversized sort-merge partitions with no plan
    * change and no small-side replication (spec-pinned in SkewSpec:
    * the executed plan marks the join `skew=true`) — and manual
    * salting remains the fallback for what AQE cannot reach: a single
    * key too large for ONE executor even after splitting (AQE splits
    * between keys' partitions, not within a key's sort group on the
    * build side... more precisely it splits by data size so a single
    * monster key still lands its matches together on the probe side),
    * or a pre-partitioned layout that must stay identical across
    * stages. Measure first, let AQE split second, salt last.
    *
    * Shape: one map-side-combined key count (key-cardinality-sized),
    * a TakeOrdered top-k, and ranks via [[Ranks.boundedRank]] on the
    * k-row frame — no global window, no second pass over the fact
    * table. Counts are exact integers; share and ratio are one
    * rounded division each; the remedy compares exact integers so the
    * verdict can never flip on a rounding boundary.
    */
  def joinKeySkew(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val counts = Tables(spark, dir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("l_suppkey")).limit(k)
    val d38 = "decimal(38,0)"
    Ranks.boundedRank(top, "rk", "cnt", "l_suppkey")
      .crossJoin(broadcast(totals))
      .select(col("rk"), col("l_suppkey"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("cnt").cast("double") * col("n_keys") / col("n_rows"), 4)
          .as("skew_ratio"),
        when(expr(s"cast(cnt as $d38) * n_keys >= " +
            s"$hotKeyRatio * cast(n_rows as $d38)"),
          lit("aqe-skew-join; salt only if one key exceeds an executor"))
          .otherwise(lit("none: balanced, remedies only add shuffle width"))
          .as("remedy"))
      .orderBy("rk")
  }
}
