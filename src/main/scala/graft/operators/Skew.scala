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
}
