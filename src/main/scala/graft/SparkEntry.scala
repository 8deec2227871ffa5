package graft

import graft.operators.{Analytics, EventsCdc}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in
  * [[oracleSql]] (DuckDB-runnable over the same parquet tables) unless
  * the operator is not SQL-expressible. Column names and types are
  * aligned pairwise; floating aggregates use exact DECIMAL arithmetic
  * cast back to DOUBLE on both sides so hashes match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the CDC FINAL view over the events change log.
    */
  def entry(spark: SparkSession): DataFrame =
    EventsCdc.latestEvents(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — CDC operator family over the events change log (SURVEY §2.1-2.4)
    "cdc_final" -> (EventsCdc.latestEvents _),
    "cdc_final_agg" -> (EventsCdc.latestEventsAgg _),
    "cdc_mv_projection" -> (EventsCdc.mvProjection _),
    "cdc_changelog_scan" -> (EventsCdc.changelogScan _),
    "cdc_backfill_union" -> (EventsCdc.backfillUnion _),
    "cdc_count_parity" -> (EventsCdc.finalCount _),
    "cdc_hourly_stats" -> (EventsCdc.hourlyEventStats _),
    // — generic analytics surface (SURVEY §2.5)
    "q1_pricing_summary" -> (Analytics.pricingSummary _),
    "q3_top_revenue_orders" -> (Analytics.topRevenueOrders _),
    "q5_nation_revenue" -> (Analytics.nationRevenue _),
    "q_topk_orders" -> (Analytics.topKOrders _),
    "q_window_topn_per_customer" -> (Analytics.topOrdersPerCustomer _),
    "q_intersect_customers" -> (Analytics.intersectCustomers _),
    "q_except_customers" -> (Analytics.exceptCustomers _),
    "q_semijoin_big_spenders" -> (Analytics.bigSpenders _),
    "q_antijoin_never_shipped" -> (Analytics.neverShippedParts _),
    "q_distinct_flag_status" -> (Analytics.distinctFlagStatus _),
    "q_rollup_orders" -> (Analytics.orderRollup _),
    "q_monthly_orders" -> (Analytics.monthlyOrders _),
    "q_json_props" -> (Analytics.eventPropsAgg _),
  )

  /** DuckDB-runnable oracle per query (driver compares hashes at sf0.01). */
  def oracleSql: Map[String, String] = Map(
    "cdc_final" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "cdc_final_agg" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "cdc_mv_projection" ->
      """SELECT event_id AS version, user_id AS key,
        |  CASE WHEN event_type = 'signup' THEN 'c'
        |       WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
        |  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_deleted,
        |  ts, value
        |FROM events
        |WHERE event_type IN ('signup','click','view','purchase','error')
        |ORDER BY version""".stripMargin,
    "cdc_changelog_scan" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('click','purchase') AND value > 150
        |ORDER BY event_id""".stripMargin,
    "cdc_backfill_union" ->
      """WITH snapshot AS (
        |  SELECT DISTINCT user_id, CAST(0 AS BIGINT) AS event_id,
        |         'snapshot' AS event_type
        |  FROM events WHERE event_id < 1000),
        |live AS (
        |  SELECT user_id, event_id, event_type FROM events WHERE event_id >= 1000),
        |unioned AS (SELECT * FROM snapshot UNION ALL SELECT * FROM live)
        |SELECT user_id, event_id, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM unioned) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc_count_parity" ->
      """SELECT count(*) AS n FROM (
        |  SELECT user_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
        |         event_type
        |  FROM events) t
        |WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "cdc_hourly_stats" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue_orders" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_window_topn_per_customer" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_intersect_customers" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q_except_customers" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY c_custkey""".stripMargin,
    "q_semijoin_big_spenders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_antijoin_never_shipped" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q_distinct_flag_status" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS turnover
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_monthly_orders" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS turnover
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
