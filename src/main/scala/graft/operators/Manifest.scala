package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-addressed dataset manifest — the release artifact that
  * certifies WHICH data a corpus build ran over: per table, the row
  * count and an order-insensitive content checksum (sum of per-row
  * 28-bit md5 slices over a canonical field encoding). Two manifests
  * equal ⟺ same logical content, regardless of file layout, row
  * order, or partitioning — the cross-engine, cross-layout analog of
  * [[graft.DataVersion]]'s source-file fingerprint (which is
  * physical: mtimes/sizes; this is logical).
  *
  * Canonical encoding (shared with the oracle, field by field):
  * integers/strings as-is, timestamps as epoch micros, money/measure
  * doubles as round(x·10⁴) integers (one double multiply + round —
  * identical IEEE ops both engines), embeddings as the positional
  * integer checksum Σ i·round(xᵢ·10⁴) (order-sensitive inside the
  * vector, exact); fields joined with the \u0001 separator, NULLs
  * (none in these tables) as empty strings via coalesce.
  *
  * Scale shape: one narrow map pass + map-side-combined 1-row
  * aggregate per table; the union is |tables| rows. Checksum bound:
  * 28-bit row hashes keep the int64 sum exact to ~3·10¹⁰ rows per
  * table — widen the sum to DECIMAL(38,0) past that (the
  * [[Analytics.orderStats]] discipline).
  */
object Manifest {

  private val sep = "\u0001"

  /** Per-table canonical field spec: (column, kind) with kind ∈
    * i (integer), s (string), ts (timestamp), m (money/measure
    * double, scale-4), emb (float vector).
    */
  val spec: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "i", "r_name" -> "s"),
    "nation" -> Seq("n_nationkey" -> "i", "n_name" -> "s",
      "n_regionkey" -> "i"),
    "customer" -> Seq("c_custkey" -> "i", "c_name" -> "s",
      "c_nationkey" -> "i", "c_acctbal" -> "m", "c_mktsegment" -> "s"),
    "supplier" -> Seq("s_suppkey" -> "i", "s_name" -> "s",
      "s_nationkey" -> "i", "s_acctbal" -> "m"),
    "part" -> Seq("p_partkey" -> "i", "p_name" -> "s", "p_brand" -> "s",
      "p_type" -> "s", "p_size" -> "i", "p_retailprice" -> "m"),
    "orders" -> Seq("o_orderkey" -> "i", "o_custkey" -> "i",
      "o_orderstatus" -> "s", "o_totalprice" -> "m", "o_orderdate" -> "ts",
      "o_orderpriority" -> "s"),
    "lineitem" -> Seq("l_orderkey" -> "i", "l_partkey" -> "i",
      "l_suppkey" -> "i", "l_linenumber" -> "i", "l_quantity" -> "m",
      "l_extendedprice" -> "m", "l_discount" -> "m", "l_tax" -> "m",
      "l_returnflag" -> "s", "l_linestatus" -> "s", "l_shipdate" -> "ts"),
    "events" -> Seq("event_id" -> "i", "ts" -> "ts", "user_id" -> "i",
      "event_type" -> "s", "value" -> "m", "props" -> "s"),
    "documents" -> Seq("doc_id" -> "i", "text" -> "s", "lang" -> "s",
      "source" -> "s", "n_chars" -> "i"),
    "embeddings" -> Seq("vec_id" -> "i", "embedding" -> "emb",
      "label" -> "i"))

  private def fieldCol(name: String, kind: String): Column = kind match {
    case "i" | "s" => coalesce(col(name).cast("string"), lit(""))
    case "ts" => coalesce(
      unix_micros(col(name).cast("timestamp")).cast("string"), lit(""))
    case "m" => coalesce(
      expr(s"CAST(round(CAST($name AS DOUBLE) * 10000) AS BIGINT)")
        .cast("string"), lit(""))
    case "emb" => coalesce(expr(
      s"""aggregate(zip_with($name, sequence(1, size($name)),
         | (x, i) -> i * CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
         | 0L, (acc, v) -> acc + v)""".stripMargin)
        .cast("string"), lit(""))
  }

  /** One frame's (table, n_rows, checksum) row — the spec entry point
    * (order-insensitivity and tamper-sensitivity are proven on frames
    * the test perturbs).
    */
  private[graft] def manifestOf(df: DataFrame, table: String,
                                fields: Seq[(String, String)]): DataFrame = {
    val encoded = fields.map { case (n, k) => fieldCol(n, k) }
    val joined = concat(encoded.flatMap(c => Seq(c, lit(sep)))
      .dropRight(1): _*)
    val h = conv(substring(md5(joined.cast("binary")), 1, 7), 16, 10)
      .cast("long")
    df.select(h.as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
      .select(lit(table).as("table_name"), col("n_rows"),
        coalesce(col("checksum"), lit(0L)).as("checksum"))
  }

  /** One table's (table, n_rows, checksum) row. */
  private def tableRow(spark: SparkSession, dir: String, table: String,
                       fields: Seq[(String, String)]): DataFrame =
    manifestOf(Tables(spark, dir, table), table, fields)

  /** The full manifest, one row per table, ordered by name. */
  def datasetManifest(spark: SparkSession, dir: String): DataFrame =
    spec.map { case (t, fs) => tableRow(spark, dir, t, fs) }
      .reduce(_ unionByName _)
      .orderBy("table_name")
}
