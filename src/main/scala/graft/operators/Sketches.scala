package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-size sketch structures for corpus statistics — the
  * skew-proof companions to the exact aggregations: state is O(sketch
  * size), never O(cardinality), so a single hot key or an unbounded
  * vocabulary cannot blow up the aggregation. (The HLL++ distinct
  * sketch lives in [[Analytics.approxUserCounts]]; this file holds
  * frequency sketches.)
  *
  * Hash-parity design: buckets come from md5 (the hash primitive
  * Spark and DuckDB share bit-for-bit), so the sketch — not just its
  * summary — is replayed exactly by the driver's oracle.
  */
object Sketches {

  /** Count-min depth (independent hash rows) and width (buckets per
    * row). Width 16 against a ~31-token synthetic vocabulary forces
    * real collisions, so the overestimate-then-min mechanics are
    * exercised, not vacuous; error bound is est − true ≤ εN with
    * ε = e/w at depth-many e⁻¹ confidences.
    */
  val cmsDepth = 4
  val cmsWidth = 16

  /** Hash row j: first 32 bits of md5(token ⧺ "#j"), mod width. */
  private def cmsBucket(j: Int, tok: Column): Column =
    conv(substring(md5(concat(tok, lit(s"#$j")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % cmsWidth

  /** Count-min sketch over corpus tokens, read back against exact
    * counts: (token, exact_n, cms_est) with est ≥ exact always and
    * est = min over rows of the token's cell.
    *
    * Shape: the corpus reduces once to (token, exact_n); the sketch
    * cells aggregate FROM that reduction (Σ exact_n per cell — by
    * linearity identical to incrementing per occurrence) and come
    * back as a broadcast of d·w cells. In the pure-streaming form the
    * same cells aggregate directly off the token stream with fixed
    * O(d·w) state and map-side combining — that form needs no vocab
    * table at all; it's built here from the reduction only because
    * the comparison output wants exact_n anyway.
    */
  def cmsTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_n"))
      .localCheckpoint() // tiny; feeds cells + estimates
    val hashed = (0 until cmsDepth).map(j =>
        vocab.select(col("token"), col("exact_n"), lit(j).as("row_j"),
          cmsBucket(j, col("token")).as("bucket")))
      .reduce(_ unionByName _)
    val cells = hashed.groupBy("row_j", "bucket")
      .agg(sum(col("exact_n")).as("cnt"))
    hashed.join(broadcast(cells), Seq("row_j", "bucket"))
      .groupBy("token", "exact_n")
      .agg(min(col("cnt")).as("cms_est"))
      .select("token", "exact_n", "cms_est")
      .orderBy("token")
  }
}
