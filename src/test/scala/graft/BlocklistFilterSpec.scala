package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Planted-density boundary cases for the blocklist gate
  * (`text_blocklist_filter`): the integer 5% cut 20·hits ≤ tokens is
  * pinned exactly AT the tie (kept), one token below it (dropped), on
  * a zero-hit document, on an all-blocklist document, and on a
  * MIXED-CASE hit (the case-fold rule: "Merge" hits "merge" and the
  * audit column records the folded list spelling).
  */
class BlocklistFilterSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("blocklist").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("density boundary, zero-hit, all-hit, and mixed-case fold") {
    assert(TextAnalysis.blocklistTerms === Seq("merge", "slow", "vector"),
      "fixture is built for this list")
    assert(TextAnalysis.blocklistMaxDensityNum === 1 &&
      TextAnalysis.blocklistMaxDensityDen === 20)
    val filler19 = Seq.fill(19)("ok").mkString(" ")
    val filler18 = Seq.fill(18)("ok").mkString(" ")
    val dir = writeDocs(Seq(
      // 20 tokens, 1 hit: 20·1 = 20 ≤ 20 — the TIE keeps
      (1L, s"merge $filler19"),
      // 19 tokens, 1 MIXED-CASE hit: 20 > 19 — dropped; hit_terms
      // records the folded "merge", not the raw "Merge"
      (2L, s"Merge $filler18"),
      // zero hits: n_hits 0, empty audit column, kept
      (3L, "clean text with nothing listed"),
      // every token blocklisted (4 hits, 3 distinct): density 1, dropped
      (4L, "merge slow Merge vector")))

    val got = TextAnalysis.blocklistFilter(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(6)))
    }.toMap

    // (n_tok, n_hits, n_terms, hit_terms, keep)
    assert(got(1L) === ((20L, 1L, 1L, "merge", true)))
    assert(got(2L) === ((19L, 1L, 1L, "merge", false)))
    assert(got(3L) === ((5L, 0L, 0L, "", true)))
    assert(got(4L) === ((4L, 4L, 3L, "merge,slow,vector", false)))
    // density is the one rounded division at the edge
    val dens = TextAnalysis.blocklistFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(dens(1L) === 0.05)
    assert(dens(4L) === 1.0)
  }
}
