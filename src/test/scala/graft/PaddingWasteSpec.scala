package graft

import graft.operators.Sampling
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Hand-packed fixture for the padding-waste audit (`q_padding_waste`):
  * batch membership, the exact integer token grids, and both policies'
  * waste shares are pinned from first principles — including the case
  * where length-sorting eliminates padding ENTIRELY (the number the
  * audit exists to surface) and a below-batch-size language proving
  * batches never mix languages.
  */
class PaddingWasteSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("padwaste").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  /** A text with exactly `n` whitespace tokens. */
  private def toks(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("two-lang fixture: exact waste for both policies, per-lang batches") {
    assert(Sampling.paddingBatchSize === 8, "fixture is built for batch=8")
    // en: 16 docs alternating length 9, 1 in doc_id order.
    //  arrival: two batches of (9,1)*4 — toks 40, max 9, padded 72 each
    //   → waste (144-80)/144 = 0.444444
    //  length_sorted: eight 1s then eight 9s — padded 8 + 72 = 80 = toks
    //   → waste exactly 0.0 (the bucketing win the audit measures)
    val en = (1 to 16).map(i =>
      (i.toLong, toks(if (i % 2 == 1) 9 else 1), "en"))
    // de: 3 docs (below batch size) — one batch under EITHER policy;
    // if batching were global instead of per-lang these would pack
    // into en's second batch and every en number above would shift
    val de = Seq((101L, toks(2), "de"), (102L, toks(4), "de"),
      (103L, toks(6), "de"))
    val dir = writeDocs(en ++ de)

    val got = Sampling.paddingWaste(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))
    }.toMap

    assert(got.keySet === Set(("arrival", "en"), ("arrival", "de"),
      ("length_sorted", "en"), ("length_sorted", "de")))
    // (n_docs, n_batches, tokens, padded_tokens, waste_share)
    assert(got(("arrival", "en")) === ((16L, 2L, 80L, 144L, 0.444444)))
    assert(got(("length_sorted", "en")) === ((16L, 2L, 80L, 80L, 0.0)))
    // de fits one batch either way: toks 12, max 6, padded 18
    assert(got(("arrival", "de")) === ((3L, 1L, 12L, 18L, 0.333333)))
    assert(got(("length_sorted", "de")) === ((3L, 1L, 12L, 18L, 0.333333)))
  }

  test("length-sorted waste never exceeds arrival waste on real data") {
    val dir = "/root/testdata/sf0.001"
    val rows = Sampling.paddingWaste(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    val langs = rows.keys.map(_._2).toSet
    assert(langs.nonEmpty)
    langs.foreach { lang =>
      // same docs, same batch count ⇒ comparing padded grids directly
      assert(rows(("length_sorted", lang)) <= rows(("arrival", lang)),
        s"lang $lang")
    }
  }
}
