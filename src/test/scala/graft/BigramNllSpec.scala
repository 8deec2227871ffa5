package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Stupid-backoff bigram LM scoring: hand-computed corpus pins the
  * seen path (C/ctx), the backoff path (α·(uni+1)/(N+V+1)), the
  * backoff counter, and the lang-absent degradation to −ln α.
  */
class BigramNllSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bnll").toString
    rows.map { case (id, text, lang) => (id, text, lang, "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand corpus: seen bigrams score C/ctx, unseen take the add-one backoff") {
    // train (doc 0): "a b a b c" → C2(a,b)=2 (b,a)=1 (b,c)=1;
    // ctx(a)=2 ctx(b)=2; uni(a)=1 uni(b)=2 uni(c)=1; N=4, V=3
    val dir = writeDocs(Seq(
      (0L, "a b a b c", "en"),
      (1L, "a b x", "en")))
    val row = TextAnalysis.bigramNll(spark, dir).collect()
    assert(row.length === 1, "only the odd half is scored")
    val r = row.head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(2) === 2L, "two bigrams in 'a b x'")
    assert(r.getLong(3) === 1L, "(b,x) is unseen → one backoff")
    // (a,b): ln(2/2) = 0; (b,x): ln(0.4·(0+1)/(4+3+1)) = ln(0.05)
    val want = BigDecimal(-(math.log(1.0) + math.log(0.4 * 1.0 / 8.0)) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === want)
  }

  test("language absent from the train half degrades to −ln α, never a throw") {
    // doc 3 is the only 'de' doc and sits in the score half: every
    // bigram backs off with uni=0, N=0, V=0 → score = α·1/1 = α
    val dir = writeDocs(Seq(
      (0L, "a b c", "en"),
      (3L, "p q r", "de")))
    val got = TextAnalysis.bigramNll(spark, dir)
      .filter(col("lang") === "de").collect().head
    assert(got.getLong(3) === 2L, "both bigrams back off")
    val want = BigDecimal(-math.log(TextAnalysis.backoffAlpha))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(4) === want)
  }

  test("repeated bigram multiplies, duplicate fold terms stay deterministic") {
    // val doc "a b a b a b": (a,b)×3 seen (tf-weighted), (b,a)×2 seen
    val dir = writeDocs(Seq(
      (0L, "a b a b c", "en"),
      (1L, "a b a b a b", "en")))
    val r = TextAnalysis.bigramNll(spark, dir).collect().head
    assert(r.getLong(2) === 5L)
    assert(r.getLong(3) === 0L, "all bigrams seen in train")
    // (a,b): 3·ln(2/2)=0; (b,a): 2·ln(1/2)
    val want = BigDecimal(-(2.0 * math.log(1.0 / 2.0)) / 5.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === want)
  }

  test("single-token and empty docs are excluded from both halves") {
    val dir = writeDocs(Seq(
      (0L, "a b c", "en"),
      (1L, "solo", "en"),
      (3L, "a b", "en")))
    val got = TextAnalysis.bigramNll(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(3L), "doc 1 has no bigram")
  }

  test("sf0.001: higher backoff share tracks higher nll on average") {
    val df = TextAnalysis.bigramNll(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // documents that never back off must score lower on average than
    // heavy-backoff documents — the filter discriminates as designed
    val (none, heavy) = rows.partition(_.getLong(3) === 0L)
    if (none.nonEmpty && heavy.nonEmpty) {
      val mNone = none.map(_.getDouble(4)).sum / none.length
      val mHeavy = heavy.map(_.getDouble(4)).sum / heavy.length
      assert(mNone < mHeavy,
        s"zero-backoff docs should read as more in-distribution ($mNone vs $mHeavy)")
    }
  }
}
