package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** PII redaction: planted documents pin the placeholder rewrites, the
  * fixed email → URL → id-like order (digits inside a URL are consumed
  * by <URL>, never double-redacted), and the no-PII identity.
  */
class PiiRedactSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    rows.map { case (id, text) => (id, text, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("planted PII is rewritten to typed placeholders, bytes certified by md5") {
    val dir = writeDocs(Seq(
      (1L, "contact bob@example.com or https://x.io/a?id=1234567 ref 987654"),
      (2L, "id run a1234567@mail.org end"),
      (3L, "plain prose with no sensitive content at all")))
    val got = TextAnalysis.piiRedact(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

    // doc 1: one of each; the URL's digits vanish inside <URL>
    val want1 = "contact <EMAIL> or <URL> ref <ID>"
    assert((got(1L).getLong(1), got(1L).getLong(2), got(1L).getLong(3)) === ((1L, 1L, 1L)))
    assert(got(1L).getString(5) === md5Hex(want1))
    assert(got(1L).getLong(4) === want1.length.toLong)

    // doc 2: the digit run sits INSIDE an email → consumed by <EMAIL>,
    // no <ID> replacement happens
    val want2 = "id run <EMAIL> end"
    assert((got(2L).getLong(1), got(2L).getLong(3)) === ((1L, 0L)))
    assert(got(2L).getString(5) === md5Hex(want2))

    // doc 3: identity — no match, text bytes unchanged
    assert((got(3L).getLong(1), got(3L).getLong(2), got(3L).getLong(3)) === ((0L, 0L, 0L)))
    assert(got(3L).getString(5) === md5Hex("plain prose with no sensitive content at all"))
  }

  test("signals and redact agree on the corpus: redaction fires iff a signal fired") {
    val dir = "/root/testdata/sf0.001"
    val signals = TextAnalysis.piiSignals(spark, dir)
      .select("doc_id", "has_pii").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    TextAnalysis.piiRedact(spark, dir).collect().foreach { r =>
      val replaced = r.getLong(1) + r.getLong(2) + r.getLong(3) > 0
      // redact can only fire where a signal fired; the converse can
      // differ (a digit run inside a URL signals but is consumed)
      if (replaced) assert(signals(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }
}
