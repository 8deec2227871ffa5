package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The LZ78 phrase-count kernel behind `text_lz_complexity`:
  * hand-derived parses, parity with an independent reference
  * implementation over the corpus, the redundancy-ordering property
  * the signal exists for, and the codegen discipline.
  */
class Lz78Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference parse (Set-based, no shared code). */
  private def ref(s: String): Int = {
    var dict = Set.empty[String]
    var cur = ""
    var cnt = 0
    for (c <- s) {
      cur += c
      if (!dict(cur)) { dict += cur; cnt += 1; cur = "" }
    }
    if (cur.nonEmpty) cnt + 1 else cnt
  }

  private def kernel(s: String): Int =
    graft.functions.Lz78Kernel.count(UTF8String.fromString(s))

  test("hand-derived parses: empty, runs, alternations") {
    assert(kernel("") === 0)
    assert(kernel("a") === 1)
    assert(kernel("aa") === 2) // "a" | trailing "a"
    assert(kernel("aaaa") === 3) // "a" | "aa" | trailing "a"
    assert(kernel("abab") === 3) // "a" | "b" | "ab"
    assert(kernel("abcd") === 4) // four fresh singles
    // a^10: phrases a, aa, aaa, aaaa (1+2+3+4=10) — exactly 4
    assert(kernel("a" * 10) === 4)
  }

  test("kernel == independent reference on every corpus document") {
    Tables(spark, dir, "documents").select("text").collect()
      .map(_.getString(0)).foreach { t =>
        assert(kernel(t) === ref(t), s"doc prefix: ${t.take(40)}")
      }
  }

  test("redundancy ordering: repetitive text parses into fewer phrases") {
    val rnd = new scala.util.Random(7)
    val diverse = Array.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val template = "ab" * 1000
    assert(kernel(template) < kernel(diverse) / 2,
      "repeating text must parse into far fewer phrases")
    // phrase count can never exceed the character count
    assert(kernel(diverse) <= diverse.length)
  }

  test("bigram entropy: bands order mash < prose < random; exact on a known doc") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("entropy").toString
    val rnd = new scala.util.Random(3)
    val mash = "a" * 400
    val prose = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through fields of tall grass toward the river ") * 4
    val random = Array.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    Seq((0L, mash), (1L, prose), (2L, random), (3L, "ababab"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = operators.TextAnalysis.bigramEntropy(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy")))).toMap
    // "aaaa…": one bigram type, entropy exactly 0
    assert(out(0L) === ((399L, 1L, 0.0)))
    // ordering: mash < prose < random
    assert(out(1L)._3 > 0.0 && out(1L)._3 < out(2L)._3)
    // "ababab": bigrams ab,ba,ab,ba,ab -> p = (3/5, 2/5), H exact
    val h = -(3.0 / 5 * math.log(3.0 / 5) + 2.0 / 5 * math.log(2.0 / 5))
    assert(out(3L)._1 === 5L && out(3L)._2 === 2L)
    assert(math.abs(out(3L)._3 -
      BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9)
  }

  test("query: ratio column, null on empty, SQL function registered, codegen") {
    val out = TextAnalysis.lzComplexity(spark, dir)
    val rows = out.collect()
    assert(rows.length === Tables(spark, dir, "documents").count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chars")
      val p = r.getAs[Long]("lz_phrases")
      assert(p >= 0 && p <= n)
      if (n > 0)
        assert(math.abs(r.getAs[Double]("lz_ratio") -
          BigDecimal(p.toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "abab"), (2L, "")).toDF("id", "t").createOrReplaceTempView("lzt")
    val viaSql = spark.sql("SELECT id, lz78_phrase_count(t) AS p FROM lzt")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql === Map(1L -> 3, 2L -> 0))
    // native kernel in the plan, no interpreted lambda
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("lz78_phrase_count"), s"expected native kernel:\n$p")
    assert(!p.toLowerCase.contains("lambdafunction"), p)
  }
}
