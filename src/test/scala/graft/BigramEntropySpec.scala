package graft

import graft.functions.{BigramEntropyKernel, BigramEntropyStats}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The fused bigram-statistics kernel behind `text_bigram_entropy`:
  * bit-parity with an independent sorted-fold reference (the float
  * contract the DuckDB oracle replays), codegen/interpreted agreement
  * on non-BMP input, the code-point sort-order pin that keeps the
  * fold order equal to UTF-8 binary order, SQL registration, and the
  * zero-shuffle plan shape the kernel exists for.
  */
class BigramEntropySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference: code-point bigrams, counts, keys sorted by
    * code point, left fold of p·ln p from 0.0 — no shared code.
    */
  private def ref(s: String): (Long, Long, Double) = {
    val cps = s.codePoints().toArray
    if (cps.length < 2) return (0L, 0L, 0.0)
    val bgs = cps.sliding(2).map(p => new String(p, 0, p.length)).toSeq
    val counts = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = bgs.size.toDouble
    val sortedKeys = counts.keys.toSeq.sortWith { (a, b) =>
      val ca = a.codePoints().toArray
      val cb = b.codePoints().toArray
      if (ca(0) != cb(0)) ca(0) < cb(0) else ca(1) < cb(1)
    }
    var acc = 0.0
    sortedKeys.foreach { k =>
      val p = counts(k).toDouble / n
      acc += p * math.log(p)
    }
    (bgs.size.toLong, counts.size.toLong, acc)
  }

  private def kernel(s: String): (Long, Long, Double) = {
    val r = BigramEntropyKernel.stats(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("kernel == independent sorted-fold reference on every corpus document") {
    Tables(spark, dir, "documents").select("text").collect()
      .map(_.getString(0)).foreach { t =>
        // exact equality including the float fold — same sorted order,
        // same operation sequence
        assert(kernel(t) === ref(t), s"doc prefix: ${t.take(40)}")
      }
  }

  test("hand cases: empty, single char, run, alternation, non-BMP order") {
    assert(kernel("") === ((0L, 0L, 0.0)))
    assert(kernel("x") === ((0L, 0L, 0.0)))
    assert(kernel("aaaa") === ((3L, 1L, 0.0))) // one type, p = 1, ln 1 = 0
    // "ababa": ab,ba,ab,ba -> 2 types p = 1/2 each
    val (n, d, acc) = kernel("ababa")
    assert((n, d) === ((4L, 2L)))
    assert(math.abs(-acc - math.log(2.0)) < 1e-15)
    // supplementary char (U+1F600) must sort ABOVE U+FFFD — code-point
    // order, not Java UTF-16 code-unit order (where the surrogate pair
    // D83D.. would sort below FFFD)
    val tricky = "�😀�😀�"
    assert(kernel(tricky) === ref(tricky))
  }

  test("codegen and interpreted paths agree, incl. non-BMP") {
    import spark.implicits._
    val rows = Seq("the quick brown fox", "aaaa", "ab", "",
      "�😀�😀", "mixed ascii éè text")
    val sel = rows.toDF("s")
      .select(BigramEntropyStats(col("s")).as("st"))
      .select(col("st.n_bigrams"), col("st.n_distinct"), col("st.plogp_sum"))
    val viaCodegen = sel.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = sel.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(viaCodegen.toList === interp.toList)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("SQL registration agrees with the Column API") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "ababa"), (2L, "")).toDF("id", "t").createOrReplaceTempView("bgt")
    val viaSql = spark.sql(
      "SELECT id, bigram_entropy_stats(t).n_bigrams AS n FROM bgt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === Map(1L -> 4L, 2L -> 0L))
  }

  test("query plan: native kernel, zero shuffles beyond the presentation sort") {
    val out = TextAnalysis.bigramEntropy(spark, dir)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("bigram_entropy_stats"), s"expected native kernel:\n$p")
    assert(!p.toLowerCase.contains("lambdafunction"), p)
    // the round-9 explode form had a (doc, bigram) aggregate exchange +
    // a per-doc collect_list exchange; the kernel form keeps ONLY the
    // presentation sort's range exchange
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges === 1, s"expected only the sort exchange:\n$p")
    assert(!p.contains("HashAggregate"), s"no aggregate left in the plan:\n$p")
  }
}
