package graft

import graft.functions.{RollingHash, RollingHashUtil}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The rolling-hash kernel must equal the naive O(window·n) fold over
  * *code points* (the DuckDB oracle's ord()/len()/substr() semantics),
  * including for non-BMP text where UTF-16 code units diverge.
  */
class RollingHashSpec extends SparkSpec {

  private val M = 2147483647L
  private val B = 31L

  /** Naive reference: fold each window separately, in code points. */
  private def naive(s: String, window: Int): (Long, Long) = {
    val cps = s.codePoints().toArray
    def fold(a: Array[Int]): Long = a.foldLeft(0L)((acc, c) => (acc * B + c) % M)
    val content = fold(cps)
    if (cps.length <= window) (content, content)
    else (content, cps.sliding(window).map(fold).min)
  }

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "short",
    "exactly sixteen!",                       // == window
    "héllo wörld — naïve façade über ça",     // 2-byte UTF-8, BMP
    "日本語のテキストです、これは十六文字以上あります",  // 3-byte, BMP
    "astral 𝕳𝖊𝖑𝖑𝖔 😀🚀 plane chars beyond the BMP", // surrogate pairs
    "😀😁😂🤣😃😄😅😆😉😊😋😎😍😘🥰😗😙😚"      // all non-BMP
  )

  test("kernel == naive code-point fold, incl. non-BMP") {
    samples.foreach { s =>
      val got = RollingHashUtil.rollingHash(UTF8String.fromString(s), 16)
      val (c, w) = naive(s, 16)
      assert((got.getLong(0), got.getLong(1)) === ((c, w)), s"text: $s")
    }
  }

  test("expression: codegen and interpreted paths agree on non-BMP input") {
    import spark.implicits._
    val df = samples.toDF("s")
    val sel = df.select(RollingHash.of(col("s"), 16).as("rh"))
    val viaCodegen = sel.collect().map(_.getSeq[Long](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = sel.collect().map(_.getSeq[Long](0))
      assert(viaCodegen.map(_.toList).toList === interp.map(_.toList).toList)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("window_hashes == per-position naive folds, incl. non-BMP; short text empty") {
    samples.foreach { s =>
      val got = RollingHashUtil
        .windowHashes(UTF8String.fromString(s), 16).toLongArray().toSeq
      val cps = s.codePoints().toArray
      val expected =
        if (cps.length < 16) Seq.empty[Long]
        else cps.sliding(16).map(
          _.foldLeft(0L)((acc, c) => (acc * B + c) % M)).toSeq
      assert(got === expected, s"text: $s")
    }
    assert(RollingHashUtil.windowHashes(UTF8String.fromString(""), 16)
      .toLongArray().isEmpty)
  }

  test("window_hashes: column API and SQL registration agree") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = samples.toDF("s")
    df.createOrReplaceTempView("wh_samples")
    val viaCol = df.select(graft.functions.WindowHashes.of(col("s"), 16))
      .collect().map(_.getSeq[Long](0).toList).toList
    val viaSql = spark.sql(
        "SELECT window_hashes(s, 16) FROM wh_samples")
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(viaCol === viaSql)
  }
}
