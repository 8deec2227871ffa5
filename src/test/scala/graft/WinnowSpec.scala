package graft

import graft.functions.{RollingHashUtil, WinnowFingerprints}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing kernel: deque implementation vs a naive per-window min
  * recomputation, the Schleimer guarantee (shared spans ≥ k+w−1 share a
  * fingerprint), codegen/interpreted agreement, and SQL registration.
  */
class WinnowSpec extends SparkSpec {

  private val M = 2147483647L
  private val B = 31L
  private val K = 16
  private val W = 8

  /** Naive reference: all k-gram hashes folded separately, min per
    * window of w, distinct sorted.
    */
  private def naive(s: String, k: Int = K, w: Int = W): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Seq.empty
    def fold(a: Array[Int]): Long = a.foldLeft(0L)((acc, c) => (acc * B + c) % M)
    val hs = cps.sliding(k).map(fold).toArray
    val sels =
      if (hs.length <= w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq
    sels.distinct.sorted
  }

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog while the spider spins",
    "short",
    "exactly sixteen!",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // all windows identical
    "astral 𝕳𝖊𝖑𝖑𝖔 😀🚀 plane chars beyond the BMP and some more padding",
    ("spark " * 40).trim // heavy repetition
  )

  test("kernel == naive per-window minima, distinct sorted") {
    samples.foreach { s =>
      val got = RollingHashUtil.winnow(UTF8String.fromString(s), K, W)
      val arr = (0 until got.numElements()).map(got.getLong)
      assert(arr === naive(s), s"text: $s")
    }
  }

  test("guarantee: docs sharing a span of >= k+w-1 chars share a fingerprint") {
    val shared = "0123456789abcdefghijklm" // k+w-1 = 23 chars
    assert(shared.length === K + W - 1)
    val doc1 = s"prefix one $shared suffix alpha"
    val doc2 = s"a totally different beginning $shared and ending"
    val f1 = naive(doc1).toSet
    val f2 = naive(doc2).toSet
    assert((f1 & f2).nonEmpty, "winnowing guarantee violated")
  }

  test("expression: codegen and interpreted paths agree; SQL function registered") {
    import spark.implicits._
    val df = samples.toDF("s")
    val sel = df.select(WinnowFingerprints.of(col("s"), K, W).as("fp"))
    val viaCodegen = sel.collect().map(_.getSeq[Long](0).toList).toList
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(sel.collect().map(_.getSeq[Long](0).toList).toList === viaCodegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("winnow_in")
    val viaSql = spark.sql(s"SELECT winnow(s, $K, $W) AS fp FROM winnow_in")
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(viaSql === viaCodegen)
  }
}
