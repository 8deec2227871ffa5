package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass n-gram MinHash kernel, called from both the interpreted and
  * codegen paths of [[NgramMinHashMd5]].
  *
  * Semantics (bit-for-bit what the DuckDB oracle computes): for every
  * window of `n` code points of `text`, take a *family* of md5 digests —
  * `md5(g)`, `md5(g || '1')`, `md5(g || '2')`, … (ASCII digit suffix per
  * seeded digest; seed 0 is unsuffixed, keeping the 4-hash family
  * byte-identical to the original definition) — slice each 32-hex-char
  * digest into four 8-hex-char substrings, giving `k` independent hash
  * functions from `ceil(k/4)` digests; return the per-slice minimum as
  * lowercase hex strings. Real near-dup dedup needs 16–128 permutations
  * with threshold-tuned b×r banding; md5's 128 bits cap a single digest
  * at 4 slices, so the seed suffix extends the family without leaving
  * the one hash primitive Spark and DuckDB share bit-for-bit.
  *
  * Why this is fast where the equivalent
  * `transform(shingles, g -> md5(g))` pipeline is not: no shingle string
  * array, no per-shingle UTF8String, no 32-char hex digest string — the
  * window is hashed directly from the row's UTF-8 byte buffer
  * (`md.update(bytes, off, len)`), the digest goes into one reused
  * 16-byte buffer, and each 8-hex-char slice is compared as an unsigned
  * 32-bit int (hex is order-preserving: fixed-width lowercase hex sorts
  * identically to the unsigned value). Only the k winning slices are
  * ever formatted as strings, once per row.
  */
object MinHashUtil {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** UTF-8 seed suffixes for digests 1..63 (digest 0 is unsuffixed). */
  private val seedSuffix: Array[Array[Byte]] =
    Array.tabulate(64)(d => d.toString.getBytes("UTF-8"))

  /** @return array<string> of `k` 8-hex-char minima, or null if the text
    *         has fewer than `n` code points (mirrors `array_min([])`).
    */
  def ngramMinHashMd5(text: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // Code-point start offsets (UTF-8 continuation bytes are 10xxxxxx);
    // windows are n code points, matching substr() in Spark and DuckDB.
    val starts = new Array[Int](len + 1)
    var m = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(m) = i; m += 1 }
      i += 1
    }
    starts(m) = len
    if (m < n) return null

    val md = md5.get()
    val digest = new Array[Byte](16)
    val mins = Array.fill(k)(0xFFFFFFFFL)
    val numDigests = (k + 3) / 4
    var w = 0
    while (w <= m - n) {
      var d = 0
      while (d < numDigests) {
        md.reset()
        md.update(bytes, starts(w), starts(w + n) - starts(w))
        if (d > 0) md.update(seedSuffix(d))
        md.digest(digest, 0, 16)
        var j = d * 4
        val jEnd = if (j + 4 < k) j + 4 else k
        while (j < jEnd) {
          val o = (j - d * 4) * 4
          val v = ((digest(o) & 0xFFL) << 24) | ((digest(o + 1) & 0xFFL) << 16) |
            ((digest(o + 2) & 0xFFL) << 8) | (digest(o + 3) & 0xFFL)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        d += 1
      }
      w += 1
    }
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Mersenne prime 2³¹−1 — the modulus of the affine MinHash family.
    * All intermediates of (a·h + b) mod P with a,h,b < P stay under
    * 2⁶², so the arithmetic is overflow-free in signed 64-bit on both
    * Spark and the DuckDB oracle.
    */
  val AffineP = 2147483647L

  /** Pairwise-independent affine coefficients aⱼ∈[1,P), bⱼ∈[0,P) for up
    * to 256 hash functions, from a fixed-seed generator (java.util.Random
    * is algorithmically specified, so the family is stable across JVMs).
    * [[graft.SparkEntry]] embeds the same values as literals in the
    * DuckDB oracle SQL.
    */
  private val affineConsts: (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(20240812L)
    val a = Array.fill(256)(1L + rnd.nextInt((AffineP - 1).toInt))
    val b = Array.fill(256)(rnd.nextInt(AffineP.toInt).toLong)
    (a, b)
  }
  def affineA(j: Int): Long = affineConsts._1(j)
  def affineB(j: Int): Long = affineConsts._2(j)

  /** Production-width ("wide") MinHash: ONE md5 digest per n-code-point
    * window supplies a 32-bit base hash h (first 4 digest bytes,
    * big-endian unsigned — numerically the same slice 0 the seeded-slice
    * family uses); hash function j is the affine permutation
    * (aⱼ·(h mod P) + bⱼ) mod P. Cost per window is one digest + k
    * multiply-adds, versus ⌈k/4⌉ digests for the seeded-slice family —
    * at k=64 that is 1/16th the hashing, which is what makes 64–128
    * permutations affordable on a 100 TB corpus.
    *
    * @return array<bigint> of k minima, or null if the text has fewer
    *         than `n` code points (mirrors `array_min([])`).
    */
  def ngramMinHashAffine(text: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val starts = new Array[Int](len + 1)
    var m = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(m) = i; m += 1 }
      i += 1
    }
    starts(m) = len
    if (m < n) return null

    val md = md5.get()
    val digest = new Array[Byte](16)
    val a = affineConsts._1
    val b = affineConsts._2
    val mins = Array.fill(k)(Long.MaxValue)
    var w = 0
    while (w <= m - n) {
      md.reset()
      md.update(bytes, starts(w), starts(w + n) - starts(w))
      md.digest(digest, 0, 16)
      val h = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
        ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
      val hm = h % AffineP
      var j = 0
      while (j < k) {
        val v = (a(j) * hm + b(j)) % AffineP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
