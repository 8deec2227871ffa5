package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp kernel: polynomial hash base 31 mod 2^31−1 over Unicode
  * code points, returning `[content_hash, winnow_min]` where winnow_min
  * is the minimum hash over every `window`-code-point sliding window
  * (the whole string when shorter).
  *
  * Equivalent to folding `(acc * 31 + code) % M` over each window — the
  * formula the DuckDB oracle states directly — but O(n) instead of
  * O(window·n): the window hash is *rolled* (outgoing code point's
  * contribution subtracted via the precomputed 31^(window−1), incoming
  * code point appended) rather than recomputed. Exact: modular
  * arithmetic commutes with the roll. Iterates code points (not UTF-16
  * code units), matching the oracle's `ord()` / `len()` / `substr()`
  * semantics for non-BMP text as well.
  */
object RollingHashUtil {
  private val M = 2147483647L
  private val B = 31L

  /** Winnowing fingerprint selection (Schleimer et al., MOSS): the k-gram
    * Rabin-Karp hashes of the text, reduced to the SET of per-window
    * minima over every `w` consecutive hashes — the guarantee is that
    * any shared substring of length ≥ k + w − 1 yields at least one
    * shared selected fingerprint, at ~2/(w+1) of the full hash density.
    * Returns the distinct selected values sorted ascending (position
    * data is deliberately dropped: downstream joins need the set, and
    * a set output keeps the tie-breaking rule out of the contract, so
    * the DuckDB oracle can state it as `list_distinct(list_transform
    * (..., i -> list_min(h[i+1:i+w])))`). Texts shorter than k return
    * an empty array; k ≤ length < k+w−1 selects the single global min.
    *
    * O(n) via a monotonic deque over the rolled hashes.
    */
  /** UTF-16 → code points (all window arithmetic is in code points so
    * alignment matches DuckDB's `generate_series`/`len` semantics).
    */
  private def codePoints(str: String): (Array[Int], Int) = {
    val cp = new Array[Int](str.length)
    var n = 0
    var u = 0
    while (u < str.length) {
      val c = str.codePointAt(u)
      cp(n) = c
      n += 1
      u += Character.charCount(c)
    }
    (cp, n)
  }

  /** The rolled per-position k-gram hashes hs(0 .. n−k) — the shared
    * core of [[winnow]] and [[windowHashes]]. Empty when the text is
    * shorter than k.
    */
  private def positionHashes(cp: Array[Int], n: Int, k: Int): Array[Long] = {
    val nh = n - k + 1
    if (nh <= 0) return Array.empty[Long]
    val hs = new Array[Long](nh)
    var bPow = 1L
    var i = 1
    while (i < k) { bPow = (bPow * B) % M; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cp(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      val out = (cp(i - 1).toLong * bPow) % M
      h = (((h - out + M) % M) * B + cp(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    hs
  }

  /** Every per-position k-gram hash of the text, in position order —
    * the duplicate-span primitive: position i (0-based) hashes code
    * points [i, i+k). Empty array when the text is shorter than k.
    */
  def windowHashes(s: UTF8String, k: Int): GenericArrayData = {
    val (cp, n) = codePoints(s.toString)
    new GenericArrayData(positionHashes(cp, n, k))
  }

  def winnow(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val (cp, n) = codePoints(s.toString)
    val hs = positionHashes(cp, n, k)
    val nh = hs.length
    if (nh == 0) return new GenericArrayData(Array.empty[Long])
    var i = 0

    val sel = new java.util.TreeSet[java.lang.Long]()
    if (nh <= w) {
      var m = hs(0)
      i = 1
      while (i < nh) { if (hs(i) < m) m = hs(i); i += 1 }
      sel.add(m)
    } else {
      // monotonic deque of indices; front = min of the current window
      val dq = new Array[Int](nh)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nh) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  def rollingHash(s: UTF8String, window: Int): GenericArrayData = {
    val str = s.toString
    // Decode UTF-16 to code points once; all window arithmetic below is
    // in code points so alignment matches DuckDB's generate_series/len.
    val cp = new Array[Int](str.length)
    var n = 0
    var u = 0
    while (u < str.length) {
      val c = str.codePointAt(u)
      cp(n) = c
      n += 1
      u += Character.charCount(c)
    }
    var content = 0L
    var i = 0
    while (i < n) { content = (content * B + cp(i)) % M; i += 1 }
    if (n <= window) return new GenericArrayData(Array(content, content))

    // 31^(window-1) mod M, for removing the outgoing code point
    var bPow = 1L
    i = 1
    while (i < window) { bPow = (bPow * B) % M; i += 1 }

    var h = 0L
    i = 0
    while (i < window) { h = (h * B + cp(i)) % M; i += 1 }
    var minH = h
    var start = 1
    while (start <= n - window) {
      val out = (cp(start - 1).toLong * bPow) % M
      h = (((h - out + M) % M) * B + cp(start + window - 1)) % M
      if (h < minH) minH = h
      start += 1
    }
    new GenericArrayData(Array(content, minH))
  }
}

/** Native codegen'd `rolling_hash(text, window)` → `array<bigint>` of
  * `[content_hash, winnow_min]`. Replaces a nested
  * `transform(sequence(...), s -> aggregate(sequence(s, s+15), ...))`
  * pipeline that ran on the interpreted lambda path at O(window·n) with
  * per-element boxing.
  */
case class RollingHash(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 2, s"window must be >= 2, got $window")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs a string child, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.rollingHash(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashUtil.rollingHash($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API entry point: `RollingHash.of($"text", 16)`. */
  def of(text: Column, window: Int): Column =
    bridge.column(RollingHash(bridge.expression(text), window))
}

/** Native codegen'd `window_hashes(text, k)` → `array<bigint>` of the
  * per-position k-gram Rabin-Karp hashes in position order (element i
  * hashes code points [i, i+k); empty when the text is shorter than
  * k) — the duplicate-span primitive: O(n) rolled, vs the O(k·n)
  * interpreted `transform(sequence(...), aggregate(...))` pipeline it
  * replaces in hot paths.
  */
case class WindowHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 2, s"k must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes needs a string child, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.windowHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashUtil.windowHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  /** Column-API entry point: `WindowHashes.of($"text", 16)`. */
  def of(text: Column, k: Int): Column =
    bridge.column(WindowHashes(bridge.expression(text), k))
}

/** Native codegen'd `winnow(text, k, w)` → sorted distinct
  * `array<bigint>` of winnowed k-gram fingerprints (see
  * [[RollingHashUtil.winnow]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 2, s"k and w must be >= 2, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow needs a string child, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashUtil.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Column-API entry point: `WinnowFingerprints.of($"text", 16, 8)`. */
  def of(text: Column, k: Int, w: Int): Column =
    bridge.column(WinnowFingerprints(bridge.expression(text), k, w))
}
