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
