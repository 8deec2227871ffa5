package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: production-width n-gram MinHash in one
  * codegen'd pass (see [[MinHashUtil.ngramMinHashAffine]] for the
  * kernel and the oracle-parity contract).
  *
  * `ngram_minhash_affine(text, n, k)` ≡ for every n-code-point window
  * g: base hash h = first 8 hex chars of md5(g) as an unsigned 32-bit
  * value; hash j = (aⱼ·(h mod P) + bⱼ) mod P over the Mersenne prime
  * P = 2³¹−1 with fixed pairwise-independent coefficients
  * ([[MinHashUtil.affineA]]/[[MinHashUtil.affineB]]); the signature is
  * the per-function minimum over all windows.
  *
  * This is the scale path for 100 TB dedup: one digest per window + k
  * multiply-adds, versus ⌈k/4⌉ digests for the seeded-md5-slice family
  * ([[NgramMinHashMd5]], kept as the oracle-parity narrow path at
  * k=16) — 16× less hashing at k=64.
  *
  * Returns null when `text` is null or shorter than `n` code points.
  */
case class NgramMinHashAffine(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(numHashes >= 1 && numHashes <= 256,
    s"numHashes must be in [1, 256], got $numHashes")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_minhash_affine needs a string child, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_minhash_affine"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.ngramMinHashAffine(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinHashUtil.ngramMinHashAffine($c, $n, $numHashes);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NgramMinHashAffine =
    copy(child = newChild)
}

object NgramMinHashAffine {
  /** Column-API entry point: `NgramMinHashAffine.signature($"text", 8, 64)`. */
  def signature(text: Column, n: Int, numHashes: Int): Column =
    bridge.column(NgramMinHashAffine(bridge.expression(text), n, numHashes))
}
