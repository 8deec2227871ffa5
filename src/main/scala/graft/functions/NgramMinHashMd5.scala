package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native Catalyst expression: n-gram MinHash signature of a string
  * column in one codegen'd pass (see [[MinHashUtil]] for the kernel and
  * the oracle-parity contract).
  *
  * `ngram_minhash_md5(text, n, k)` ≡
  * `array(min(substr(md5(g),1,8)), …, min(substr(md5(g || '1'),1,8)), …)`
  * over all `n`-code-point windows `g` of `text` — hash function
  * `j` is 8-hex-char slice `j % 4` of the seeded digest
  * `md5(g || seed)` with seed `j / 4` ('' for 0, the ASCII decimal
  * otherwise) — but ~20× faster: the composed-builtin form materializes
  * a shingle array and a 32-char hex digest per shingle through the
  * interpreted higher-order-function path, while this expression stays
  * inside whole-stage codegen and hashes windows straight out of the
  * row's UTF-8 buffer.
  *
  * Returns null when `text` is null or shorter than `n` code points
  * (mirroring `array_min` over an empty shingle array).
  */
case class NgramMinHashMd5(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(numHashes >= 1 && numHashes <= 256,
    s"numHashes must be in [1, 256] (64 seeded digests × 4 slices), got $numHashes")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_minhash_md5 needs a string child, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_minhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.ngramMinHashMd5(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinHashUtil.ngramMinHashMd5($c, $n, $numHashes);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NgramMinHashMd5 =
    copy(child = newChild)
}

object NgramMinHashMd5 {
  /** Column-API entry point: `minhashSignature($"text", 8, 4)`. */
  def signature(text: Column, n: Int, numHashes: Int): Column =
    bridge.column(NgramMinHashMd5(bridge.expression(text), n, numHashes))
}
