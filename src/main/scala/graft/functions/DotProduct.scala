package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Kernel shared by interpreted eval and generated code: Σ aᵢ·bᵢ in
  * double over float arrays, accumulated in index order — bit-identical
  * to the `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0d, (acc, v) -> acc + v)` higher-order-function form it replaces
  * (same IEEE operations in the same order), which DuckDB's oracle
  * mirrors. Both sides of every pair in the engine have equal length;
  * trailing elements of a longer array are ignored.
  */
object VectorKernel {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** float × double — corpus embedding against a trained (double)
    * centroid; the float side is widened exactly, as the oracle's
    * `CAST(e[i] AS DOUBLE) * c[i]` does.
    */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) evaluate
  * through the interpreted lambda path — per element they allocate and
  * box; on the ANN hot loop (every query×candidate pair) that is the
  * dominant cost. This expression is a single fused loop over the two
  * `ArrayData` buffers inside whole-stage codegen.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Kernel variant selected statically from the child element types, so
    * codegen emits a direct monomorphic call (FF, FD, DF, or DD).
    */
  private def kernel: String = {
    def tag(t: DataType) = t match {
      case ArrayType(FloatType, _) => "F"
      case _ => "D"
    }
    s"dot${tag(left.dataType)}${tag(right.dataType)}"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_d needs two array<float|double> children, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "dot_product_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dotFF" => VectorKernel.dotFF(x, y)
      case "dotFD" => VectorKernel.dotFD(x, y)
      case "dotDF" => VectorKernel.dotDF(x, y)
      case _       => VectorKernel.dotDD(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernel.$kernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  /** Column-API entry point: `dot($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    bridge.column(DotProductD(bridge.expression(a), bridge.expression(b)))
}
