package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product over two `array<bigint>` columns as a native
  * codegen'd expression.
  *
  * The generic `aggregate`/`zip_with` higher-order functions are
  * CodegenFallback — every element round-trips through the interpreter,
  * which made pairwise cosine the bench bottleneck. This expression is a
  * tight primitive loop inside WholeStageCodegen; with ×1000-quantized
  * vectors (GraftFunctions.quantize1000) it gives exact integer dots for
  * cosine/LSH at ~100× the HOF speed.
  */
object LongArrayDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}

case class LongArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ldot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    LongArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongArrayDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}
