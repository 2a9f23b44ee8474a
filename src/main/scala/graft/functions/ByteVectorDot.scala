// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (same pattern as FloatVectorDot).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, LongType}

/** Codegen'd dot product over two Array[Byte] (int8-quantized) vectors,
  * accumulating in long — exact integer arithmetic, no float rounding.
  *
  * This is the compute half of the int8 quantization scale path
  * (graft.llmops.Quantize): Tungsten stores a byte array element in 1 byte
  * vs 4 for float, so a quantized corpus holds 4x the vectors per executor
  * and shuffles 4x fewer bytes; the inner loop is a tight int
  * multiply-accumulate inside WholeStageCodegen. Null input → null;
  * unequal lengths use the common prefix (same contract as
  * [[FloatVectorDot]]).
  */
case class ByteVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteVectorDot =
    copy(left = newLeft, right = newRight)
}

object ByteVectorDot {
  /** Column-API entry point. */
  def bdot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ByteVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
