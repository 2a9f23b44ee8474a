// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (same pattern as FloatVectorDot).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Codegen'd dot product over two Array[Long] vectors, accumulating in
  * long — exact integer arithmetic, no float rounding anywhere.
  *
  * This is the compute half of the integer-exact k-means quantizer
  * (graft.llmops.Similarity.kmeansCentroids): embeddings quantize to
  * longs once, and every assignment pass runs |C|·nlist of these dots —
  * a tight multiply-accumulate inside WholeStageCodegen, where the
  * composable `aggregate(zip_with(...))` HOF form would evaluate
  * interpreted per pair (the same 6x gap FloatVectorDot measured).
  * Null input → null; unequal lengths use the common prefix (same
  * contract as [[FloatVectorDot]]/[[ByteVectorDot]]).
  *
  * Overflow: callers own the range — quantized components bounded by
  * 2^17 over 64 dims keep |dot| < 2^41, far inside long.
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ldot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
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
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

object LongVectorDot {
  /** Column-API entry point. */
  def ldot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
