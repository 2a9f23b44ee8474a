// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (same pattern as FloatVectorDot).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Z-order curve value: interleave the low 32 bits of two long columns
  * (a₀b₀a₁b₁…a₃₁b₃₁, a in the even positions) — the data-layout key that
  * clusters multi-dimensional locality into one sort dimension, so files
  * sorted/range-partitioned by it serve min-max skipping on BOTH columns
  * (the OPTIMIZE ZORDER technique). Bits ≥ 32 are ignored by contract:
  * callers bucket/scale their dimensions into 32-bit ranges first.
  *
  * A custom Expression because the composable form is a 64-term
  * shift/or tree — correct but noise in every plan; this is one codegen'd
  * loop. Null if either input is null.
  */
case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitInterleave =
    copy(left = newLeft, right = newRight)
}

object BitInterleave {
  /** Column-API entry point. */
  def zorder(a: Column, b: Column): Column =
    ExpressionUtils.column(
      BitInterleave(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
