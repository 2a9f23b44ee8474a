// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] — the FloatVectorDot pattern.
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** CRC32C (Castagnoli) of a binary column as an unsigned 32-bit value in a
  * long — the checksum TFRecord framing requires (Spark's built-in `crc32`
  * is the IEEE polynomial; the two disagree on every input). Backed by the
  * JDK's hardware-accelerated `java.util.zip.CRC32C`; the generated code
  * calls the same static helper the interpreted path uses, so the
  * expression stays inside WholeStageCodegen without a UDF's
  * serialization detour. Pinned in tests against the canonical check
  * value crc32c("123456789") = 0xE3069283.
  */
case class Crc32C(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_crc32c"

  override def nullSafeEval(input: Any): Any =
    Crc32C.of(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftfn.Crc32C.of($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc32C =
    copy(child = newChild)
}

object Crc32C {
  def of(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, 0, bytes.length)
    c.getValue
  }

  def crc32c(c: Column): Column =
    ExpressionUtils.column(Crc32C(ExpressionUtils.expression(c)))
}

/** One TFRecord frame around a binary payload:
  *
  *   [length: 8 bytes LE] [masked crc32c(length bytes): 4 LE]
  *   [payload]            [masked crc32c(payload): 4 LE]
  *
  * with the standard TFRecord mask
  * `((crc >>> 15) | (crc << 17)) + 0xa282ead8` — byte-compatible with
  * TensorFlow's reader, so a corpus exported through this expression
  * loads in a tf.data pipeline unchanged. Pure per-row framing (no
  * state), evaluated via one static helper from both the interpreted and
  * the generated path.
  */
case class TfRecordFrame(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_tfrecord_frame"

  override def nullSafeEval(input: Any): Any =
    TfRecordFrame.frame(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftfn.TfRecordFrame.frame($c)")

  override protected def withNewChildInternal(newChild: Expression): TfRecordFrame =
    copy(child = newChild)
}

object TfRecordFrame {

  /** The TFRecord crc mask. */
  def masked(crc: Long): Long =
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xFFFFFFFFL

  def frame(payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(payload.length.toLong)
    val lenBytes = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(lenBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong)
    bb.putInt(masked(Crc32C.of(lenBytes)).toInt)
    bb.put(payload)
    bb.putInt(masked(Crc32C.of(payload)).toInt)
    bb.array()
  }

  def tfRecordFrame(c: Column): Column =
    ExpressionUtils.column(TfRecordFrame(ExpressionUtils.expression(c)))
}
