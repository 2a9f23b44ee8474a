// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (same pattern as FloatVectorDot).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType}

/** Gear-hash content-defined boundary positions in ONE rolling pass — the
  * O(n) production path for CDC chunking (graft.llmops.Multimodal
  * .cdcChunksGear): per byte, `h = ((h << 1) + G[b]) & (2^maskBits − 1)`,
  * and position i (1-based) is a boundary when h == 0. One multiply-free
  * add-shift per byte inside codegen vs the windowed-md5 path's O(n·w)
  * hashing.
  *
  * STILL SQL-oracle-replayable, which is the point: the shift-add
  * recurrence telescopes to `h_i = Σ_{k=0..m−1} (G[b_{i−k}] << k) mod 2^m`
  * — bytes older than `maskBits` positions have shifted out of the mask —
  * so the oracle states each boundary as an m-term windowed sum over the
  * hex byte walk, exact integers throughout. The gear table G derives
  * from PortableHash (`hash52("gear:" || byte)`), re-derivable in SQL.
  *
  * Mean chunk size ≈ 2^maskBits bytes; effective window = maskBits bytes
  * (positions i < maskBits use the shorter prefix window — identical on
  * both engines by the same recurrence). Null input → null; empty → [].
  */
case class GearBoundaries(child: Expression, maskBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maskBits >= 1 && maskBits <= 52, "maskBits in [1, 52]")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gear_boundaries"

  private val mask: Long = (1L << maskBits) - 1

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Long](bytes.length)
    var k = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = ((h << 1) + GearBoundaries.Gear(bytes(i) & 0xFF)) & mask
      if (h == 0L) { out(k) = i + 1L; k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gear = ctx.addReferenceObj("gear", GearBoundaries.Gear, "long[]")
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $b.length;
         |long[] $buf = new long[$n];
         |int $k = 0;
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = (($h << 1) + $gear[$b[$i] & 0xFF]) & ${mask}L;
         |  if ($h == 0L) { $buf[$k++] = $i + 1L; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

object GearBoundaries {
  /** The 256-entry gear table — PortableHash-derived so the SQL oracle
    * re-derives the identical values via `md5('gear:' || byte)`.
    */
  val Gear: Array[Long] =
    Array.tabulate(256)(b => graft.llmops.PortableHash.hash52Jvm(s"gear:$b"))

  /** Column-API entry point. */
  def gearBoundaries(payload: Column, maskBits: Int): Column =
    ExpressionUtils.column(
      GearBoundaries(ExpressionUtils.expression(payload), maskBits))
}
