// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (same pattern as FloatVectorDot).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL media header metadata in one native codegen expression:
  * struct(kind, w, h, n_frames, duration_micros) computed by the
  * bounds-checked JVM header walks (graft.llmops.Multimodal's
  * detectKind / imageDims / audioDims / videoDims — every format they
  * parse, including the variable-offset walks the fixed-offset hex
  * columns can never spell: JPEG SOF, TIFF-IFD-anywhere, ispe,
  * mp3 frame hop, mp4 moov, WebM EBML).
  *
  * WHY an Expression and not the composed hex-CASE columns: the
  * size-gate composition of detectKindCol + three dims CASEs fused
  * into one whole-stage-codegen unit whose single generated method
  * crossed the JVM's 64 KB bytecode limit — CASE branches consuming
  * whole-stage LOCALS cannot be split into helper methods, so the
  * WHOLE scan silently fell back from whole-stage codegen (present
  * since r14, found in the r15 verify log; ~10 s of doomed Janino
  * work per plan on top). This expression's generated code is ONE
  * static call per row, so the gate genuinely rides the scan inside
  * whole-stage codegen — and gates MORE formats than the hex CASEs
  * could (mp3/mp4/WebM durations, JPEG/ispe/exotic-TIFF dims). The
  * per-row walks are the same deterministic integer parses the specs
  * and derived oracles pin; absent fields are null, exactly the
  * Option semantics of the JVM walks.
  *
  * The scan-side hex-CASE columns (detectKindCol/imageDimsCol/…)
  * remain the TRUE-replay surface — each compiles fine standalone and
  * its DuckDB oracle walks the identical hex arithmetic; this
  * expression is the composition-scale path (the GearBoundaries
  * precedent: same contract, native speed).
  */
case class MediaHeaderMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = MediaHeaderMeta.Schema
  override def prettyName: String = "graft_media_header_meta"

  override def nullSafeEval(input: Any): Any =
    MediaHeaderMeta.metaOf(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = org.apache.spark.sql.graftfn.MediaHeaderMeta.metaOf($b);")

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderMeta =
    copy(child = newChild)
}

object MediaHeaderMeta {
  import graft.llmops.Multimodal

  val Schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("w", LongType, nullable = true),
    StructField("h", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_micros", LongType, nullable = true)))

  /** The per-row walk — public so generated code can call it. */
  def metaOf(payload: Array[Byte]): InternalRow = {
    val kind = Multimodal.detectKind(payload)
    var w: Any = null
    var h: Any = null
    var frames: Any = null
    var dur: Any = null
    Multimodal.imageDims(payload).foreach { case (iw, ih) =>
      w = iw.toLong; h = ih.toLong
    }
    Multimodal.audioDims(payload).foreach { a =>
      frames = a.n_samples; dur = a.duration_micros
    }
    Multimodal.videoDims(payload).foreach { v =>
      w = v.width; h = v.height
      v.n_frames.foreach(f => frames = f)
      v.duration_micros.foreach(d => dur = d)
    }
    // r15: streaming media segments — the .ts PCR-delta and the fMP4
    // sidx duration (no dims without a PES/codec parse, stated); long
    // segments now gate on duration at the scan like every other walk
    if (kind == "mpegts") Multimodal.tsMeta(payload).foreach { t =>
      t.duration_micros.foreach(d => dur = d)
    }
    if (kind == "mp4seg")
      Multimodal.mp4SegDuration(payload).foreach(d => dur = d)
    new GenericInternalRow(Array[Any](UTF8String.fromString(kind),
      w, h, frames, dur))
  }

  /** Column-API entry point. */
  def mediaHeaderMeta(payload: Column): Column =
    ExpressionUtils.column(MediaHeaderMeta(ExpressionUtils.expression(payload)))
}
