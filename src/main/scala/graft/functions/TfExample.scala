// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] — the FloatVectorDot pattern.
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** `tf.train.Example` protobuf encoding of a STRUCT column — the record
  * format `tf.data.TFRecordDataset` + `tf.io.parse_example` actually
  * consume (a TFRecord shard of raw text is readable; a shard of Example
  * protos is TRAINING-READY: named features, int64 token ids, float
  * embeddings). Dependency-free: the wire format is assembled directly
  * (proto3 encoding is varint tags + length-delimited submessages — a
  * page of arithmetic, not a library).
  *
  * Field mapping, by struct-field Spark type:
  *
  *   - string / binary        → `bytes_list` with one value
  *   - long / int             → `int64_list` with one value
  *   - array&lt;long&gt;            → `int64_list` (token ids — THE case)
  *   - float / double         → `float_list` with one value (float32)
  *   - array&lt;float&gt;           → `float_list` (embeddings)
  *
  * Features are emitted in SORTED field-name order — the TF runtime does
  * not care (map semantics) but the engine's output must be byte-
  * deterministic for the oracle/manifest discipline. Null struct fields
  * are SKIPPED (an absent feature, the tf.Example idiom for missing);
  * a null struct row encodes to null.
  *
  * Layout (check values spec-pinned; composition oracled in
  * q_x_tfexample):
  *
  *   Example    = tag 0x0A, len, Features
  *   Features   = per feature: tag 0x0A, len, MapEntry
  *   MapEntry   = 0x0A, len, name-utf8, 0x12, len, Feature
  *   Feature    = 0x0A BytesList | 0x12 FloatList | 0x1A Int64List
  *   BytesList  = per value: 0x0A, varint len, bytes
  *   FloatList  = 0x0A, varint len, packed float32 LE
  *   Int64List  = 0x0A, varint len, packed varints
  *
  * Evaluated via one reference-object call from both the interpreted and
  * generated path (the standard complex-type expression shape — stays
  * inside the WholeStageCodegen stage, one virtual call per row).
  */
case class TfExampleEncode(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case s: StructType =>
      val bad = s.fields.filterNot(f => TfExampleEncode.supported(f.dataType))
      if (bad.isEmpty)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unsupported tf.Example feature types: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tf_example expects a struct, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_tf_example"

  private lazy val schema = child.dataType.asInstanceOf[StructType]
  // sorted feature order, precomputed once per expression instance
  private lazy val order: Array[Int] =
    schema.fields.zipWithIndex.sortBy(_._1.name).map(_._2).toArray

  /** Called from both eval paths via a reference object. */
  def encodeRow(row: InternalRow): Array[Byte] =
    TfExampleEncode.encode(schema, order, row)

  override def nullSafeEval(input: Any): Any =
    encodeRow(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tfExampleEnc", this,
      classOf[TfExampleEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TfExampleEncode =
    copy(child = newChild)
}

object TfExampleEncode {

  private[graftfn] def supported(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | LongType | IntegerType |
         FloatType | DoubleType => true
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) |
         ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def varintLen(v0: Long): Int = {
    var v = v0; var n = 1
    while ((v & ~0x7FL) != 0) { v >>>= 7; n += 1 }
    n
  }

  private final class Buf(initial: Int) {
    var a = new Array[Byte](initial)
    var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > a.length) a = java.util.Arrays.copyOf(a, math.max(a.length * 2, n + k))
    def byte(b: Int): Unit = { ensure(1); a(n) = b.toByte; n += 1 }
    def varint(v0: Long): Unit = {
      ensure(10); var v = v0
      while ((v & ~0x7FL) != 0) { a(n) = ((v & 0x7F) | 0x80).toByte; n += 1; v >>>= 7 }
      a(n) = v.toByte; n += 1
    }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, a, n, b.length); n += b.length }
    def floatLE(f: Float): Unit = {
      ensure(4); val bits = java.lang.Float.floatToIntBits(f)
      a(n) = bits.toByte; a(n + 1) = (bits >> 8).toByte
      a(n + 2) = (bits >> 16).toByte; a(n + 3) = (bits >> 24).toByte
      n += 4
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  /** One Feature submessage body for field i of `row`, or null to skip. */
  private def featureBytes(dt: DataType, row: InternalRow, i: Int): Array[Byte] = {
    val b = new Buf(32)
    dt match {
      case StringType =>
        val v = row.getUTF8String(i).getBytes
        // Feature{bytes_list{value: v}}: 0x0A len [0x0A len v]
        b.byte(0x0A); b.varint(varintLen(v.length) + 1 + v.length)
        b.byte(0x0A); b.varint(v.length); b.bytes(v)
      case BinaryType =>
        val v = row.getBinary(i)
        b.byte(0x0A); b.varint(varintLen(v.length) + 1 + v.length)
        b.byte(0x0A); b.varint(v.length); b.bytes(v)
      case LongType | IntegerType =>
        val v = if (dt == LongType) row.getLong(i) else row.getInt(i).toLong
        // Feature{int64_list{value: [v]}}: 0x1A len [0x0A len varint(v)]
        val pl = varintLen(v)
        b.byte(0x1A); b.varint(pl + 1 + varintLen(pl))
        b.byte(0x0A); b.varint(pl); b.varint(v)
      case ArrayType(et @ (LongType | IntegerType), _) =>
        val arr = row.getArray(i)
        var pl = 0
        var k = 0
        while (k < arr.numElements()) {
          pl += varintLen(if (et == LongType) arr.getLong(k) else arr.getInt(k).toLong)
          k += 1
        }
        b.byte(0x1A); b.varint(pl + 1 + varintLen(pl))
        b.byte(0x0A); b.varint(pl)
        k = 0
        while (k < arr.numElements()) {
          b.varint(if (et == LongType) arr.getLong(k) else arr.getInt(k).toLong)
          k += 1
        }
      case FloatType | DoubleType =>
        val v = if (dt == FloatType) row.getFloat(i) else row.getDouble(i).toFloat
        // Feature{float_list{value: [v]}}: 0x12 len [0x0A len packed]
        b.byte(0x12); b.varint(4 + 1 + 1)
        b.byte(0x0A); b.varint(4); b.floatLE(v)
      case ArrayType(et @ (FloatType | DoubleType), _) =>
        val arr = row.getArray(i)
        val pl = 4 * arr.numElements()
        b.byte(0x12); b.varint(pl + 1 + varintLen(pl))
        b.byte(0x0A); b.varint(pl)
        var k = 0
        while (k < arr.numElements()) {
          b.floatLE(if (et == FloatType) arr.getFloat(k) else arr.getDouble(k).toFloat)
          k += 1
        }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    b.result()
  }

  def encode(schema: StructType, order: Array[Int], row: InternalRow): Array[Byte] = {
    val features = new Buf(64)
    var j = 0
    while (j < order.length) {
      val i = order(j)
      if (!row.isNullAt(i)) {
        val name = schema.fields(i).name.getBytes("UTF-8")
        val feat = featureBytes(schema.fields(i).dataType, row, i)
        // MapEntry = 0x0A len name, 0x12 len feat
        val entryLen = 1 + varintLen(name.length) + name.length +
          1 + varintLen(feat.length) + feat.length
        features.byte(0x0A); features.varint(entryLen)
        features.byte(0x0A); features.varint(name.length); features.bytes(name)
        features.byte(0x12); features.varint(feat.length); features.bytes(feat)
      }
      j += 1
    }
    val fb = features.result()
    val out = new Buf(fb.length + 8)
    // Example = 0x0A len Features
    out.byte(0x0A); out.varint(fb.length); out.bytes(fb)
    out.result()
  }

  def tfExample(c: Column): Column =
    ExpressionUtils.column(TfExampleEncode(ExpressionUtils.expression(c)))
}

/** The DECODE direction — `tf.train.Example` bytes (ours or any other
  * producer's) back to a typed struct, so foreign tf.data corpora ingest
  * through the same engine: pass the expected feature schema (the
  * [[TfExampleEncode]] type mapping — string/binary ← bytes_list,
  * long/array&lt;long&gt; ← int64_list, float/array&lt;float&gt; ← float_list).
  * Missing features and kind mismatches decode to null FIELDS; torn or
  * non-Example bytes decode to a null ROW — never a killed task (the
  * quarantine discipline). Scalar targets take the list's FIRST value
  * (the tf.Example convention for singletons).
  */
case class TfExampleDecode(child: Expression, schema: StructType)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val badIn = child.dataType != BinaryType
    val bad = schema.fields.filterNot(f => TfExampleDecode.supported(f.dataType))
    if (badIn)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tf_example_decode expects binary input, got ${child.dataType.simpleString}")
    else if (bad.nonEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unsupported tf.Example feature types: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tf_example_decode"

  def decodeBytes(bytes: Array[Byte]): InternalRow =
    TfExampleDecode.decode(schema, bytes)

  override def nullSafeEval(input: Any): Any =
    decodeBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tfExampleDec", this,
      classOf[TfExampleDecode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.decodeBytes($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TfExampleDecode =
    copy(child = newChild)
}

object TfExampleDecode {

  private[graftfn] def supported(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | LongType | FloatType => true
    case ArrayType(LongType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Bounded varint: never reads at or past `limit` (a varint running off
    * the end of its enclosing message is "torn", not a peek into the next
    * field's bytes).
    */
  private def varint(b: Array[Byte], p0: Int, limit: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = p0
    if (p >= limit) throw new IllegalArgumentException("torn varint")
    while ((b(p) & 0x80) != 0) {
      v |= (b(p) & 0x7FL) << shift; shift += 7; p += 1
      if (p >= limit) throw new IllegalArgumentException("torn varint")
    }
    (v | ((b(p) & 0x7FL) << shift), p + 1)
  }

  /** Fields of a message range as (fieldNo, wireType, from, to): for LEN
    * the payload range, for VARINT the varint's own bytes, for
    * fixed32/fixed64 the 4/8 value bytes. ALL proto3 wire types are
    * walked — a conforming parser must accept an UNPACKED repeated
    * int64/float list (one wire-type-0/5 entry per value) even where the
    * schema says packed — so a foreign producer's unpacked lists land
    * here as repeated field-1 entries, not as a structural failure.
    * Only the deprecated group wire types (3/4) are rejected.
    */
  private def fields(b: Array[Byte], from: Int, to: Int): List[(Int, Int, Int, Int)] = {
    var p = from
    var out = List.empty[(Int, Int, Int, Int)]
    while (p < to) {
      val (tag, p1) = varint(b, p, to)
      val no = (tag >>> 3).toInt
      (tag & 7).toInt match {
        case 0 =>
          val (_, p2) = varint(b, p1, to)
          out = ((no, 0, p1, p2)) :: out; p = p2
        case 1 =>
          if (p1 + 8 > to) throw new IllegalArgumentException("torn")
          out = ((no, 1, p1, p1 + 8)) :: out; p = p1 + 8
        case 2 =>
          val (len, p2) = varint(b, p1, to)
          if (len < 0 || len > to - p2) throw new IllegalArgumentException("torn")
          out = ((no, 2, p2, p2 + len.toInt)) :: out; p = p2 + len.toInt
        case 5 =>
          if (p1 + 4 > to) throw new IllegalArgumentException("torn")
          out = ((no, 5, p1, p1 + 4)) :: out; p = p1 + 4
        case wt => throw new IllegalArgumentException(s"group wire type $wt")
      }
    }
    out.reverse
  }

  /** null ROW on structural failure of the Example envelope; null FIELD
    * when one feature's body fails (or kind-mismatches) while its
    * siblings decode — the per-feature degrade contract for foreign
    * producers.
    */
  def decode(schema: StructType, bytes: Array[Byte]): InternalRow =
    try {
      val out = new Array[Any](schema.length)
      val idx = schema.fieldNames.zipWithIndex.toMap
      for {
        (1, 2, f0, f1) <- fields(bytes, 0, bytes.length) // Example.features
        (1, 2, e0, e1) <- fields(bytes, f0, f1)          // Features.feature entries
      } {
        var name: String = null
        var feat: (Int, Int) = null
        fields(bytes, e0, e1).foreach {
          case (1, 2, n0, n1) => name = new String(bytes, n0, n1 - n0, "UTF-8")
          case (2, 2, v0, v1) => feat = (v0, v1)
          case _ => ()
        }
        if (name != null && feat != null) idx.get(name).foreach { i =>
          out(i) =
            try decodeFeature(schema.fields(i).dataType, bytes, feat._1, feat._2)
            catch { case scala.util.control.NonFatal(_) => null }
        }
      }
      InternalRow.fromSeq(out.toIndexedSeq)
    } catch { case scala.util.control.NonFatal(_) => null }

  private def decodeFeature(dt: DataType, b: Array[Byte],
      from: Int, to: Int): Any = {
    // Feature = exactly one of bytes_list(1) / float_list(2) / int64_list(3);
    // the oneof members are messages, so the kind entry itself must be LEN.
    val lists = fields(b, from, to)
    if (lists.isEmpty) return null
    val (kind, wt, l0, l1) = lists.head
    if (wt != 2) return null
    (dt, kind) match {
      case (StringType, 1) =>
        fields(b, l0, l1).headOption.collect { case (1, 2, v0, v1) =>
          org.apache.spark.unsafe.types.UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, v0, v1))
        }.orNull
      case (BinaryType, 1) =>
        fields(b, l0, l1).headOption.collect { case (1, 2, v0, v1) =>
          java.util.Arrays.copyOfRange(b, v0, v1)
        }.orNull
      case (LongType, 3) =>
        listLongs(b, l0, l1).headOption.map(Long.box).orNull
      case (ArrayType(LongType, _), 3) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          listLongs(b, l0, l1).toArray)
      case (FloatType, 2) =>
        listFloats(b, l0, l1).headOption.map(Float.box).orNull
      case (ArrayType(FloatType, _), 2) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          listFloats(b, l0, l1).toArray)
      case _ => null // kind mismatch → null field
    }
  }

  /** Int64List body: packed (LEN of varints) and unpacked (one wire-type-0
    * entry per value) field-1 entries both accepted, concatenated in wire
    * order — proto parsers must accept either encoding of a repeated
    * scalar, and mixed entries concatenate.
    */
  private def listLongs(b: Array[Byte], l0: Int, l1: Int): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    fields(b, l0, l1).foreach {
      case (1, 2, p0, p1) =>
        var p = p0
        while (p < p1) { val (v, p2) = varint(b, p, p1); out += v; p = p2 }
      case (1, 0, p0, p1) => out += varint(b, p0, p1)._1
      case _ => ()
    }
    out.result()
  }

  /** FloatList body: packed field-1 entries must be a whole number of
    * float32s — a truncated body fails the feature (→ null field) rather
    * than fabricating a garbage trailing value from adjacent bytes;
    * unpacked wire-type-5 entries are one float each.
    */
  private def listFloats(b: Array[Byte], l0: Int, l1: Int): Seq[Float] = {
    def f(p: Int): Float = java.lang.Float.intBitsToFloat(
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24))
    val out = Seq.newBuilder[Float]
    fields(b, l0, l1).foreach {
      case (1, 2, p0, p1) =>
        if ((p1 - p0) % 4 != 0)
          throw new IllegalArgumentException("truncated packed float list")
        var p = p0
        while (p < p1) { out += f(p); p += 4 }
      case (1, 5, p0, _) => out += f(p0)
      case _ => ()
    }
    out.result()
  }

  def tfExampleDecode(c: Column, schema: StructType): Column =
    ExpressionUtils.column(TfExampleDecode(ExpressionUtils.expression(c), schema))
}
