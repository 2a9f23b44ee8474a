// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (same pattern as GearBoundaries).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonicalization step every multilingual dedup/PII/tokenize pass needs
  * BEFORE hashing: `é` arrives from the crawl both precomposed (U+00E9)
  * and decomposed (`e` + combining U+0301), and every downstream operator
  * that keys on bytes — exact dedup's md5, MinHash shingles, the PII
  * regexes, BPE merges — silently treats the two spellings of one word as
  * different documents/tokens. NFC (canonical composition) is the W3C
  * interchange form; NFKC is deliberately NOT offered here (compatibility
  * folding is lossy — ligatures, superscripts and width-variants change
  * MEANING, a curation decision, not a canonicalization).
  *
  * Cross-engine oracled for real: DuckDB ships `nfc_normalize`, and both
  * engines implement the same Unicode 15 canonical composition, so the
  * oracle is value-exact, not spec-only. The codegen takes the
  * `Normalizer.isNormalized` fast path first — web text is
  * overwhelmingly already NFC, and the check is a scan without
  * allocation, so the hot path stays copy-free.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point. */
  def nfc(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
}
