// Hosted inside the org.apache.spark.sql namespace: AbstractDataType and
// classic.ExpressionUtils are private[sql] (the FloatVectorDot pattern).
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in ONE narrow pass —
  * the single-operator replacement for the explode → groupBy(doc, gram)
  * → groupBy(doc) → join chain of `TextAnalysis.ngramRepetition` (guide
  * §2.4: the per-doc statistics never needed a shuffle — every gram of a
  * document lives in its row already).
  *
  * Input: the document's token array. Output: NULL when the document has
  * fewer than `n` tokens (the old left-join-miss case), else a struct
  *
  *   (n_grams      — total adjacent n-gram count = |toks| − n + 1,
  *    top_gram     — the most frequent gram; ties break to the
  *                   BINARY-LARGEST gram, exactly Spark's
  *                   `max(struct(cnt, gram))` / the oracle's
  *                   `ORDER BY cnt DESC, gram DESC LIMIT 1`,
  *    top_count    — its occurrence count,
  *    dup_chars    — Σ cnt·numChars(gram) over grams with cnt > 1; 0
  *                   when nothing repeats, matching the old NULL-sum →
  *                   `coalesce(round(NULL/x), 0.0)` = 0.0 output).
  *
  * Grams are the space-joined adjacent token windows with `concat_ws`
  * null semantics (null tokens skipped — tokenizers never produce them,
  * stated for completeness); comparisons and character counts use
  * UTF8String binary order / numChars, identical to the SQL operators
  * they replace.
  */
case class NgramRepStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = NgramRepStats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ngram_rep"

  override def nullSafeEval(input: Any): Any =
    NgramRepStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rowCls = classOf[InternalRow].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val tmp = ctx.freshName("rep")
      s"""
         |$rowCls $tmp = org.apache.spark.sql.graftfn.NgramRepStats.compute($arr, $n);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepStats =
    copy(child = newChild)
}

object NgramRepStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** JVM kernel shared by eval and the generated code. Returns null when
    * the document yields no grams.
    */
  def compute(toks: ArrayData, n: Int): InternalRow = {
    val m = toks.numElements()
    if (m < n) return null
    val nGrams = m - n + 1
    val counts = new java.util.HashMap[UTF8String, Long](nGrams * 2)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nGrams) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      val gram = UTF8String.concatWs(Space, parts: _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      i += 1
    }
    var topGram: UTF8String = null
    var topCnt = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val c = e.getValue
      if (c > topCnt || (c == topCnt && (topGram == null || g.compareTo(topGram) > 0))) {
        topGram = g; topCnt = c
      }
      if (c > 1L) dupChars += c * g.numChars()
    }
    new GenericInternalRow(Array[Any](nGrams.toLong, topGram, topCnt, dupChars))
  }

  /** Column-API entry point over a token-array column. */
  def stats(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramRepStats(ExpressionUtils.expression(tokens), n))
}
