package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.ByteVectorDot

/** Int8 embedding quantization — the memory/shuffle scale path for
  * similarity search. Per-vector symmetric quantization:
  * `scale = 127 / max|v|`, `q_i = floor(v_i·scale + 0.5)` ∈ [−127, 127],
  * stored as Array[Byte] (1 byte/element in Tungsten vs 4 for float → 4×
  * more corpus per executor, 4× fewer shuffle bytes), dotted with the
  * codegen'd integer [[org.apache.spark.sql.graftfn.ByteVectorDot]].
  *
  * Everything is deterministic double arithmetic (explicit
  * `floor(x + 0.5)`, never engine-dependent half-even rounding), so the
  * full pipeline — scales, quantized values, candidate ranking, final
  * top-k — is replicated value-for-value by the DuckDB oracle.
  */
object Quantize {

  /** max|v| as double (exact: float abs/max then one widening cast). */
  private def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x))).cast("double")

  /** The quantization scale; zero vectors get scale 1 (they quantize to
    * all-zero either way, but ÷0 must not poison the row).
    */
  def scaleOf(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m === 0.0, lit(1.0)).otherwise(lit(127.0) / m)
  }

  /** Quantize an Array[Float] column to Array[Byte] with a precomputed
    * per-row scale column. The scale MUST be computed once outside the
    * lambda (as [[quantized]] does): `scaleOf` is an array_max scan, and
    * re-deriving it per element inside the transform would make
    * quantization O(d²) per row — in interpreted HOF evaluation, exactly
    * the cost this package elsewhere avoids.
    */
  def int8(vec: Column, scale: Column): Column =
    transform(vec, v => floor(v.cast("double") * scale + 0.5).cast("byte"))

  /** Corpus-side frame: (id, qvec, scale, + the original vector for exact
    * re-ranking). Scale is materialized as its own column first so the
    * per-element quantization does a single multiply.
    */
  def quantized(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        scaleOf(col(vecCol)).as("scale"))
      .select(col("id"), col("vec"),
        int8(col("vec"), col("scale")).as("qvec"), col("scale"))

  /** Two-stage ANN: rank candidates by QUANTIZED cosine (integer dot over
    * byte arrays — the cheap pass that would scan the 4×-compressed corpus
    * at scale), keep `candFactor·k` per query, then re-rank those few by
    * exact float cosine. Deterministic ties (score desc, cid) at both
    * stages, so the oracle replicates the exact candidate cut.
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      candFactor: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = quantized(corpus, idCol, vecCol)
      .select(col("id").as("cid"), col("vec").as("cvec"), col("qvec").as("cq"),
        sqrt(ByteVectorDot.bdot(col("qvec"), col("qvec")).cast("double")).as("cqn"),
        Similarity.l2norm(col("vec")).as("cn"))
    val q = quantized(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("vec").as("qvec_f"), col("qvec").as("qq"),
        sqrt(ByteVectorDot.bdot(col("qvec"), col("qvec")).cast("double")).as("qqn"),
        Similarity.l2norm(col("vec")).as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("qcos",
        ByteVectorDot.bdot(col("qq"), col("cq")).cast("double") / (col("qqn") * col("cqn")))
    val wq = Window.partitionBy("qid").orderBy(col("qcos").desc, col("cid"))
    val cands = scored.withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= k * candFactor)
    val wx = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    cands
      .withColumn("cos",
        Similarity.dot(col("qvec_f"), col("cvec")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wx).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("rn"), round(col("cos"), 6).as("cos"))
  }
}
