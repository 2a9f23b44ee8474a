package graft.functions

import graft.llmops.PortableHash
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch — the §2.11 custom-UDAF
  * escalation exercised for real: a bounded-memory `Aggregator` (public
  * API, typed, mergeable) whose state is the k smallest DISTINCT 52-bit
  * hashes seen. Estimator: D̂ = (k−1)/U₍ₖ₎ with U₍ₖ₎ the kth smallest hash
  * normalized to [0,1]; exact when fewer than k distinct values exist.
  *
  * Why KMV and not HLL here: min-k of a set is ORDER-INVARIANT — the
  * sketch is deterministic under any partitioning, shuffle order, or
  * merge tree, and (on PortableHash) bit-identical to a SQL oracle
  * (`ORDER BY hash LIMIT k` — q_x_distinct_sketch), so the approximate
  * path gets a hash-match correctness gate, not a tolerance test. Standard
  * error ≈ 1/√(k−2) (~6% at k = 256). State is 8k bytes per group;
  * merge is a sorted-array merge — safe at any group count.
  */
class KMinValuesAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // fast reject: full buffer and h no smaller than the current kth min.
    if (buf.length == k && h >= buf(k - 1)) buf
    else {
      val i = java.util.Arrays.binarySearch(buf, h)
      if (i >= 0) buf // already present — KMV is over DISTINCT hashes
      else {
        val ins = -i - 1
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || v != last) { out(n) = v; n = n + 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge ALREADY-BUILT KMV sketch columns (one array per input row) —
  * the aggregate that lets a KMV state column ride the IncrementalAgg
  * delta-fold path: reduce and merge are both the sorted-k-min merge, so
  * `merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)` exactly (min-k of a
  * set is order- and partition-invariant — spec-asserted as a merge
  * law in IncrementalAggSpec).
  */
class KMinValuesMergeAgg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val inner = new KMinValuesAgg(k)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
    inner.merge(buf, if (in == null) Array.emptyLongArray else in)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KMinValues {

  /** The KMV sketch of `c`'s distinct values as an aggregate column:
    * hash at scan speed (codegen'd PortableHash), bounded k-min state.
    */
  def sketch(c: Column, k: Int = 256): Column =
    udaf(new KMinValuesAgg(k), org.apache.spark.sql.Encoders.scalaLong)
      .apply(PortableHash.hash52(c.cast("string")))

  /** Merge a column of KMV sketches built with the same k. */
  def mergeSketch(c: Column, k: Int = 256): Column =
    udaf(new KMinValuesMergeAgg(k), ExpressionEncoder[Array[Long]]()).apply(c)

  /** Distinct-count estimate from a sketch column: exact below k, else
    * (k−1) · 2⁵² / kth-min. The arithmetic shape mirrors the SQL oracle
    * token for token so both engines produce the identical double.
    */
  def estimate(kmv: Column, k: Int = 256): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4503599627370496.0) / element_at(kmv, k))
}
