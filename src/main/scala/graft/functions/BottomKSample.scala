package graft.functions

import graft.llmops.PortableHash
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash VALUE sample — the deterministic mergeable sample
  * that completes the sketch-state family (KMV = distinct counts,
  * CountMin = frequencies, this = DISTINCT-VALUE QUANTILES).
  *
  * State: the k distinct values whose portable 52-bit hashes are
  * smallest, as an interleaved [h0, v0, h1, v1, …] array sorted by hash
  * (2k longs, bounded). Hashing makes the sample uniform over the
  * DISTINCT-value set and — like KMV — ORDER- AND PARTITION-INVARIANT:
  * merge is a sorted pair-merge, so
  * `merge(sample(A), sample(B)) ≡ sample(A ∪ B)` holds as array
  * equality for any split (IncrementalAggSpec asserts it), and the
  * whole state is replayed by the SQL oracle as
  * `ORDER BY hash LIMIT k`. Hash collisions (2⁻⁵² per pair) keep the
  * smaller value on both engines.
  *
  * SEMANTICS CAVEAT, stated loudly: quantiles derived from this sample
  * are quantiles of the DISTINCT-value distribution (each distinct value
  * weighted once), NOT of the multiset — duplicates collapse to one
  * hash. That is the useful diagnostic for key-space skew questions
  * ("median configured MTU", "p90 distinct doc length"); for
  * frequency-weighted quantiles over bounded groups use the exact
  * [[graft.operators.Quantiles]].
  */
class BottomKSampleAgg(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(k >= 2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val (h, v) = in
    val n = buf.length / 2
    if (n == k && h > buf(2 * (k - 1))) buf
    else {
      // binary search for h among the even (hash) slots.
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(2 * mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < n && buf(2 * lo) == h) {
        if (v < buf(2 * lo + 1)) buf(2 * lo + 1) = v // collision: min value
        buf
      } else {
        val m = math.min(n + 1, k)
        val out = new Array[Long](2 * m)
        System.arraycopy(buf, 0, out, 0, 2 * lo)
        out(2 * lo) = h
        out(2 * lo + 1) = v
        System.arraycopy(buf, 2 * lo, out, 2 * lo + 2, 2 * (m - lo - 1))
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a.length / 2
    val nb = b.length / 2
    val out = new Array[Long](2 * math.min(na + nb, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length / 2 && (i < na || j < nb)) {
      val takeA = j >= nb || (i < na && a(2 * i) <= b(2 * j))
      val h = if (takeA) a(2 * i) else b(2 * j)
      var v = if (takeA) a(2 * i + 1) else b(2 * j + 1)
      if (takeA) i += 1 else j += 1
      // same hash on the other side: consume it too, keep the min value.
      if (takeA && j < nb && b(2 * j) == h) { v = math.min(v, b(2 * j + 1)); j += 1 }
      else if (!takeA && i < na && a(2 * i) == h) { v = math.min(v, a(2 * i + 1)); i += 1 }
      out(2 * n) = h
      out(2 * n + 1) = v
      n += 1
    }
    if (n == out.length / 2) out else java.util.Arrays.copyOf(out, 2 * n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge ALREADY-BUILT bottom-k samples (the delta-fold aggregate). */
class BottomKSampleMergeAgg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val inner = new BottomKSampleAgg(k)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
    inner.merge(buf, if (in == null) Array.emptyLongArray else in)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BottomKSample {

  /** The bottom-k sample of `c` (an integral column) as an aggregate. */
  def sample(c: Column, k: Int = 256): Column =
    udaf(new BottomKSampleAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(PortableHash.hash52(c.cast("string")), c.cast("long"))

  /** Merge a column of samples built with the same k. */
  def mergeSample(c: Column, k: Int = 256): Column =
    udaf(new BottomKSampleMergeAgg(k), ExpressionEncoder[Array[Long]]()).apply(c)

  /** DISTINCT-value quantile `p` (percent) from a sample: the value at
    * 1-based ascending rank `floor((n−1)·p/100) + 1` over the sampled
    * values — the same lower-quantile rank rule as
    * [[graft.operators.Quantiles]], exact when the group has < k
    * distinct values. NULL on an empty sample.
    */
  def distinctQuantile(s: Column, p: Int): Column = {
    require(p >= 0 && p <= 100)
    val vals = array_sort(filter(s, (_, i) => i % 2 === 1))
    val n = size(s) / 2
    when(size(s) > 0,
      element_at(vals, (floor(((n - 1) * p) / 100) + 1).cast("int")))
  }
}
