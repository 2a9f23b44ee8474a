package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded count histogram as a mergeable per-key state column — the
  * EXACT OCCURRENCE-quantile sketch the incremental/streaming reports
  * were missing: the bottom-k sample (`qs`) answers DISTINCT-VALUE
  * quantiles only (loudly documented there), while per-occurrence
  * quantiles (median document LENGTH, not median distinct length) are
  * not mergeable exactly in bounded space — unless the value domain is
  * granulated. For bounded non-negative measures (token counts, doc
  * lengths, latencies) that granulated form IS exact: bucket
  * `min(value div g, B-1)`, count occurrences per bucket, and any
  * quantile is exact to granularity `g` for values < g·(B−1) (the last
  * bucket clamps the overflow tail — size B·g past the domain's
  * practical max, or accept "≥ floor of the top bucket" there).
  *
  * State is a fixed B-long array (the [[CountMinArrayAgg]] shape): the
  * zero state is the empty array so untouched groups cost nothing, and
  * the merge is element-wise addition — counter sums commute, so
  * `merge(hist(A), hist(B)) ≡ hist(A ∪ B)` holds EXACTLY for any split
  * and order (the IncrementalAgg merge-law contract). Negative values
  * clamp to bucket 0 by the non-negative-measure contract.
  */
class LongHistogramAgg(buckets: Int, granularity: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(buckets >= 1 && granularity >= 1)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf0: Array[Long], v: Long): Array[Long] = {
    val buf = if (buf0.isEmpty) new Array[Long](buckets) else buf0
    val idx = math.min(math.max(v, 0L) / granularity, buckets - 1L).toInt
    buf(idx) += 1
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    LongHistogram.addDense(a, b)
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.isEmpty) new Array[Long](buckets) else buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** WEIGHTED histogram: each (value, weight) occurrence adds `weight` to
  * the value's bucket — the "median TOKEN's document length" form (an
  * unweighted histogram answers "the median DOCUMENT's length"; compute
  * budgeting usually wants the former — half the corpus volume, not half
  * the document count). Same state shape, same exact merge law, same
  * extraction: [[LongHistogram.quantiles]]/[[LongHistogram.quantileCol]]
  * read it with n = the WEIGHT total. Negative weights are rejected (a
  * count histogram has no anti-occurrences).
  */
class LongHistogramWeightedAgg(buckets: Int, granularity: Long)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(buckets >= 1 && granularity >= 1)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf0: Array[Long], vw: (Long, Long)): Array[Long] = {
    require(vw._2 >= 0, s"negative weight ${vw._2}")
    val buf = if (buf0.isEmpty) new Array[Long](buckets) else buf0
    val idx = math.min(math.max(vw._1, 0L) / granularity, buckets - 1L).toInt
    buf(idx) += vw._2
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    LongHistogram.addDense(a, b)
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.isEmpty) new Array[Long](buckets) else buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge ALREADY-BUILT histograms (element-wise add; same B both sides). */
class LongHistogramMergeAgg(buckets: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
    LongHistogram.addDense(buf, if (in == null) Array.emptyLongArray else in)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    LongHistogram.addDense(a, b)
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.isEmpty) new Array[Long](buckets) else buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object LongHistogram {

  private[functions] def addDense(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"histogram size mismatch: ${a.length} vs ${b.length}")
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
      out
    }

  /** Per-key histogram state over `c`'s long values. */
  def sketch(c: Column, buckets: Int = 256, granularity: Long = 16): Column =
    udaf(new LongHistogramAgg(buckets, granularity),
      org.apache.spark.sql.Encoders.scalaLong).apply(c.cast("long"))

  /** Merge a column of histograms built with the same (buckets, granularity). */
  def mergeSketch(c: Column, buckets: Int = 256): Column =
    udaf(new LongHistogramMergeAgg(buckets), ExpressionEncoder[Array[Long]]()).apply(c)

  /** Per-key WEIGHTED histogram state over (value, weight) pairs. */
  def sketchWeighted(value: Column, weight: Column, buckets: Int = 256,
      granularity: Long = 16): Column =
    udaf(new LongHistogramWeightedAgg(buckets, granularity),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .apply(value.cast("long"), weight.cast("long"))

  /** Exact g-granular occurrence quantiles from the state: for each
    * requested percentile p, the rank rule is [[graft.operators.Quantiles]]'
    * lower rank `floor((n−1)·p/100) + 1` over OCCURRENCES, the answering
    * bucket is the first whose cumulative count reaches it, and the
    * reported value is that bucket's floor `idx·g` (exact to within
    * g−1 when the true value is below the clamp; integer arithmetic
    * end to end, so engine-portable). Emits one row per key:
    * (keys..., n, p<p1>, p<p2>, ...). Keys with all-zero histograms
    * (no occurrences) emit NULL quantiles. The state is one bounded row
    * per key, so the explode + per-key running sum here shuffles
    * keys × B narrow rows — report-sized, never corpus-sized.
    */
  /** Scalar form of [[quantiles]] for report projections: the p-th exact
    * g-granular occurrence quantile straight from one histogram column,
    * given the group's total occurrence count `n` (the reports carry it
    * already — n_docs). Same lower-rank rule; NULL when n = 0. Runs an
    * interpreted HOF fold over B elements per ROW — report-sized frames
    * only (one row per source/key), never the corpus.
    */
  def quantileCol(hist: Column, n: Column, p: Int, granularity: Long = 16): Column = {
    require(p >= 0 && p <= 100)
    val rank = ((n - lit(1L)) * lit(p.toLong) / lit(100L)).cast("long") + lit(1L)
    val z = struct(lit(0L).as("cum"), lit(-1L).as("ans"), lit(0L).as("i"))
    val folded = aggregate(hist, z, (acc, x) => {
      val cum = acc("cum") + x
      struct(cum.as("cum"),
        when(acc("ans") === -1L && cum >= rank, acc("i"))
          .otherwise(acc("ans")).as("ans"),
        (acc("i") + lit(1L)).as("i"))
    })
    when(n > 0 && folded("ans") >= 0, folded("ans") * granularity)
  }

  def quantiles(df: DataFrame, keyCols: Seq[String], histCol: String,
      ps: Seq[Int], granularity: Long = 16): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100))
    val exploded = df
      .select(keyCols.map(col) :+ posexplode(col(histCol)).as(Seq("idx", "cnt")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val cum = exploded
      .withColumn("__cum", sum("cnt").over(w))
      .withColumn("__n", sum("cnt").over(wAll))
    val qs = ps.map { p =>
      val rank = expr(s"((__n - 1) * $p) div 100") + lit(1L)
      min(when(col("__cum") >= rank && col("__n") > 0,
        col("idx").cast("long") * granularity)).as(s"p$p")
    }
    cum.groupBy(keyCols.map(col): _*)
      .agg(first(col("__n")).as("n"), qs: _*)
  }
}
