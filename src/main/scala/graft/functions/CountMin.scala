package graft.functions

import graft.llmops.PortableHash
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a pure-DataFrame pipeline — the mergeable frequency
  * summary a 100 TB pipeline keeps instead of a full per-key count table
  * (heavy-hitter detection, stopword discovery, join-size estimation).
  *
  * The sketch is a (d × w) counter grid, materialized as a DataFrame of
  * (j, bucket, cnt) cells: row j hashes each key with PortableHash
  * permutation j, so every counter — and therefore every estimate — is
  * reproducible bit-for-bit in the DuckDB oracle. Building it is ONE
  * shuffle (explode d cells per row, then groupBy with map-side partial
  * aggregation keeps the shuffle at ≤ d·w rows per partition); sketches
  * merge by unioning cell tables and re-summing, which is what makes the
  * structure per-shard / per-day composable. Estimates overcount (never
  * under): est(x) = min_j cell(j, h_j(x)), the classic CM guarantee
  * (Cormode & Muthukrishnan, "An improved data stream summary").
  */
/** CMS as a PER-KEY fixed array column (d·w longs, row j at offsets
  * [j·w, (j+1)·w)) — the state-column form of the (j, bucket, cnt) cell
  * table, sized for one-sketch-per-group use (pick a small w; the default
  * 4×64 is 2 KiB per key). Built from pre-hashed values; zero state is the
  * empty array so untouched groups cost nothing. Addition is element-wise,
  * so `merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)` holds EXACTLY (counter
  * sums commute — the merge law IncrementalAggSpec asserts).
  */
class CountMinArrayAgg(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(d >= 1 && d <= PortableHash.MinHashA.length && w >= 1)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf0: Array[Long], h: Long): Array[Long] = {
    val buf = if (buf0.isEmpty) new Array[Long](d * w) else buf0
    var j = 0
    while (j < d) {
      // identical arithmetic to CountMin.cells / the DuckDB oracle:
      // (a_j · (h mod P) + b_j) mod P mod w, all nonneg so % is safe.
      val p = ((PortableHash.MinHashA(j) * (h % PortableHash.P) +
        PortableHash.MinHashB(j)) % PortableHash.P % w).toInt
      buf(j * w + p) += 1
      j += 1
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = CountMin.addCells(a, b)
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.isEmpty) new Array[Long](d * w) else buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge ALREADY-BUILT per-key CMS arrays (element-wise add). */
class CountMinMergeAgg(d: Int, w: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
    CountMin.addCells(buf, if (in == null) Array.emptyLongArray else in)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = CountMin.addCells(a, b)
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.isEmpty) new Array[Long](d * w) else buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMin {

  require(PortableHash.MinHashA.length >= 4)

  private[functions] def addCells(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"CMS size mismatch: ${a.length} vs ${b.length}")
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
      out
    }

  /** Per-key CMS array over `c`'s values (see [[CountMinArrayAgg]]). */
  def sketchArray(c: Column, d: Int = 4, w: Int = 64): Column =
    udaf(new CountMinArrayAgg(d, w), org.apache.spark.sql.Encoders.scalaLong)
      .apply(PortableHash.hash52(c.cast("string")))

  /** Merge a column of per-key CMS arrays built with the same (d, w). */
  def mergeArray(c: Column, d: Int = 4, w: Int = 64): Column =
    udaf(new CountMinMergeAgg(d, w), ExpressionEncoder[Array[Long]]()).apply(c)

  /** Point estimate for `key` from a per-key CMS array: min over the d
    * probed cells — codegen'd element_at over the state column, the same
    * never-undercount bound as [[estimate]]. element_at is 1-based.
    */
  def estimateArray(cms: Column, key: Column, d: Int = 4, w: Int = 64): Column = {
    val h = PortableHash.hash52(key.cast("string"))
    val probes = (0 until d).map { j =>
      element_at(cms, ((PortableHash.minhashPerm(h, j) % w) + j * w + 1).cast("int"))
    }
    least(probes: _*)
  }

  private def cells(key: Column, d: Int, w: Int): Column = {
    val h = PortableHash.hash52(key.cast("string"))
    array((0 until d).map(j =>
      struct(lit(j).as("j"), (PortableHash.minhashPerm(h, j) % w).as("bucket"))): _*)
  }

  /** Build the sketch cell table (j, bucket, cnt) over `keyCol`.
    * d ≤ 16 (the PortableHash permutation pool); w trades memory (d·w
    * counters) against overcount (ε ≈ e/w of the total count).
    */
  def sketch(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 512): DataFrame =
    df.select(explode(cells(col(keyCol), d, w)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches built with the SAME (d, w): cells add. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("j", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for `probes.keyCol`: min over the d probed cells.
    * The sketch side is ≤ d·w rows — broadcast it so probing is
    * shuffle-free on the (usually much larger) probe side.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 512): DataFrame =
    probes.select(col(keyCol), explode(cells(col(keyCol), d, w)).as("c"))
      .select(col(keyCol), col("c.j").as("j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Equi-join cardinality estimate from two sketches over the join key
    * (same d, w): per row j, the inner product Σ_bucket aⱼᵦ·bⱼᵦ counts
    * every true matching pair once plus hash-collision noise, so
    * `min_j` of the row inner products is the classic never-undercount
    * estimate of |A ⋈ B| (AMS/CM inner-product bound). Cost: the two
    * ≤ d·w cell tables join on (j, bucket) — constant work however large
    * A and B are. This is the planner move: decide broadcast vs shuffle
    * vs salt BEFORE running a join, from per-shard sketches that merged
    * for free.
    *
    * A row j whose two sketches share NO occupied bucket has inner
    * product 0 — a legitimate (and tightest possible) estimate, so it
    * must reach the min rather than vanish from the inner join. The j
    * universe is recovered from the union of both cell tables and the
    * per-j inner product left-joined against it with a 0 default; empty
    * sketches estimate 0, not an all-NULL row.
    */
  /** EXACT φ = 1/k heavy hitters (every key with count·k > total), computed
    * with a sketch-pruned shuffle: pass 1 builds the CMS over `keyCol`;
    * pass 2 probes each occurrence against the broadcast j = 0 sketch row
    * and drops it unless its bucket's count could clear the threshold,
    * THEN runs the exact groupBy count + threshold filter on the
    * survivors. The output is PROVABLY the exact answer: CMS never
    * undercounts, so cnt₀(x) ≥ count(x) and no true heavy hitter is
    * pruned — the final exact filter kills any collision-inflated
    * impostors. (One probe row suffices for pruning; min-of-d only
    * tightens an already-sound bound.)
    *
    * Why prune at all when groupBy already partial-aggregates map-side:
    * the shuffle of a plain group-count carries one row per DISTINCT key
    * per partition — at web scale the long tail of once-seen tokens IS
    * the shuffle. The prune drops the tail before the exchange, so the
    * shuffle carries only keys living in the ≤ w buckets that beat the
    * threshold. The total `n` comes from the sketch itself (the j = 0 row
    * sums to it) — no separate count pass.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      w: Int = 512): DataFrame = {
    require(k >= 1)
    val sk0 = sketch(df, keyCol, d = 1, w = w)
      .select(col("bucket").as("__b"), col("cnt").as("__c0"))
    val total = sk0.agg(sum("__c0").as("__n"))
    val h = PortableHash.hash52(col(keyCol).cast("string"))
    df.select(col(keyCol), (PortableHash.minhashPerm(h, 0) % w).as("__b"))
      .join(broadcast(sk0), Seq("__b"))
      .crossJoin(broadcast(total))
      .filter(col("__c0") * k > col("__n"))
      .groupBy(keyCol).agg(count(lit(1)).as("cnt"), first("__n").as("__n"))
      .filter(col("cnt") * k > col("__n"))
      .select(col(keyCol), col("cnt"))
  }

  def joinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame = {
    val js = a.select("j").unionAll(b.select("j")).distinct()
    val ip = a.select(col("j"), col("bucket"), col("cnt").as("_ca"))
      .join(b.select(col("j"), col("bucket"), col("cnt").as("_cb")),
        Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("_ca") * col("_cb")).as("_ip"))
    js.join(ip, Seq("j"), "left")
      .agg(coalesce(min(coalesce(col("_ip"), lit(0L))), lit(0L))
        .cast("long").as("est_join_size"))
  }
}
