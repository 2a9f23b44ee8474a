package graft.functions

import graft.llmops.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter as a pure-DataFrame bit-word table — the SEEN-SET a crawl
  * pipeline keeps across drops: "have we fetched this canonical URL in any
  * previous crawl?" answered in O(m/32) broadcastable rows instead of a
  * join against every URL ever seen. No false negatives ever (a seen key
  * always probes positive — the law the spec pins); false positives at the
  * classic `(1 − e^(−nk/m))^k` rate, which for dedup means at worst a
  * re-fetch skipped, never a loss.
  *
  * Same portability discipline as [[CountMin]]: position j of a key is
  * `minhashPerm_j(hash52(key)) mod m` — fixed PortableHash permutations,
  * bit-for-bit reproducible in the DuckDB oracle. The filter materializes
  * as (word_idx, word) rows of 32-bit words (masks stay positive on every
  * engine — a 64-bit word's bit 63 flips sign under BIGINT shift on some
  * engines, 32-bit words sidestep the class). Building is ONE shuffle
  * capped at m/32 rows after map-side bit_or partials; filters over the
  * same (m, k) MERGE by word-wise bit_or — `merge(bloom(A), bloom(B)) ≡
  * bloom(A ∪ B)` exactly (OR commutes; the merge law the spec asserts) —
  * which is what makes the structure per-crawl composable. Probing
  * broadcasts the tiny word table and stays shuffle-free on the (usually
  * enormous) probe side until the final per-key all-bits conjunction.
  *
  * Relation to [[graft.llmops.Dedup]]'s decontamination prefilter: that
  * one is an INLINE Bloom over bench shingle hashes, private to the
  * decontaminate pipeline and rebuilt per run; this is the standalone,
  * MERGEABLE form a pipeline persists and composes across crawls (the
  * seen-set lives longer than any one job — merge law required).
  */
object Bloom {

  /** The k bit positions of a key; array-typed so callers explode once. */
  private def positions(key: Column, mBits: Long, k: Int): Column = {
    require(k >= 1 && k <= PortableHash.MinHashA.length,
      s"k must be in [1, ${PortableHash.MinHashA.length}]")
    require(mBits >= 32 && mBits <= PortableHash.P,
      "mBits must be in [32, 2^31-1] for uniform positions")
    val h = PortableHash.hash52(key.cast("string"))
    array((0 until k).map(j => PortableHash.minhashPerm(h, j) % mBits): _*)
  }

  // callers bind the position column as `pos`; shiftright = div 32
  // (positions are nonnegative), mask < 2^32 stays positive in a long
  private def wordMask(pos: Column): (Column, Column) =
    (shiftright(pos, 5), expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"))

  /** Build the (word_idx, word) filter table over `keyCol`. NULL keys are
    * NOT keys and are ignored (explicitly filtered, not silently dropped
    * by a null hash): the filter tracks the non-null key set only, and
    * [[mightContain]] mirrors the contract by answering `false` for a
    * null probe — the no-false-negative law is over non-null keys.
    */
  def build(df: DataFrame, keyCol: String, mBits: Long = 1L << 16,
      k: Int = 4): DataFrame = {
    val (wi, mask) = wordMask(col("pos"))
    df.where(col(keyCol).isNotNull)
      .select(explode(positions(col(keyCol), mBits, k)).as("pos"))
      .select(wi.as("word_idx"), mask.as("__m"))
      .groupBy("word_idx").agg(expr("bit_or(__m)").as("word"))
  }

  /** Merge filters built with the SAME (mBits, k): words OR. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("word_idx").agg(expr("bit_or(word)").as("word"))

  /** Per-probe-key membership: true = maybe seen (false-positive rate
    * applies), false = DEFINITELY never seen (the side dedup acts on).
    * One output row per DISTINCT probe key, null included: a null probe
    * answers `false` (nulls are never keys — [[build]] ignores them), so
    * consumers joining the verdict back never see fewer rows than keys.
    */
  def mightContain(bloom: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Long = 1L << 16, k: Int = 4): DataFrame = {
    val (wi, mask) = wordMask(col("pos"))
    val answered = probes.where(col(keyCol).isNotNull)
      .select(col(keyCol), explode(positions(col(keyCol), mBits, k)).as("pos"))
      .select(col(keyCol), wi.as("word_idx"), mask.as("__m"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .withColumn("__hit",
        when(coalesce(col("word"), lit(0L)).bitwiseAND(col("__m")) =!= 0L, 1L)
          .otherwise(0L))
      .groupBy(keyCol)
      .agg((min("__hit") === 1L).as("might_contain"))
    val nullRow = probes.where(col(keyCol).isNull)
      .select(col(keyCol)).distinct()
      .withColumn("might_contain", lit(false))
    answered.unionByName(nullRow)
  }
}
