package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169) — the published method for steering a raw 100 TB
  * crawl toward a target distribution (e.g. "looks like Wikipedia +
  * books") WITHOUT a trained classifier: fit two hashed-n-gram bag
  * models — one on a (small) target sample, one on the raw pool —
  * score every raw document with its log importance weight
  * log p_target(doc) − log p_raw(doc), and resample proportionally.
  *
  * Everything is engine-exact and DuckDB-oracle-checkable
  * (`q_x_dsir`): buckets come from [[PortableHash.hash52]], the two
  * ln() calls (bucket log-probs, Gumbel noise) land on the BIGINT
  * micro-grid the [[Unigram]] trainer established (quantize-then-
  * decide — every comparison downstream of the ln is integer), and
  * the resampling "randomness" is a seeded hash, not an RNG.
  *
  * Scale shape (the reason DSIR wins at 100 TB where classifier
  * scoring needs a forward pass per doc):
  *   - feature extraction is one explode + one keyed count, corpus-
  *     linear, no driver state;
  *   - both fitted models are DENSE `buckets`-row tables (bounded by
  *     construction, default 2^12–2^16) that BROADCAST — scoring the
  *     raw pool is a map-side join + one groupBy(id), a single
  *     shuffle;
  *   - selection is Gumbel-top-k (Kool et al. 2019): sampling WITHOUT
  *     replacement ∝ exp(logw) reduces to a TakeOrdered over
  *     `logw + gumbel` — no global sort materializes, no rejection
  *     loop, k-bounded driver result.
  */
object Dsir {

  /** Hashed n-gram bucket counts per document: word unigrams + bigrams
    * from `tokens` (default [[TextAnalysis.wsTokens]] — thread
    * [[TextAnalysis.scriptTokens]] for CJK, the r10 rule), each gram
    * hashed onto one of `buckets` cells. Returns (id, bucket, cnt).
    * One explode + one keyed count; corpus-linear.
    */
  def hashedNgramCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int,
      tokens: Column => Column = TextAnalysis.wsTokens): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = tokens(col(textCol))
    // guarded bigram build (a 0/1-token doc contributes no bigrams)
    val bi = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    // spreadScan: the tokenize+explode+hash below is the expensive part
    // and runs in the SCAN stage — a single-row-group input would pin it
    // to one core (measured: 4.2 s single-task at sf0.1; guide §2.5).
    Corpus.spreadScan(df)
      .select(col(idCol).as("id"), explode(concat(toks, bi)).as("gram"))
      .select(col("id"),
        (PortableHash.hash52(col("gram")) % buckets).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Fit the hashed bag model: add-1-smoothed log-probability of every
    * one of the `buckets` cells, on the micro-nll grid —
    * `round(ln((cnt_b + 1) / (T + B)) · 10⁶)` as BIGINT. The output is
    * DENSE (exactly `buckets` rows, absent cells at the smoothing
    * floor), so downstream joins never need an absent-key branch. The
    * total is a broadcast scalar (the curriculumPhases discipline —
    * zero driver actions).
    */
  def bucketLogProbs(docCounts: DataFrame, buckets: Int): DataFrame = {
    val spark = docCounts.sparkSession
    val byBucket = docCounts.groupBy("bucket").agg(sum("cnt").as("cnt"))
    val tot = byBucket.agg(coalesce(sum("cnt"), lit(0L)).as("__t"))
    spark.range(buckets.toLong).select(col("id").as("bucket"))
      .join(byBucket, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
          (col("__t") + buckets.toLong).cast("double")) * 1e6)
          .cast("long").as("logp_micro"))
  }

  /** Per-document log importance weight (micro grid):
    * Σ_b cnt_doc(b) · (logp_target(b) − logp_raw(b)). `docCounts` is
    * the RAW pool's [[hashedNgramCounts]]; both prob tables must be
    * dense [[bucketLogProbs]] outputs over the same `buckets`. The
    * delta table is buckets-sized and broadcasts; the only shuffle is
    * the per-doc sum. Returns (id, logw_micro).
    */
  def dsirLogWeights(docCounts: DataFrame, targetProbs: DataFrame,
      rawProbs: DataFrame): DataFrame = {
    val delta = targetProbs.select(col("bucket"), col("logp_micro").as("__lt"))
      .join(rawProbs.select(col("bucket"), col("logp_micro").as("__lr")),
        Seq("bucket"))
      .select(col("bucket"), (col("__lt") - col("__lr")).as("__delta"))
    docCounts.join(broadcast(delta), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("cnt") * col("__delta")).as("logw_micro"))
  }

  /** Gumbel-top-k resampling WITHOUT replacement ∝ exp(logw / 10⁶)
    * (Kool et al. 2019): key = logw_micro + round(−ln(−ln(u)) · 10⁶)
    * with u a seeded-hash uniform in (0,1) — deterministic, replayable
    * on any engine, no RNG state. Ties break on id. Plans as one
    * TakeOrdered(k); k-bounded result. Returns
    * (id, logw_micro, key_micro).
    */
  def dsirSample(weights: DataFrame, k: Int, seedTag: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // (h % 2^24 + 0.5) / 2^24 ∈ (0,1) strictly — both ln() calls finite
    val u = (PortableHash.hash52(concat(lit(seedTag), lit(":"),
      col("id").cast("string"))) % 16777216L + lit(0.5)) / 16777216.0
    weights
      .withColumn("key_micro",
        col("logw_micro") + round(-log(-log(u)) * 1e6).cast("long"))
      .orderBy(col("key_micro").desc, col("id"))
      .limit(k)
      .select(col("id"), col("logw_micro"), col("key_micro"))
  }
}
