package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full curation pipeline as ONE auditable operator: every document
  * gets a verdict row naming the FIRST stage that dropped it (or `kept`)
  * — the decision ledger a data-governance review asks for ("why is this
  * document in/out of the training set?"), and the shape every serious
  * pretraining pipeline ends up hand-rolling.
  *
  * Stage order is the conventional cheap-to-expensive cascade, and each
  * stage sees only the survivors of the previous one (a near-duplicate
  * of a quality-rejected document is NOT a dup — its twin is already
  * gone):
  *
  *   1. `blocked_source` — curated source/domain blocklist
  *      ([[Corpus.withoutSources]] semantics: NULL source is blocked);
  *   2. `quality`        — the Gopher-style composite gate
  *      ([[TextAnalysis.qualityGate]]; the gate's reason is surfaced in
  *      `quality_reason`);
  *   3. `exact_dup`      — content-hash dedup, min-id survivor
  *      ([[Dedup.exact]] rule);
  *   4. `near_dup`       — MinHash-LSH pairs → connected components →
  *      min-id survivor ([[Dedup.minHashPairs]] + [[Dedup.resolveClusters]]);
  *   5. `contaminated`   — benchmark n-gram collision
  *      ([[Dedup.decontaminate]], any-hit rule);
  *   6. `quota`          — per-source cap ([[Corpus.sourceQuota]],
  *      deterministic smallest-hash winners).
  *
  * Scale: the cascade is exactly as expensive as its parts — each stage
  * is one pass over ITS survivor set, the expensive stages (minhash,
  * decontamination) run on the already-thinned corpus, and the ledger
  * assembly joins doc-id-sized marker frames (not text) back onto the
  * input. Each survivor frame is EAGERLY checkpointed (the
  * `Refresh.materialize` discipline): six downstream marker frames hang
  * off the cascade, and without the barriers each one re-executed the
  * whole upstream chain — the gate's n-gram aggregations ran 5× per
  * ledger (measured 10s → 4s warm at sf0.1). Determinism is
  * inherited: every stage's decision is hash- or min-id-based, never
  * RNG, so the ledger is reproducible row for row (and DuckDB-oracled
  * end to end as `q_x_curation_ledger`).
  *
  * `bench` must carry `idCol` and `textCol`; `blockedSources`' first
  * column is the blocklist.
  */
object Curation {

  /** `fittedThresholds`: when present (the
    * [[TextAnalysis.gateThresholdsBySource]] / refit row shape), stage 2
    * runs [[TextAnalysis.qualityGateFitted]] with per-source data-fitted
    * thresholds instead of the scalar constants — the drifted-re-release
    * path composed end to end.
    */
  def ledger(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      bench: DataFrame, blockedSources: DataFrame, quota: Int,
      minTokens: Long = 5, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      minTypeToken: Double = 0.2, maxDupGramFrac: Double = 0.75,
      contamN: Int = 5, maxJaccardDist: Double = 0.3,
      quotaSalts: Int = 16,
      fittedThresholds: Option[DataFrame] = None): DataFrame = {
    require(quota > 0)
    val d0 = docs.select(col(idCol).as("doc"), col(textCol).as("text"),
      col(sourceCol).as("source"))

    // 1. blocklist — broadcast; NULL source blocked (NOT IN semantics).
    val b = broadcast(blockedSources
      .select(col(blockedSources.columns.head).cast("string").as("__bsrc")).distinct())
    val flagged = d0.join(b, col("source") === col("__bsrc"), "left")
      .withColumn("__blocked", col("__bsrc").isNotNull || col("source").isNull)
      .drop("__bsrc")
    val alive1 = flagged.filter(!col("__blocked")).select("doc", "text", "source")
      .localCheckpoint(true)

    // 2. quality gate over blocklist survivors — scalar constants, or
    // the per-source fitted thresholds when the caller re-fit after drift.
    val qreasons = fittedThresholds.fold(
        TextAnalysis.qualityGate(alive1, "doc", "text",
          minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
          minTypeToken, maxDupGramFrac))(thr =>
        TextAnalysis.qualityGateFitted(alive1, "doc", "text", "source", thr))
      .select(col("doc"), col("reason").as("quality_reason"))
      .localCheckpoint(true)
    val alive2 = alive1.join(
      qreasons.filter(col("quality_reason") === "keep").select("doc"),
      Seq("doc"), "left_semi")

    // 3. exact dedup — min-id survivor per content hash.
    val exFail = alive2.select(col("doc"), md5(col("text")).as("__h"))
      .withColumn("__keep", min("doc").over(
        org.apache.spark.sql.expressions.Window.partitionBy("__h")))
      .filter(col("doc") =!= col("__keep")).select("doc")
    val alive3 = alive2.join(exFail, Seq("doc"), "left_anti")
      .localCheckpoint(true)

    // 4. near-dup dedup among exact survivors.
    val pairs = Dedup.minHashPairs(alive3, "doc", "text", maxJaccardDist)
    val ndFail = Dedup.resolveClusters(pairs, "id_a", "id_b")
      .filter(col("cluster") =!= col("v")).select(col("v").as("doc"))
    val alive4 = alive3.join(ndFail, Seq("doc"), "left_anti")
      .localCheckpoint(true)

    // 5. benchmark decontamination among dedup survivors.
    val contamFail = Dedup.decontaminate(alive4,
        bench.select(col(idCol).as("doc"), col(textCol).as("text")),
        "doc", "text", contamN)
      .filter(col("contaminated")).select("doc")
      .localCheckpoint(true)
    val alive5 = alive4.join(contamFail, Seq("doc"), "left_anti")

    // 6. per-source quota among everything that survived.
    val quotaKeep = Corpus.sourceQuota(alive5.select("doc", "source"),
        col("doc"), col("source"), quota, quotaSalts)
      .select(col("doc"), lit(true).as("__qk"))

    // Ledger assembly: doc-id-sized markers join back onto the corpus;
    // CASE order = stage order, so each doc reports its FIRST failure.
    flagged.select("doc", "source", "__blocked")
      .join(qreasons, Seq("doc"), "left")
      .join(exFail.withColumn("__ex", lit(true)), Seq("doc"), "left")
      .join(ndFail.withColumn("__nd", lit(true)), Seq("doc"), "left")
      .join(contamFail.withColumn("__ct", lit(true)), Seq("doc"), "left")
      .join(quotaKeep, Seq("doc"), "left")
      .select(col("doc"), col("source"),
        when(col("__blocked"), "blocked_source")
          .when(col("quality_reason") =!= "keep", "quality")
          .when(col("__ex"), "exact_dup")
          .when(col("__nd"), "near_dup")
          .when(col("__ct"), "contaminated")
          .when(col("__qk").isNull, "quota")
          .otherwise("kept").as("stage"),
        when(!col("__blocked") && col("quality_reason") =!= "keep",
          col("quality_reason")).as("quality_reason"))
      .withColumn("kept", col("stage") === "kept")
  }

  /** One micro-batch of the STREAMING curation cascade — the shared core
    * of [[graft.streaming.EventStream.curationStream]] and its batch-mode
    * replay oracle (`q_x_curation_stream`): the stream's foreachBatch
    * calls exactly this, so the oracle's two-day replay covers the SAME
    * code path the continuous pipeline runs.
    *
    * Inputs: `b0` is the micro-batch as (doc, text, source); the state
    * frames are the accepted corpus' near-dup index (`corpusShingles`
    * (doc, s) / `corpusBands` (doc, band, sig)), the lifetime per-source
    * accepted counts (`sourceCounts` (source, n)), and the
    * decontamination state (`benchShingles` (s) + `bloomWords`
    * (w, bits)); empty frames degrade each stage to a no-op (batch one
    * of a fresh corpus). Returns (accepted (doc, text, source), ledger
    * (doc, source, stage, quality_reason, kept)), both eagerly
    * checkpointed — six marker frames hang off the cascade (the batch
    * [[ledger]] discipline).
    *
    * Stage semantics vs the batch ledger, where they differ:
    *   - `near_dup` covers both within-batch cluster losers and
    *     accepted-corpus near-dups ([[Dedup.incrementalDedupStep]]'s
    *     greedy arrival-order contract);
    *   - `quota` is ARRIVAL-ORDER greedy: lifetime count so far plus
    *     doc-id rank within the batch, capped at `quota` — a stream
    *     cannot un-accept yesterday's documents (the batch operator's
    *     smallest-hash sample would).
    */
  def curationStep(b0: DataFrame,
      corpusShingles: DataFrame, corpusBands: DataFrame,
      sourceCounts: DataFrame,
      benchShingles: DataFrame, bloomWords: DataFrame,
      blockedSources: Seq[String], quota: Int,
      minTokens: Long = 5, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      minTypeToken: Double = 0.2, maxDupGramFrac: Double = 0.75,
      maxJaccardDist: Double = 0.3, numHashTables: Int = 5, n: Int = 3,
      contamN: Int = 5, mBits: Int = 1 << 20,
      kProbes: Int = 4): (DataFrame, DataFrame) = {
    require(quota > 0)
    // 1. blocklist (literal set — blocklists are driver-sized).
    val blockedSet = b0.filter(col("source").isNull ||
      col("source").isin(blockedSources.map(x => x: Any): _*)).select("doc")
    val alive1 = b0.join(blockedSet, Seq("doc"), "left_anti").localCheckpoint(true)
    // 2. quality gate.
    val qreasons = TextAnalysis.qualityGate(alive1, "doc", "text",
        minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
        minTypeToken, maxDupGramFrac)
      .select(col("doc"), col("reason")).localCheckpoint(true)
    val alive2 = alive1.join(
      qreasons.filter(col("reason") === "keep").select("doc"), Seq("doc"), "left_semi")
    // 3. within-batch exact dedup (min-id survivor).
    val exFail = alive2.select(col("doc"), md5(col("text")).as("__h"))
      .withColumn("__keep", min("doc").over(
        org.apache.spark.sql.expressions.Window.partitionBy("__h")))
      .filter(col("doc") =!= col("__keep")).select("doc")
    val alive3 = alive2.join(exFail, Seq("doc"), "left_anti").localCheckpoint(true)
    // 4. near-dup: within batch + against the accepted-corpus index.
    val ndSurvive = Dedup.incrementalDedupStep(alive3, "doc", "text",
      corpusShingles, corpusBands, maxJaccardDist, numHashTables, n)
      .select("doc")
    val ndFail = alive3.select("doc").join(ndSurvive, Seq("doc"), "left_anti")
    val alive4 = alive3.join(ndSurvive, Seq("doc"), "left_semi").localCheckpoint(true)
    // 5. decontamination against the streamed bench state.
    val ctFail = Dedup.decontaminateBloomWith(alive4, "doc", "text",
        benchShingles, bloomWords, contamN, mBits, kProbes)
      .filter(col("contaminated")).select("doc").localCheckpoint(true)
    val alive5 = alive4.join(ctFail, Seq("doc"), "left_anti")
    // 6. incremental per-source quota: lifetime-accepted counts +
    // arrival rank (doc-id order within the batch).
    val ranked = alive5.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc")).cast("long"))
      .join(sourceCounts.withColumnRenamed("n", "__sofar"), Seq("source"), "left")
      .withColumn("__sofar", coalesce(col("__sofar"), lit(0L)))
    val accepted = ranked.filter(col("__sofar") + col("__rn") <= quota)
      .select("doc", "text", "source").localCheckpoint(true)
    val quotaFail = alive5.select("doc")
      .join(accepted.select("doc"), Seq("doc"), "left_anti")
    // ledger rows for EVERY input doc, first failing stage wins.
    val ledger = b0.select("doc", "source")
      .join(blockedSet.withColumn("__b", lit(true)), Seq("doc"), "left")
      .join(qreasons.withColumnRenamed("reason", "__q"), Seq("doc"), "left")
      .join(exFail.withColumn("__ex", lit(true)), Seq("doc"), "left")
      .join(ndFail.withColumn("__nd", lit(true)), Seq("doc"), "left")
      .join(ctFail.withColumn("__ct", lit(true)), Seq("doc"), "left")
      .join(quotaFail.withColumn("__qt", lit(true)), Seq("doc"), "left")
      .select(col("doc"), col("source"),
        when(col("__b"), "blocked_source")
          .when(col("__q") =!= "keep", "quality")
          .when(col("__ex"), "exact_dup")
          .when(col("__nd"), "near_dup")
          .when(col("__ct"), "contaminated")
          .when(col("__qt"), "quota")
          .otherwise("kept").as("stage"),
        when(col("__b").isNull && col("__q") =!= "keep", col("__q"))
          .as("quality_reason"))
      .withColumn("kept", col("stage") === "kept")
      .localCheckpoint(true)
    (accepted, ledger)
  }

  /** Per-source attrition roll-up of a [[ledger]] (or
    * [[curationStep]] ledger) — where the documents AND the tokens went,
    * by (source, stage): the one-look governance answer to "why is this
    * source under-represented in the release" and the denominator for
    * mixture re-planning after curation. One ledger⋈token-counts join +
    * a map-side-combining aggregate; output is sources × stages rows.
    */
  def attrition(ledgerDf: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    ledgerDf
      .join(docs.select(col(idCol).as("doc"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("__nt")),
        Seq("doc"))
      .groupBy("source", "stage")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"))

  /** Governance diff between two curation runs' ledgers — the
    * release-to-release answer to "what changed, and why": every
    * document classifies as
    *   `added`     — only in B (new upstream data),
    *   `removed`   — only in A (data withdrawn upstream),
    *   `regressed` — kept by A, dropped by B (`stage_b` says why),
    *   `recovered` — dropped by A, kept by B,
    *   `restaged`  — dropped by both but at a different stage (a rule
    *                 or threshold change moved the verdict earlier or
    *                 later in the cascade),
    *   `same`      — identical verdict.
    * Inputs are two [[ledger]]-shaped frames (doc, source, stage, …).
    * Scale: ONE full-outer equi-join on doc over two narrow
    * corpus-sized frames plus a codegen'd CASE — nothing quadratic;
    * roll up per (source, change) downstream with a map-side agg.
    */
  def ledgerDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val la = a.select(col("doc"), col("source").as("__sa"),
      col("stage").as("stage_a"))
    val lb = b.select(col("doc"), col("source").as("__sb"),
      col("stage").as("stage_b"))
    la.join(lb, Seq("doc"), "full_outer")
      .select(col("doc"), coalesce(col("__sb"), col("__sa")).as("source"),
        col("stage_a"), col("stage_b"),
        when(col("stage_a").isNull, "added")
          .when(col("stage_b").isNull, "removed")
          .when(col("stage_a") === "kept" && col("stage_b") =!= "kept", "regressed")
          .when(col("stage_a") =!= "kept" && col("stage_b") === "kept", "recovered")
          .when(col("stage_a") =!= col("stage_b"), "restaged")
          .otherwise("same").as("change"))
  }
}
