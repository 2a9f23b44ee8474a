package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-call RELEASE composer — the user story every operator in this
  * package exists for, executed end to end: raw documents in, a complete
  * training-data release directory out. Pure composition of the oracled
  * parts (nothing new is computed here — that is the point):
  *
  *   1. [[Curation.ledger]] — blocklist → quality gate → exact dedup →
  *      near-dup components → benchmark decontamination → per-source
  *      quota; the per-document verdict trail ships WITH the release.
  *   2. Deterministic train/valid/test split ([[Corpus.withSplit]]) of
  *      the SURVIVORS — the curation stage already removed near-dup
  *      clusters, so the cluster-straddle path [[Corpus.leakageSafeSplit]]
  *      guards is closed by construction (each cluster has one survivor;
  *      a singleton cannot straddle).
  *   3. Per-split `tf.train.Example` TFRecord shards
  *      ([[graft.ingest.TfRecords.writeExamples]], `codec` — gzip default,
  *      zstd for the faster-decode interchange form) — the artifact
  *      a `tf.data` input pipeline consumes unchanged.
  *   4. The governance sidecars, as parquet: the curation ledger
  *      (`_ledger`), its per-(source, stage) doc/token attrition roll-up
  *      (`_attrition`, [[Curation.attrition]]), the per-source data card
  *      over the released corpus (`_card`, [[Corpus.dataCard]]), and the
  *      per-split release manifest (`_manifest`, the
  *      [[Corpus.shardManifest]] shape keyed by split: exact doc/token
  *      counts + the order-invariant content checksum a replica
  *      verifies against).
  *
  * Layout under `dir`:
  * {{{
  *   train/part-NNNNN.tfrecord.gz   valid/...   test/...
  *   _ledger   _attrition   _card   _manifest   (parquet)
  *   _classifier                    (parquet, when a classifier gates)
  * }}}
  *
  * Returns the manifest (split, n_docs, n_tokens, content_xor) — the
  * shards-sized receipt. Scale: the survivors frame is checkpointed ONCE
  * and every downstream consumer (splits, shards, card, manifest) reads
  * that materialization; everything else is the component operators'
  * own documented shapes.
  */
object Release {

  /** `gateThresholds`: pre-fit per-source gate thresholds (the
    * [[TextAnalysis.gateThresholdsBySource]] / [[TextAnalysis.refitGateOnDrift]]
    * row shape, keyed by a `source`-named column) — pass the refit output
    * here and the drifted re-release runs the re-fit gate instead of the
    * scalar constants, end to end.
    *
    * `classifier`: a trained [[Classify.trainPerceptron]] weight table
    * (feat, w). When present, the release adds MODEL-BASED selection on
    * top of the rule cascade — the FineWeb-Edu shape: the rule ledger
    * curates, then every curation survivor is scored at scan speed
    * ([[Classify.scorePerceptron]], `classifierDim` must match the dim
    * the weights were trained at) and only `pred = +1` docs ship. The
    * per-doc scores of ALL curation survivors (kept and
    * classifier-rejected alike) land in a fifth sidecar `_classifier`
    * (doc, margin, pred) — the governance trail for the model's
    * verdicts, symmetric with the ledger's for the rules. The ledger
    * itself is untouched: rule verdicts and model verdicts are separate
    * records with separate provenance.
    */
  def release(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, bench: DataFrame, blockedSources: DataFrame,
      dir: String, quota: Int, shards: Int = 4, codec: String = "gzip",
      splits: Seq[(String, Int)] =
        Seq("train" -> 9800, "valid" -> 100, "test" -> 100),
      gateThresholds: Option[DataFrame] = None,
      classifier: Option[DataFrame] = None,
      classifierDim: Int = 1024): DataFrame = {
    require(shards >= 1 && splits.nonEmpty)
    val led = Curation.ledger(docs, idCol, textCol, sourceCol, bench,
      blockedSources, quota, fittedThresholds = gateThresholds)
      .localCheckpoint(true)
    led.write.mode("overwrite").parquet(s"$dir/_ledger")
    // governance sidecar #4: the per-(source, stage) doc/token attrition
    // roll-up — "where did this source's tokens go" ships WITH the release.
    Curation.attrition(led, docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$dir/_attrition")
    val survivors = docs
      .select(col(idCol).as("doc"), col(textCol).as("text"),
        col(sourceCol).as("source"))
      .join(led.filter(col("kept")).select("doc"), Seq("doc"))
      .localCheckpoint(true)
    val kept = classifier.fold(survivors) { w =>
      val scores = Classify.scorePerceptron(survivors,
          Classify.hashedFeatures(survivors, "doc", "text", classifierDim),
          w, "doc")
        .localCheckpoint(true)
      scores.write.mode("overwrite").parquet(s"$dir/_classifier")
      survivors.join(scores.filter(col("pred") > 0).select("doc"), Seq("doc"))
        .localCheckpoint(true)
    }
    val assigned = Corpus.withSplit(kept, col("doc"), splits)
    splits.foreach { case (name, _) =>
      graft.ingest.TfRecords.writeExamples(
        assigned.filter(col("split") === name)
          .select(col("doc").as("id"), col("text").as("t"),
            col("source").as("src")),
        s"$dir/$name", shards, codec)
    }
    Corpus.dataCard(kept, "doc", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/_card")
    val manifest = Corpus.shardManifest(assigned, col("split"), "doc", "text")
      .withColumnRenamed("shard", "split")
      .localCheckpoint(true)
    manifest.write.mode("overwrite").parquet(s"$dir/_manifest")
    manifest
  }

  /** Preference-pair (DPO) release — [[Corpus.preferencePairs]]' output
    * shipped the way [[release]] ships documents. `pairs` must carry
    * `prompt_id, prompt, chosen, rejected, split` (assign the split with
    * [[Corpus.leakageSafeSplit]] keyed on the PROMPT/its near-dup
    * cluster — a pair row must never be split-keyed on itself, or a
    * chosen/rejected twin of the same prompt could straddle train/eval).
    * Ships per-split gzip `tf.train.Example` TFRecord shards with
    * features (prompt, chosen, rejected) — the artifact a DPO trainer's
    * input pipeline consumes — plus two parquet sidecars: `_pairs` (the
    * complete pair table with ids/margins/split: the governance record)
    * and `_manifest` (per-split exact pair counts + an order-invariant
    * content checksum over prompt‖chosen‖rejected for replica
    * verification). Returns the manifest.
    *
    * Scale: the pairs frame checkpoints once and every consumer (shards,
    * sidecars, manifest) reads that materialization; shard writing is
    * the shared distributed [[graft.ingest.TfRecords.writeExamples]]
    * path (no driver funnel), the manifest is #splits rows.
    *
    * `bench`: when given, the release DECONTAMINATES by construction —
    * [[release]] runs the full ledger (incl. benchmark decon) before
    * shipping documents, and a preference release must give its prompts
    * the same guarantee or a contaminated prompt ships with both its
    * responses. Every distinct (prompt_id, prompt) runs
    * [[Dedup.decontaminate]]'s n-gram collision rule against the
    * benchmark suite (`deconN`-grams, broadcast bench — the same rule
    * the ledger applies); pairs whose PROMPT is contaminated are dropped
    * from shards, `_pairs` and the manifest alike, and the per-prompt
    * verdicts land in a `_decon` parquet sidecar (prompt_id → n_hit,
    * contaminated) — the governance record of what was withheld and why.
    * Scale: the decon input is the DISTINCT prompt table (pairs-bounded,
    * usually far smaller), one broadcast-semi-join pass.
    */
  def releasePairs(pairs: DataFrame, dir: String, shards: Int = 4,
      codec: String = "gzip",
      splitNames: Seq[String] = Seq("train", "valid", "test"),
      bench: Option[DataFrame] = None,
      benchIdCol: String = "doc_id", benchTextCol: String = "text",
      deconN: Int = 5): DataFrame = {
    require(shards >= 1 && splitNames.nonEmpty)
    val p0 = pairs.localCheckpoint(true)
    val p = bench.fold(p0) { b =>
      val verdicts = Dedup.decontaminate(
          p0.select(col("prompt_id"), col("prompt")).distinct(),
          b.select(col(benchIdCol).as("prompt_id"),
            col(benchTextCol).as("prompt")),
          "prompt_id", "prompt", n = deconN)
        .withColumnRenamed("doc", "prompt_id")
        .localCheckpoint(true)
      verdicts.write.mode("overwrite").parquet(s"$dir/_decon")
      p0.join(verdicts.filter(!col("contaminated")).select("prompt_id"),
          Seq("prompt_id"))
        .localCheckpoint(true)
    }
    // every split value must have a shard directory: a pair row whose
    // split is not in `splitNames` would appear in the manifest with no
    // shipped artifact behind it — silent manifest/shard divergence.
    val unknown = p.select("split").distinct()
      .filter(!col("split").isin(splitNames: _*))
      .collect().map(_.getString(0))
    require(unknown.isEmpty,
      s"pairs carry split value(s) ${unknown.mkString(", ")} not in " +
        s"splitNames ${splitNames.mkString(", ")} — they would ship no shards")
    p.write.mode("overwrite").parquet(s"$dir/_pairs")
    splitNames.foreach { name =>
      graft.ingest.TfRecords.writeExamples(
        p.filter(col("split") === name)
          .select(col("prompt"), col("chosen"), col("rejected")),
        s"$dir/$name", shards, codec)
    }
    val manifest = p
      .select(col("split"), PortableHash.hash52(concat_ws("\u0001",
        col("prompt"), col("chosen"), col("rejected"))).as("__h"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_pairs"), expr("bit_xor(__h)").as("content_xor"))
      .localCheckpoint(true)
    manifest.write.mode("overwrite").parquet(s"$dir/_manifest")
    manifest
  }

  /** The HUMAN-readable dataset card — the `README.md` a release ships
    * next to the parquet sidecars (the Datasheets-for-Datasets practice:
    * the audience for a data card is a person, not a query engine).
    * Renders [[Corpus.dataCard]]'s per-source table as one deterministic
    * markdown document: title, a source×gauges table sorted by source,
    * and a totals line. Returns one row — (`card_md5`, `n_chars`,
    * `markdown`) — so two replicas can verify they shipped the same card
    * by hash alone.
    *
    * Scale: the card table is source-cardinality (bounded), so the one
    * `collect_list` here aggregates a handful of pre-rendered lines —
    * the corpus itself was only ever touched by dataCard's own
    * documented shapes.
    */
  def cardMarkdown(card: DataFrame,
      title: String = "Corpus data card"): DataFrame = {
    val cols = Seq("source", "n_docs", "n_tokens", "avg_tokens",
      "n_exact_dups", "n_distinct", "p50", "p90", "p99")
    val line = concat(lit("| "),
      concat_ws(" | ", cols.map(c => col(c).cast("string")): _*), lit(" |"))
    val header =
      s"# $title\n\n" +
        "| source | docs | tokens | avg_tokens | exact_dups | distinct | p50 | p90 | p99 |\n" +
        "|---|---|---|---|---|---|---|---|---|\n"
    card.select(line.as("l"), col("source"), col("n_docs"), col("n_tokens"))
      .agg(
        transform(array_sort(collect_list(struct(col("source"), col("l")))),
          x => x("l")).as("__lines"),
        // sums coalesce to 0 on an EMPTY card: sum() over zero rows is
        // null, and "Totals: null docs" would still carry a valid md5 —
        // a replica hash-compare must not pass on a degenerate card.
        coalesce(sum("n_docs"), lit(0L)).as("__d"),
        coalesce(sum("n_tokens"), lit(0L)).as("__t"),
        count(lit(1)).as("__s"))
      .select(concat(lit(header), array_join(col("__lines"), "\n"),
        lit("\n\nTotals: "), col("__d").cast("string"), lit(" docs, "),
        col("__t").cast("string"), lit(" tokens across "),
        col("__s").cast("string"), lit(" sources.")).as("markdown"))
      .select(md5(col("markdown")).as("card_md5"),
        length(col("markdown")).cast("long").as("n_chars"), col("markdown"))
  }
}
