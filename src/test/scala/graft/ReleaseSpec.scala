package graft

import graft.llmops.{PortableHash, Release}
import org.apache.spark.sql.functions._

/** The release composer end to end on a planted corpus: directory layout,
  * every curation stage visibly firing, split disjointness/completeness,
  * and the manifest checksum RE-VERIFIED from the shipped shards (the
  * replica-verification story, actually performed).
  */
class ReleaseSpec extends SparkTestBase {

  test("release: curate -> split -> Example shards -> ledger/card/manifest, shards verify the manifest") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def text(i: Int) =
      (0 until 8).map(k => words((i * 3 + k * 7 + k * k) % words.length) + (i + k * 13))
        .mkString(" ")
    val normal = (0 until 80).map(i => (i.toLong, text(i), s"s${i % 4}"))
    val blocked = Seq((900L, text(17), "badsrc"))
    val dup = Seq((901L, text(5), "s1")) // exact twin of doc 5
    val benchText = "orange purple silver golden copper bronze iron steel nickel zinc"
    val contaminated = Seq((902L, "prefix words here " + benchText, "s2"))
    val docs = (normal ++ blocked ++ dup ++ contaminated).toDF("doc_id", "text", "source")
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val blockedSources = Seq("badsrc").toDF("src")

    val dir = java.nio.file.Files.createTempDirectory("graft_release").toString
    val manifest = Release.release(docs, "doc_id", "text", "source",
      bench, blockedSources, dir, quota = 1000, shards = 2,
      splits = Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))

    // ledger: every planted pathology fired its stage
    val ledger = spark.read.parquet(s"$dir/_ledger")
    def stageOf(id: Long) =
      ledger.filter(col("doc") === id).head().getAs[String]("stage")
    assert(stageOf(900L) === "blocked_source")
    assert(stageOf(901L) === "exact_dup")
    assert(stageOf(902L) === "contaminated")
    val keptIds = ledger.filter(col("kept")).select("doc")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds.size === 80 + 1 - 1, "one of the exact twins survives") // 5 or 901
    assert(!keptIds.contains(900L) && !keptIds.contains(902L))

    // manifest totals == kept docs, split over the three dirs
    val m = manifest.collect().map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(m.values.sum === keptIds.size.toLong)

    // read every split's shards back: gzip Example records, typed
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType), StructField("src", StringType)))
    val perSplit = m.keys.map { s =>
      val f = graft.ingest.TfRecords.readExamples(spark, s"$dir/$s", schema)
        .localCheckpoint(true)
      assert(f.where(!col("ok")).isEmpty)
      s -> f
    }.toMap
    val idsBySplit = perSplit.map { case (s, f) =>
      s -> f.select("id").collect().map(_.getLong(0)).toSet
    }
    // disjoint and complete
    assert(idsBySplit.values.map(_.size).sum === keptIds.size)
    assert(idsBySplit.values.reduce(_ ++ _) === keptIds)
    // per-split counts match the manifest
    idsBySplit.foreach { case (s, ids) => assert(ids.size.toLong === m(s), s) }

    // the replica check: the manifest's order-invariant checksum
    // recomputed from the SHIPPED shard contents must match exactly
    perSplit.foreach { case (s, f) =>
      val xor = f.select(PortableHash.hash52(
          concat(col("id").cast("string"), lit(":"), col("t"))).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      val recorded = manifest.filter(col("split") === s)
        .head().getAs[Long]("content_xor")
      assert(xor === recorded, s"checksum mismatch for split $s")
    }

    // card sidecar readable, one row per source of the released corpus
    val card = spark.read.parquet(s"$dir/_card")
    assert(card.select("source").collect().map(_.getString(0)).toSet ===
      Set("s0", "s1", "s2", "s3"))

    // attrition sidecar: the per-(source, stage) roll-up agrees with the
    // ledger row for row — every planted pathology shows up as its
    // source's stage line, doc counts sum to the corpus.
    val attr = spark.read.parquet(s"$dir/_attrition")
    def attrDocs(src: String, stage: String): Long =
      attr.filter(col("source") === src && col("stage") === stage)
        .select("n_docs").collect().map(_.getLong(0)).sum
    assert(attrDocs("badsrc", "blocked_source") === 1L)
    assert(attrDocs("s1", "exact_dup") === 1L)
    assert(attrDocs("s2", "contaminated") === 1L)
    assert(attr.agg(sum("n_docs")).head().getLong(0) === docs.count())
    assert(attr.filter(col("stage") === "kept")
      .agg(sum("n_docs")).head().getLong(0) === keptIds.size.toLong)
  }

  test("release with pre-fit gate thresholds: the drifted source runs its fitted gate, others keep") {
    import spark.implicits._
    // sA docs are 8 tokens, sB docs 20 tokens; every doc passes the
    // default scalar gate. Fitted thresholds for sB alone cap max_tokens
    // at 10 -> the whole of sB drops as quality/too_long while sA (no
    // thresholds row: per-source opt-in) is untouched.
    def t(i: Int, n: Int) = (0 until n).map(k => s"w${(i * 7 + k * 3) % 23}x$k").mkString(" ")
    val docs = ((0 until 20).map(i => (i.toLong, t(i, 8), "sA")) ++
      (100 until 120).map(i => (i.toLong, t(i, 20), "sB"))).toDF("doc_id", "text", "source")
    val bench = Seq((1L, "nothing shared here at all ok")).toDF("doc_id", "text")
    val none = Seq.empty[String].toDF("src")
    val thr = Seq(("sB", 2L, 10L, 99.0, 0.0, 1.0))
      .toDF("source", "min_tokens", "max_tokens", "max_avg_token_len",
        "min_type_token", "max_dup_gram_frac")
    val dir = java.nio.file.Files.createTempDirectory("graft_release_fit").toString
    Release.release(docs, "doc_id", "text", "source", bench, none, dir,
      quota = 1000, shards = 1, gateThresholds = Some(thr))
    val ledger = spark.read.parquet(s"$dir/_ledger")
    val byStage = ledger.groupBy("source", "stage").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byStage(("sB", "quality")) === 20L, s"fitted gate must drop sB: $byStage")
    assert(byStage(("sA", "kept")) === 20L, "unfitted source keeps (opt-in contract)")
    assert(ledger.filter(col("source") === "sB")
      .select("quality_reason").collect().forall(_.getString(0) === "too_long"))
    // the attrition sidecar reports the drop where governance looks for it
    val attr = spark.read.parquet(s"$dir/_attrition")
    assert(attr.filter(col("source") === "sB" && col("stage") === "quality")
      .head().getAs[Long]("n_docs") === 20L)
  }

  test("classifier-gated release: spam the rule cascade misses is caught, _classifier sidecar records it") {
    import graft.llmops.Classify
    import spark.implicits._
    // Shared-pool vocabulary (i + k² mod 23 — neighboring docs overlap
    // ~3 of 8 tokens, far under the near-dup threshold) so the learned
    // weights GENERALIZE to held-out docs; spam docs append a doubled
    // marker tail that sails through every rule gate (14 tokens, TTR
    // 0.79, dup-gram frac ~0.57 < 0.75) — exactly the doc class only a
    // learned filter catches.
    val pool = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
      "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi")
    def base(i: Int) = (0 until 8).map(k => pool((i + k * k) % 23)).mkString(" ")
    val spamTail = " casino jackpot spin casino jackpot spin"
    val good = (0 until 20).map(i => (i.toLong, base(i), s"s${i % 2}"))
    val spam = (100 until 106).map(i => (i.toLong, base(i % 23) + spamTail, s"s${i % 2}"))
    val docs = (good ++ spam).toDF("doc_id", "text", "source")
    // labels: half of each class (the slice an expensive labeler covered)
    val labeled = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), when(col("doc_id") < 100, 1L).otherwise(-1L).as("label"))
    val w = Classify.trainPerceptron(
      Classify.hashedFeatures(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dim = 256),
      labeled, "doc_id", rounds = 3, averaged = true)

    val bench = Seq((1L, "nothing shared here at all ok")).toDF("doc_id", "text")
    val none = Seq.empty[String].toDF("src")
    val dir = java.nio.file.Files.createTempDirectory("graft_release_clf").toString
    val manifest = Release.release(docs, "doc_id", "text", "source", bench,
      none, dir, quota = 1000, shards = 1,
      classifier = Some(w), classifierDim = 256)

    // the rule cascade keeps everything — spam passes every gate
    val ledger = spark.read.parquet(s"$dir/_ledger")
    assert(ledger.filter(col("kept")).count() === 26L,
      "every doc must survive the rule cascade for the test to bite")
    // the classifier sidecar scores ALL rule survivors; every spam doc
    // (trained AND held-out) rejects, every good doc keeps
    val clf = spark.read.parquet(s"$dir/_classifier")
    assert(clf.count() === 26L)
    val preds = clf.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (100L until 106L).foreach(i => assert(preds(i) === -1L, s"spam $i must reject"))
    (0L until 20L).foreach(i => assert(preds(i) === 1L, s"good $i must keep"))
    // shipped release = rule survivors minus classifier rejects
    val m = manifest.collect().map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(m.values.sum === 20L)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType), StructField("src", StringType)))
    val shipped = m.keys.toSeq.flatMap { s =>
      graft.ingest.TfRecords.readExamples(spark, s"$dir/$s", schema)
        .select("id").collect().map(_.getLong(0))
    }.toSet
    assert(shipped === (0L until 20L).toSet, "no spam doc ships")
  }

  test("preference-pair release: DPO pairs ship as TFRecord with _pairs sidecar, manifest re-verified from shards") {
    import graft.llmops.Corpus
    import spark.implicits._
    // 4 scored responses per prompt → best-vs-worst pairs; prompt-keyed
    // split so both members of every pair co-locate by construction.
    val resp = (0 until 40).map { i =>
      val p = i / 4
      (p.toLong, s"prompt $p asks about topic ${p * 7}", i.toLong,
        s"response $i says unique things ${i * 3} and ${i * 5}", (i % 4) * 10L)
    }.toDF("prompt_id", "prompt", "resp_id", "resp", "score")
    val pairs = Corpus.preferencePairs(resp, "prompt_id", "prompt",
      "resp_id", "resp", "score", minMargin = 5.0, maxPairsPerPrompt = 2)
    val withSplit = Corpus.leakageSafeSplit(pairs, "prompt_id",
      Seq.empty[(Long, Long)].toDF("v", "cluster"),
      Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
    val dir = java.nio.file.Files.createTempDirectory("graft_release_pairs").toString
    val manifest = Release.releasePairs(withSplit, dir, shards = 1)

    // sidecar carries the full pair table
    val sidecar = spark.read.parquet(s"$dir/_pairs")
    assert(sidecar.count() === pairs.count())
    assert(sidecar.columns.contains("split") && sidecar.columns.contains("margin"))
    // both pairs per 4-response prompt survive (margins 30 and 10)
    assert(pairs.count() === 20L)
    // every pair of one prompt shares its split (pair-keyed split law)
    assert(sidecar.groupBy("prompt_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).isEmpty)

    // shards read back as typed Examples; manifest counts and checksum
    // re-verify from the SHIPPED bytes
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("prompt", StringType),
      StructField("chosen", StringType), StructField("rejected", StringType)))
    val m = manifest.collect().map(r =>
      r.getAs[String]("split") -> (r.getAs[Long]("n_pairs"), r.getAs[Long]("content_xor"))).toMap
    assert(m.values.map(_._1).sum === 20L)
    m.foreach { case (s, (n, xor)) =>
      val f = graft.ingest.TfRecords.readExamples(spark, s"$dir/$s", schema)
        .localCheckpoint(true)
      assert(f.where(!col("ok")).isEmpty)
      assert(f.count() === n, s"split $s count")
      val got = f.select(graft.llmops.PortableHash.hash52(concat_ws("\u0001",
          col("prompt"), col("chosen"), col("rejected"))).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      assert(got === xor, s"split $s checksum")
    }

    // a split value outside splitNames must FAIL the release — it would
    // appear in the manifest with no shipped shards behind it
    val rogue = withSplit.withColumn("split",
      when(col("prompt_id") === 0L, lit("eval")).otherwise(col("split")))
    val ex = intercept[IllegalArgumentException] {
      Release.releasePairs(rogue,
        java.nio.file.Files.createTempDirectory("pairs_rogue").toString,
        shards = 1)
    }
    assert(ex.getMessage.contains("eval"))
  }

  test("preference-pair release with bench: a planted bench-overlapping prompt does NOT ship, _decon records why") {
    import graft.llmops.Corpus
    import spark.implicits._
    val resp = (0 until 24).map { i =>
      val p = i / 4
      // prompt 2 is the PLANT: it shares a verbatim 5-gram with the
      // benchmark suite below; every other prompt is benchmark-clean
      val prompt =
        if (p == 2) "please solve the famous benchmark question about rivers"
        else s"prompt $p asks about topic ${p * 7} in its own words"
      (p.toLong, prompt, i.toLong,
        s"response $i says unique things ${i * 3} and ${i * 5}", (i % 4) * 10L)
    }.toDF("prompt_id", "prompt", "resp_id", "resp", "score")
    val pairs = Corpus.preferencePairs(resp, "prompt_id", "prompt",
      "resp_id", "resp", "score", minMargin = 5.0, maxPairsPerPrompt = 2)
    val withSplit = Corpus.leakageSafeSplit(pairs, "prompt_id",
      Seq.empty[(Long, Long)].toDF("v", "cluster"),
      Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
    val bench = Seq(
      (900L, "the famous benchmark question about rivers and their deltas"),
      (901L, "an unrelated eval item mentioning nothing shared")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_release_decon").toString
    val manifest = Release.releasePairs(withSplit, dir, shards = 1,
      bench = Some(bench))

    // prompt 2's pairs are withheld everywhere: manifest, sidecar, shards
    assert(manifest.collect().map(_.getAs[Long]("n_pairs")).sum === 10L) // 12 - 2
    val sidecar = spark.read.parquet(s"$dir/_pairs")
    assert(sidecar.filter(col("prompt_id") === 2L).isEmpty)
    assert(sidecar.count() === 10L)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("prompt", StringType),
      StructField("chosen", StringType), StructField("rejected", StringType)))
    Seq("train", "valid", "test").foreach { s =>
      val f = graft.ingest.TfRecords.readExamples(spark, s"$dir/$s", schema)
      assert(f.filter(col("prompt").contains("famous benchmark")).isEmpty,
        s"contaminated prompt shipped in $s")
    }
    // the governance sidecar names the withheld prompt and the reason
    val decon = spark.read.parquet(s"$dir/_decon")
      .collect().map(r => r.getAs[Long]("prompt_id") ->
        r.getAs[Boolean]("contaminated")).toMap
    assert(decon(2L) === true)
    assert(decon.count(_._2) === 1, "only the plant is contaminated")
    assert(decon.size === 6, "every distinct prompt has a verdict row")
  }
}
