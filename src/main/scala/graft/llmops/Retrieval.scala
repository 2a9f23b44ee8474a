package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: posting-list inverted index + tf-scored
  * top-k retrieval — the index/lookup half of a RAG pipeline (the vector
  * half is [[Similarity]]/[[Quantize]]; [[Corpus.tokenChunks]] is the
  * chunking that usually precedes both).
  *
  * Everything is integer arithmetic over whitespace tokens (lowercased),
  * so the whole surface carries exact DuckDB oracles — scoring is raw
  * term-frequency sums, deliberately not a log-weighted BM25: the ranking
  * is deterministic, engine-portable, and still the standard conjunctive
  * candidate shape (BM25's idf/length terms are a re-rank away and change
  * nothing structural about the plan).
  */
object Retrieval {

  /** One row per (doc, term): term frequency. The shared scan both the
    * index build and retrieval start from.
    */
  def termFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // NOT spread: measured at sf0.1, the term explode feeding the
    // map-side-combined groupBy is cheaper than the repartition exchange
    // it would take to parallelize it (A/B: inverted_index 0.41 s
    // unspread vs 0.66 s spread; search_hybrid 1.77 vs 2.59).
    df.select(col(idCol).as("doc"),
        explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))

  /** Inverted index: one row per term with document frequency, corpus
    * term frequency, and the doc-ordered posting list serialized as
    * `"doc:tf,doc:tf,..."` — a flat string rather than a nested array so
    * the frame stays engine-portable (and hash-comparable) end to end.
    *
    * `maxDf` drops terms occurring in more than `maxDf` documents. Stop
    * terms are the scale hazard of an inverted index: their posting list
    * is O(corpus) — one skewed groupBy key AND a useless candidate
    * generator (a term every document matches selects nothing). Capping
    * df bounds every posting row; the dropped terms are exactly the ones
    * [[searchTopK]] would waste its probe on. Plan shape: one shuffle for
    * termFreqs, one for the per-term aggregation.
    *
    * The postings string sorts by the struct (doc, tf) — numeric doc
    * order, not lexicographic. The transform lambda runs interpreted but
    * only on post-aggregation arrays already bounded by `maxDf`.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long = Long.MaxValue): DataFrame =
    indexFromPostings(termFreqs(df, idCol, textCol), maxDf)

  /** The per-term aggregation stage of [[invertedIndex]], over an
    * already-built (term, doc, tf) posting frame — shared with the
    * streamed index, whose postings accumulate in a table
    * ([[graft.streaming.EventStream.indexStream]]).
    */
  def indexFromPostings(postings: DataFrame,
      maxDf: Long = Long.MaxValue): DataFrame =
    postings
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        concat_ws(",", transform(
          sort_array(collect_list(struct(col("doc"), col("tf")))),
          e => concat(e("doc").cast("string"), lit(":"), e("tf").cast("string"))))
          .as("postings"))
      .filter(col("df") <= maxDf)

  /** Top-k keyword retrieval: score(q, d) = Σ over q's distinct terms of
    * tf(term, d), keep docs matching at least `minMatch` distinct query
    * terms, rank per query by (score DESC, doc ASC) — fully deterministic.
    *
    * Scale: the query set is the small side by definition — its distinct
    * (qid, term) table broadcasts, so candidate generation is one
    * broadcast-join pass over the term-frequency table (the inverted
    * probe: only docs sharing a term with the query are ever touched) and
    * the per-query top-k is a window PARTITIONED by qid. The corpus never
    * shuffles except the termFreqs groupBy; add a df cap upstream (filter
    * against [[invertedIndex]] terms) if stop-term queries are possible.
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 5, minMatch: Int = 1, maxDf: Long = Long.MaxValue): DataFrame =
    searchPostings(termFreqs(docs, idCol, textCol),
      queries, qidCol, qtextCol, k, minMatch, maxDf)

  /** [[searchTopK]]'s probe/score/rank stages over an already-built
    * (term, doc, tf) posting frame — a materialized index table serves
    * queries without re-tokenizing the corpus.
    *
    * `maxDf` (default: off) is the stop-term guard for the probe: a query
    * containing "the" would otherwise drag that term's O(corpus) posting
    * rows through the join and the per-(qid, doc) aggregation for zero
    * selectivity. With a cap, QUERY terms whose document frequency
    * exceeds `maxDf` are dropped BEFORE the probe — the anti-join runs on
    * the broadcast-sized query-term table against the per-term df summary,
    * so the stop term's posting rows never enter the candidate join at
    * all. Scoring then sums only the surviving terms (the same semantics
    * change [[invertedIndex]]'s cap makes, documented there). The summary
    * here is one aggregation pass over the postings; a serving deployment
    * maintains it as its own table (one row per term) and passes the cap
    * against that instead of recomputing — the aggregation is the only
    * O(postings) step, and it is exactly the frame
    * [[indexFromPostings]] already materializes.
    */
  def searchPostings(postings: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 5, minMatch: Int = 1, maxDf: Long = Long.MaxValue): DataFrame = {
    require(k >= 1 && minMatch >= 1)
    val qtermsAll = queries.select(col(qidCol).as("qid"),
        explode(TextAnalysis.wsTokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    val qterms =
      if (maxDf == Long.MaxValue) qtermsAll
      else {
        val hot = postings.groupBy("term").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("term")
        qtermsAll.join(hot, Seq("term"), "left_anti")
      }
    searchTerms(postings, qterms, k, minMatch)
  }

  /** The probe/score/rank core over an explicit (qid, term) table — the
    * composition point [[expandedSearch]] feeds augmented term sets
    * through; [[searchPostings]] delegates here after tokenizing and
    * stop-term-capping.
    */
  def searchTerms(postings: DataFrame, qterms: DataFrame,
      k: Int = 5, minMatch: Int = 1): DataFrame = {
    require(k >= 1 && minMatch >= 1)
    val scored = postings.join(broadcast(qterms), Seq("term"))
      .groupBy("qid", "doc")
      .agg(sum("tf").as("score"), count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc"), col("score"), col("n_matched"))
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 shape in exact
    * integer arithmetic): run the initial keyword search, assume its top
    * `fbDocs` results are relevant, harvest the `fbTerms` most frequent
    * terms across them (summed tf, ties → term ASC, the original query's
    * terms excluded from the harvest), ADD those terms to the query, and
    * rescore — the classic vocabulary-mismatch fix ("car" retrieves
    * documents that only ever say "automobile" because the feedback docs
    * say both). Two search passes, both the broadcast-probe shape; the
    * harvest is one aggregation over fbDocs×terms rows (top-k-bounded).
    * Fully deterministic — tf-weighted with integer ties, no smoothing
    * floats — so the whole two-stage run is SQL-replayable. Emits the
    * final ranking (same schema as [[searchTopK]]; `n_matched` counts
    * ORIGINAL + expansion terms).
    *
    * DEFAULTS ARE EVIDENCE (tools/SearchBench, BASELINE.md r8 table —
    * planted graded relevance with an expansion-only grade, stop-heavy
    * queries, tf-spam distractors, 1× and 10×): without the df cap,
    * recall@10 is 0.000 at both scales (the first pass ranks by stop
    * terms, the harvest amplifies them); capped, fbDocs=5/fbTerms=3
    * reaches recall 1.000 / MRR 1.000 — the only system in the sweep to
    * retrieve the expansion-only grade — while fbDocs=3 drops MRR to
    * 0.25 because the tf-scored FIRST pass lets tf-spam into a 3-doc
    * feedback set (size fbDocs past the spam depth you expect). Hence
    * fbDocs = 5, fbTerms = 3 as defaults, and USE the cap in production.
    */
  def expandedSearch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 5, minMatch: Int = 1,
      fbDocs: Int = 5, fbTerms: Int = 3,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 0)
    val postings = termFreqs(docs, idCol, textCol).localCheckpoint(true)
    val qtermsAll = queries.select(col(qidCol).as("qid"),
        explode(TextAnalysis.wsTokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    // the searchPostings stop-term guard, and here it is LOAD-BEARING for
    // quality, not just cost: feedback docs are the top-fbDocs of the
    // FIRST pass, so a stop-heavy query without the cap harvests its
    // expansion terms from stop-word-ranked noise and the second pass
    // amplifies the noise (SearchBench measures exactly this collapse —
    // recall 0.0 uncapped vs the capped path reaching the
    // expansion-only grade).
    val qterms =
      if (maxDf == Long.MaxValue) qtermsAll
      else {
        val hot = postings.groupBy("term").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("term")
        qtermsAll.join(hot, Seq("term"), "left_anti")
      }
    val fb = searchTerms(postings, qterms, k = fbDocs, minMatch = minMatch)
      .select("qid", "doc")
    // harvest: per query, the fbTerms highest summed-tf terms across the
    // feedback docs, original terms excluded — and the df cap applies to
    // the HARVEST too: feedback docs contain ordinary prose around their
    // topical terms, so without the cap the highest-tf harvested terms
    // are corpus-ubiquitous words that re-pollute the second pass with
    // exactly the noise the first-pass cap removed (RM3 implementations
    // weight the feedback model by idf for the same reason; the cap is
    // the integer-exact form of that floor).
    val origTerms = qterms.select(col("qid").as("__oqid"), col("term").as("__orig"))
    val fromFb = fb.join(postings, Seq("doc"))
      .join(origTerms,
        col("qid") === col("__oqid") && col("term") === col("__orig"), "left_anti")
    val fbCapped =
      if (maxDf == Long.MaxValue) fromFb
      else {
        val hot = postings.groupBy("term").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("term")
        fromFb.join(hot, Seq("term"), "left_anti")
      }
    val harvested = fbCapped.groupBy("qid", "term").agg(sum("tf").as("__tf"))
    val wH = Window.partitionBy("qid").orderBy(col("__tf").desc, col("term"))
    val expansion = harvested.withColumn("__hr", row_number().over(wH))
      .filter(col("__hr") <= fbTerms)
      .select("qid", "term")
    searchTerms(postings, qterms.unionByName(expansion).distinct(), k, minMatch)
  }

  /** Exact phrase search: a document matches where ALL the phrase's
    * tokens occur at CONSECUTIVE positions. One join does every phrase
    * at once: query tokens explode with their in-phrase offset `i`,
    * document tokens with their position, and the equi-join on the term
    * emits (qid, doc, start = pos − i) — a full phrase occurrence is
    * exactly a start where the match count equals the phrase length
    * (document positions are unique, so no double-counting). Returns one
    * row per (qid, doc) with the occurrence count and first position.
    *
    * Scale: the query side broadcasts; the document side is the same
    * positional token stream the winnowing/substring operators scan —
    * one narrow pass, one aggregation keyed by (qid, doc, start).
    * Single-token phrases degrade to a plain term lookup.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String): DataFrame = {
    val dt = Corpus.spreadScan(docs).select(col(idCol).as("doc"),
      posexplode(TextAnalysis.wsTokens(lower(col(textCol)))).as(Seq("pos", "term")))
    val qt = queries.select(col(qidCol).as("qid"),
        posexplode(TextAnalysis.wsTokens(lower(col(qtextCol)))).as(Seq("i", "term")))
    val qlen = qt.groupBy("qid").agg(count(lit(1)).as("__m"))
    val starts = dt.join(broadcast(qt), Seq("term"))
      .select(col("qid"), col("doc"), (col("pos") - col("i")).as("start"))
      .groupBy("qid", "doc", "start").agg(count(lit(1)).as("__hit"))
    starts.join(broadcast(qlen), Seq("qid"))
      .filter(col("__hit") === col("__m") && col("start") >= 0)
      .groupBy("qid", "doc")
      .agg(count(lit(1)).as("n_occurrences"),
        min("start").cast("long").as("first_pos"))
  }

  /** BM25 top-k — the standard probabilistic re-rank over the same
    * candidate set as [[searchTopK]] (k1 = 1.2, b = 0.75 — measured on
    * the robust plateau by tools/SearchBench, BASELINE.md r8: every grid
    * point from (0.9, 0.4) to (2.0, 0.75) to the b extremes scores
    * recall@10 0.800 / MRR 1.000 on the planted benchmark at 1× and 10×
    * while raw tf drops to MRR 0.25 under tf-spam — saturation is what
    * earns BM25 its keep; the literature defaults sit mid-plateau and
    * stay):
    * `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`,
    * `w(t, d) = idf · tf·(k1+1)/(tf + k1·(1 − b + b·len/avglen))`.
    *
    * Float discipline (what makes this oracle-checkable): every input to
    * the formula is an exact integer (tf, df, N, doc/corpus token
    * counts), so both engines feed `ln` identical arguments; the
    * per-(query, doc) sum spans at most |query| terms, so any
    * partial-aggregation order difference is bounded by a few ulps —
    * absorbed by the 6 dp rounding, the same argument the tfidf oracle
    * has relied on since r3. Ranking ties break on doc id.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1)
    val tf = termFreqs(docs, idCol, textCol)
    val lens = docs.select(col(idCol).as("doc"),
      size(TextAnalysis.wsTokens(lower(col(textCol)))).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries.select(col(qidCol).as("qid"),
        explode(TextAnalysis.wsTokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    val weighted = tf.join(broadcast(qterms), Seq("term"))
      .join(dfc, Seq("term"))
      .join(lens, Seq("doc"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("__tfn",
        col("tf") * lit(k1 + 1) / (col("tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl") * col("n_docs") / col("total_dl"))))
      .withColumn("__w", col("__idf") * col("__tfn"))
    val scored = weighted.groupBy("qid", "doc")
      .agg(sum("__w").as("__score"), count(lit(1)).as("n_matched"))
    val w = Window.partitionBy("qid").orderBy(col("__score").desc, col("doc").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc"),
        round(col("__score"), 6).as("score"), col("n_matched"))
  }

  /** Reciprocal-rank fusion of two ranked candidate lists — the hybrid
    * retrieval join (lexical BM25 + vector ANN is the production pair):
    * RRF(d) = Σ over lists containing d of 1/(c + rank_list(d)), the
    * standard rank-only fusion (Cormack et al., SIGIR 2009) that needs no
    * score calibration between heterogeneous rankers.
    *
    * Integer-exact form (the engine's oracle discipline): instead of the
    * float sum, score = Σ `L DIV (c + rank)` where
    * `L = Π_{r=1..maxRank}(c + r)` — L is divisible by every admissible
    * denominator, so each contribution is an exact integer and the
    * ranking is IDENTICAL to float RRF restricted to ranks ≤ `maxRank`
    * (positive scaling preserves order; no rounding anywhere). `maxRank`
    * stays small so L fits a long (`require`d); rank ties break on doc
    * ASC.
    *
    * Inputs are (qid, doc, rank) frames — rename upstream columns to
    * match (e.g. ANN's `cid`/`rn`). Rows ranked beyond `maxRank` are
    * ignored. `c = 60` is Cormack et al.'s constant, and SearchBench
    * (BASELINE.md r8) measures the fusion flat across c ∈ {10, 30, 60}
    * on the planted benchmark (recall 0.800 / MRR 1.000 everywhere) —
    * the choice is not load-bearing; c = 100 at maxRank = 10 would
    * overflow the integer-exact scale (the `require` above). Scale: both inputs are top-k lists — |queries|·k rows —
    * so the fusion is a full-outer equi-join plus one per-qid window
    * over already-tiny frames; the heavy lifting happened in the
    * upstream retrievers.
    */
  def fuseTopK(a: DataFrame, b: DataFrame, k: Int, c: Int = 60,
      maxRank: Int = 10): DataFrame = {
    require(k >= 1 && c >= 0 && maxRank >= 1)
    val lBig = (1 to maxRank).map(r => BigInt(c + r)).product
    require(lBig.isValidLong,
      s"Π(c+r) for r=1..$maxRank overflows long — lower maxRank or c")
    val l = lBig.toLong
    def side(df: DataFrame, rankName: String): DataFrame =
      df.select(col("qid"), col("doc"), col("rank").cast("long").as(rankName))
        .filter(col(rankName) <= maxRank)
    val joined = side(a, "rank_a").join(side(b, "rank_b"),
      Seq("qid", "doc"), "full_outer")
    // DIV is Catalyst's IntegralDivide — exact on longs; a side that did
    // not rank the doc contributes 0 through the coalesce.
    val withScore = joined
      .withColumn("score",
        coalesce(expr(s"$l DIV (${c.toLong} + rank_a)"), lit(0L)) +
          coalesce(expr(s"$l DIV (${c.toLong} + rank_b)"), lit(0L)))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc").asc)
    withScore.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc"), col("score"),
        col("rank_a"), col("rank_b"))
  }

  /** Best-window snippet extraction — the last stage of the retrieval
    * stack (index → search → rank → SHOW the user why this document
    * matched): for each (qid, doc) candidate pair, find the `window`-token
    * span holding the MOST query-term occurrences (match lowercased, the
    * search-side tokenization; snippet text keeps the original casing)
    * and emit (qid, doc, start_tok 1-based, n_hits, snippet). Ties break
    * to the EARLIEST window; pairs whose document contains no query term
    * emit nothing (can't happen for [[searchTopK]] output — minMatch ≥ 1).
    *
    * The optimal window can always be anchored AT a hit (sliding right
    * until its first hit reaches the start never lowers the count), so
    * candidates are hit positions only: per pair, hits self-join within
    * [p, p+window) and argmax — work is Σ hits², with hits bounded by
    * per-doc query-term occurrences, not document length. Scale: the
    * pair and query tables are top-k-sized; only the position explode
    * touches the candidate documents (never the whole corpus — the
    * pairs semi-join prunes the scan).
    */
  def snippets(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, queries: DataFrame, qidCol: String, qtextCol: String,
      window: Int = 8): DataFrame = {
    require(window >= 1)
    val cand = pairs.select(col("qid"), col("doc"))
    val candDocs = docs
      .select(col(idCol).as("doc"), col(textCol).as("__text"))
      .join(cand.select("doc").distinct(), Seq("doc"), "left_semi")
    val toks = candDocs.select(col("doc"),
      posexplode(TextAnalysis.wsTokens(lower(col("__text")))).as(Seq("pos", "tok")))
    val qterms = queries.select(col(qidCol).as("qid"),
        explode(TextAnalysis.wsTokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    val hits = cand.join(qterms, Seq("qid"))
      .join(toks, col("term") === col("tok") && cand("doc") === toks("doc"))
      .select(col("qid"), cand("doc").as("doc"), col("pos"))
    val counts = hits.alias("a").join(hits.alias("b"),
        col("a.qid") === col("b.qid") && col("a.doc") === col("b.doc") &&
          col("b.pos") >= col("a.pos") && col("b.pos") < col("a.pos") + window)
      .groupBy(col("a.qid").as("qid"), col("a.doc").as("doc"), col("a.pos").as("pos"))
      .agg(count(lit(1)).as("n_hits"))
    val w = Window.partitionBy("qid", "doc").orderBy(col("n_hits").desc, col("pos"))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(candDocs.select(col("doc"),
        split(trim(col("__text")), "\\s+").as("__ot")), Seq("doc"))
      .select(col("qid"), col("doc"), (col("pos") + 1).cast("long").as("start_tok"),
        col("n_hits"),
        concat_ws(" ", slice(col("__ot"), (col("pos") + 1).cast("int"),
          lit(window))).as("snippet"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversification step between a top-N candidate stage
    * ([[bm25TopK]] / [[Similarity.bruteForceTopK]] / ANN) and what a RAG
    * context window actually receives: greedily pick the candidate
    * maximizing `λ·rel − (1−λ)·max_{s∈selected} sim(cand, s)`, so the
    * 2nd..k-th picks trade relevance against redundancy with what is
    * already chosen (k near-identical top hits waste the window — the
    * dedup argument applied to retrieval).
    *
    * `candidates` is (qid, doc, rel_micro) — the caller's top-N with an
    * INTEGER relevance on a scale comparable to cosine-micro (cosine
    * candidates are naturally aligned; normalize other scores to ~1e6).
    * `vectors` supplies each candidate's embedding; a candidate with no
    * vector fails LOUDLY (silently dropping a relevant hit would change
    * rankings invisibly). Pairwise similarity is cosine on the 1e-6
    * grid, computed in double with one fixed fold order — value-exact
    * across engines; zero-norm vectors read sim 0.
    *
    * Implementation is one codegen'd per-QUERY fold (the [[graft.llmops
    * .Unigram]] DP discipline — no driver loop, no window): candidates
    * collect to a doc-sorted array (bounded by the caller's top-N, the
    * contract that makes per-query state safe), then k greedy steps each
    * argmax over the un-selected entries, ties to the smallest doc (the
    * ascending scan with strict `>` makes that free). First pick has an
    * empty selected set — max-sim term 0 — so it is pure relevance, the
    * classic MMR boundary case. Returns (qid, mmr_rank, doc, rel_micro).
    */
  /** Fold sentinel: any real MMR score beats it, and the same literal
    * appears in the DuckDB replay — one constant, never two "minimums".
    */
  private val NegInf = -1000000000000000000L

  def mmrTopK(candidates: DataFrame, vectors: DataFrame,
      vidCol: String, vecCol: String, k: Int,
      lambdaBps: Int = 7000): DataFrame = {
    require(k >= 1 && lambdaBps >= 0 && lambdaBps <= 10000)
    val vecs = vectors.select(col(vidCol).cast("long").as("doc"),
      col(vecCol).cast("array<float>").as("vec"))
    val cand = candidates.select(col("qid"),
      col("doc").cast("long").as("doc"), col("rel_micro").cast("long").as("rel"))
    // the missing-vector refusal rides the data path (the arpaTable
    // assert_true weave): a left join + an assertion folded into the
    // kept doc id, so CONSTRUCTING this frame costs zero Spark jobs and
    // the check can't be pruned — it fires on first action instead.
    val joined = cand.join(vecs, Seq("doc"), "left")
      .select(col("qid"), coalesce(
          assert_true(col("vec").isNotNull, concat(
            lit("mmrTopK: candidate doc "), col("doc"),
            lit(" has no vector — every candidate needs an embedding " +
              "for the diversity term"))).cast("long"),
          col("doc")).as("doc"),
        col("rel"), col("vec"))
    val grouped = joined
      .groupBy("qid")
      .agg(array_sort(collect_list(struct(col("doc"), col("rel"), col("vec"))))
        .as("cs"))
    // The greedy walk itself runs as ONE compiled per-group kernel. The
    // previous shape unrolled it as nested higher-order-function
    // expressions (aggregate/transform/zip_with) — those are
    // CodegenFallback, so every one of the O(k·n²·d) inner node visits
    // paid interpreted-expression dispatch, and a 40-query group batch
    // took seconds of single-task CPU (guide §1.2 "per-task work",
    // measured: the one stage evaluating it was 6.0 s wall = 6.0 s cpu
    // at sf0.1). The kernel reproduces the expression semantics bit for
    // bit: same candidate order (cs is doc-sorted), same fold order for
    // norms and dots (sequential left fold in double), the same
    // round-HALF_UP-to-micro grid (java.math.BigDecimal, which is what
    // Spark's Round does for doubles), Long-only score arithmetic, ties
    // to the lowest index via strict `>`, and the same NegInf sentinel.
    val sel = udf((rels: Seq[Long], vecs: Seq[Seq[Float]], lam: Long, kk: Int) => {
      val n = rels.length
      val nrm = Array.tabulate(n) { i =>
        val v = vecs(i); var a = 0.0; var p = 0
        while (p < v.length) { val x = v(p).toDouble; a += x * x; p += 1 }
        math.sqrt(a)
      }
      def sim(i: Int, j: Int): Long = {
        val den = nrm(i) * nrm(j)
        if (den == 0.0) 0L
        else {
          val vi = vecs(i); val vj = vecs(j); var a = 0.0; var p = 0
          while (p < vi.length) { a += vi(p).toDouble * vj(p).toDouble; p += 1 }
          java.math.BigDecimal.valueOf(a / den * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        }
      }
      val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
      val steps = math.min(kk.toLong, n.toLong)
      var step = 0L
      var stopped = false
      while (step < steps && !stopped) {
        var bi = -1; var bs = NegInf
        var i = 0
        while (i < n) {
          if (!acc.contains(i.toLong)) {
            var ms = 0L
            if (acc.nonEmpty) {
              ms = NegInf
              acc.foreach { j => val s = sim(i, j.toInt); if (s > ms) ms = s }
            }
            val s = lam * rels(i) - (10000L - lam) * ms
            if (s > bs) { bi = i; bs = s }
          }
          i += 1
        }
        if (bi < 0) stopped = true else acc += bi.toLong
        step += 1L
      }
      acc.toSeq
    })
    grouped.withColumn("sel",
      sel(transform(col("cs"), c => c.getField("rel")),
        transform(col("cs"), c => c.getField("vec")),
        lit(lambdaBps.toLong), lit(k)))
      .select(col("qid"), col("cs"), posexplode(col("sel")).as(Seq("r0", "i")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("mmr_rank"),
        element_at(col("cs"), (col("i") + 1L).cast("int")).getField("doc").as("doc"),
        element_at(col("cs"), (col("i") + 1L).cast("int")).getField("rel").as("rel_micro"))
  }
}
