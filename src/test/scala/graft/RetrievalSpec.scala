package graft

import graft.llmops.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join spark"),
    (2L, "spark scan filter"),
    (3L, "join shuffle shuffle"),
    (4L, "unique term here")
  ).toDF("doc_id", "text")

  test("invertedIndex: df/total_tf exact, postings doc-ordered doc:tf") {
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(idx("spark") == ((2L, 3L, "1:2,2:1")))
    assert(idx("shuffle") == ((2L, 3L, "1:1,3:2")))
    assert(idx("join") == ((2L, 2L, "1:1,3:1")))
    assert(idx("unique") == ((1L, 1L, "4:1")))
  }

  test("invertedIndex maxDf drops stop terms, keeps selective ones") {
    val terms = Retrieval.invertedIndex(docs, "doc_id", "text", maxDf = 1)
      .select("term").as[String].collect().toSet
    // df=2 terms (spark, shuffle, join) are gone; df=1 terms survive.
    assert(!terms.contains("spark") && !terms.contains("shuffle") && !terms.contains("join"))
    assert(terms.contains("unique") && terms.contains("scan"))
  }

  test("searchTopK: tf-sum scoring, minMatch filter, deterministic rank ties") {
    val queries = Seq((10L, "spark shuffle")).toDF("qid", "qtext")
    val hits = Retrieval.searchTopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, minMatch = 1)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc1: spark*2 + shuffle*1 = 3 (2 terms), doc3: shuffle*2 = 2 (1 term),
    // doc2: spark*1 = 1 (1 term). doc4 matches nothing.
    assert(hits.toSeq == Seq((1L, 1L, 3L, 2L), (2L, 3L, 2L, 1L), (3L, 2L, 1L, 1L)))
    val strict = Retrieval.searchTopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, minMatch = 2)
      .select("doc").as[Long].collect().toSeq
    assert(strict == Seq(1L)) // only doc1 matches both query terms
  }

  test("searchTopK tie-break is (score desc, doc asc) and k caps output") {
    val tied = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta")
    ).toDF("doc_id", "text")
    val queries = Seq((7L, "alpha beta")).toDF("qid", "qtext")
    val got = Retrieval.searchTopK(tied, "doc_id", "text",
        queries, "qid", "qtext", k = 2)
      .orderBy("rank").select("doc").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L)) // equal scores -> lowest ids, capped at k=2
  }

  test("phraseSearch finds consecutive-token occurrences only") {
    val pdocs = Seq(
      (1L, "the quick brown fox jumps the quick brown dog"),
      (2L, "quick the brown fox"), // all terms present, never consecutive
      (3L, "the quick brown")
    ).toDF("doc_id", "text")
    val queries = Seq((9L, "the quick brown")).toDF("qid", "qtext")
    val got = Retrieval.phraseSearch(pdocs, "doc_id", "text",
        queries, "qid", "qtext")
      .orderBy("doc")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc1 matches twice (pos 0 and 5), doc2 never, doc3 once at 0.
    assert(got == Seq((1L, 2L, 0L), (3L, 1L, 0L)))
  }

  test("bm25TopK: rarer terms dominate, scores are finite and ranked desc") {
    val queries = Seq((10L, "spark unique")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getLong(4)))
    // doc4 holds the rare term ("unique", df=1) -> outranks the df=2
    // "spark" docs despite matching one term.
    assert(got.head._1 == 4L, s"got $got")
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
    assert(got.forall(x => !x._2.isNaN && !x._2.isInfinite))
  }

  test("searchPostings maxDf: stop-term query terms are dropped before the probe") {
    // "the" is in every doc (df=4 > cap); "unique" is selective (df=1).
    val corpus = Seq(
      (1L, "the unique word"), (2L, "the other words"),
      (3L, "the more text"), (4L, "the final doc")
    ).toDF("doc_id", "text")
    val queries = Seq((10L, "the unique")).toDF("qid", "qtext")
    val capped = Retrieval.searchTopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 5, minMatch = 1, maxDf = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // only "unique" survives the cap: one hit, score 1, n_matched 1 —
    // the stop term's 4 posting rows never became candidates.
    assert(capped == Seq((1L, 1L, 1L)))
    // a query of ONLY stop terms probes nothing at all.
    val onlyStop = Retrieval.searchTopK(corpus, "doc_id", "text",
      Seq((11L, "the")).toDF("qid", "qtext"), "qid", "qtext",
      k = 5, minMatch = 1, maxDf = 2)
    assert(onlyStop.count() == 0L)
    // cap off: identical to the historical semantics (all terms score).
    val uncapped = Retrieval.searchTopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 5, minMatch = 1)
      .orderBy("rank").select("doc").as[Long].collect().toSeq
    assert(uncapped == Seq(1L, 2L, 3L, 4L))
  }

  test("fuseTopK: integer RRF ranking, missing-side zero, doc-asc ties") {
    val c = 60
    val l = (1 to 10).map(r => (c + r).toLong).product
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("qid", "doc", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("qid", "doc", "rank")
    val got = Retrieval.fuseTopK(a, b, k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    // doc20 rides both lists: L/62 + L/61; doc10 = L/61 beats doc30 = L/62.
    assert(got == Seq(
      (20L, l / 62 + l / 61), (10L, l / 61), (30L, l / 62)))
    // equal scores break on doc ASC: two rank-1 singletons tie exactly.
    val ta = Seq((1L, 10L, 1L)).toDF("qid", "doc", "rank")
    val tb = Seq((1L, 5L, 1L)).toDF("qid", "doc", "rank")
    val tie = Retrieval.fuseTopK(ta, tb, k = 5)
      .orderBy("rank").select("doc").as[Long].collect().toSeq
    assert(tie == Seq(5L, 10L))
    // rows ranked beyond maxRank are ignored entirely.
    val deep = Seq((1L, 99L, 11L)).toDF("qid", "doc", "rank")
    assert(Retrieval.fuseTopK(deep, tb, k = 5)
      .select("doc").as[Long].collect().toSeq == Seq(5L))
  }

  test("snippets: densest window wins, ties earliest, original casing kept") {
    // hits at positions 0, 5, 6, 7 (0-based) for terms {red, blue}: the
    // window of 4 anchored at pos 5 holds 3 hits (best); pos 0 holds 1.
    val sd = Seq(
      (1L, "Red x y z w Blue RED blue tail tail2"),
      (2L, "nothing matches here"))
      .toDF("doc_id", "text")
    val queries = Seq((9L, "red blue")).toDF("qid", "qtext")
    val pairs = Seq((9L, 1L), (9L, 2L)).toDF("qid", "doc")
    val out = Retrieval.snippets(sd, "doc_id", "text", pairs, queries,
        "qid", "qtext", window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // doc 2 has no hits → no row; doc 1's best window starts at token 6
    // (1-based), 3 hits, snippet keeps the ORIGINAL mixed casing.
    assert(out.toSeq == Seq((9L, 1L, 6L, 3L, "Blue RED blue tail")))
    // tie-break: two equally dense windows → the earliest start wins.
    val tie = Seq((3L, "red a red b red c")).toDF("doc_id", "text")
    val tiePairs = Seq((9L, 3L)).toDF("qid", "doc")
    val tieOut = Retrieval.snippets(tie, "doc_id", "text", tiePairs, queries,
        "qid", "qtext", window = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(tieOut == Seq((1L, 2L))) // [red a red] and [red b red] tie → first
  }

  test("expandedSearch: feedback terms retrieve the vocabulary-mismatch doc") {
    // d2 never says "car" — only the expansion can surface it.
    val vocab = Seq(
      (1L, "car automobile automobile"),
      (2L, "automobile automobile automobile engine"),
      (3L, "car engine")).toDF("doc_id", "text")
    val queries = Seq((9L, "car")).toDF("qid", "qtext")
    val plain = Retrieval.searchTopK(vocab, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .select("doc").as[Long].collect().toSet
    assert(plain == Set(1L, 3L), "the un-expanded query cannot see doc 2")
    val expanded = Retrieval.expandedSearch(vocab, "doc_id", "text",
        queries, "qid", "qtext", k = 5, fbDocs = 2, fbTerms = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    // feedback docs {1, 3} donate {automobile: 2, engine: 1}; doc 2 then
    // scores 3 + 1 = 4 and ranks FIRST.
    assert(expanded.head == ((2L, 4L)), s"got $expanded")
    assert(expanded.map(_._1).toSet == Set(1L, 2L, 3L))
    // fbTerms = 0 degrades exactly to the plain search.
    val zero = Retrieval.expandedSearch(vocab, "doc_id", "text",
        queries, "qid", "qtext", k = 5, fbDocs = 2, fbTerms = 0)
      .select("doc").as[Long].collect().toSet
    assert(zero == plain)
  }

  test("expandedSearch df cap guards both the first pass and the harvest") {
    val docs = Seq(
      (1L, "the rare gem"), (2L, "the gem jewel"), (3L, "the jewel stone"),
      (4L, "the the the"), (5L, "the filler words")).toDF("doc_id", "text")
    val queries = Seq((9L, "the rare")).toDF("qid", "qtext")
    // cap 4 < df("the") = 5: the stop term leaves the query AND the
    // harvest — feedback doc 1 donates "gem" (df 2), never "the".
    val capped = Retrieval.expandedSearch(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, fbDocs = 1, fbTerms = 1, maxDf = 4)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(capped == Seq(1L, 2L), s"got $capped")
    // uncapped: the stop term rules the first pass, the all-stop doc
    // ranks first, and there is nothing useful to harvest from it — the
    // SearchBench collapse in miniature.
    val uncapped = Retrieval.expandedSearch(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, fbDocs = 1, fbTerms = 1)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(uncapped.head == 4L, s"got $uncapped")
  }

  test("charTrigramPairs: word-order tolerant; boilerplate-only overlap drops, Jaccard stays exact") {
    import graft.llmops.FuzzyMatch
    // word-order tolerance: high trigram overlap despite a large edit
    // distance; the unrelated name pairs with neither.
    val names = Seq((1L, "acme corp"), (2L, "corp acme"),
        (3L, "totally different ltd")).toDF("rid", "rname")
    val basic = FuzzyMatch.charTrigramPairs(names, "rid", "rname", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(basic == Set((1L, 2L)), s"got $basic")
    // df cap: 20 names share only their boilerplate prefix grams; with
    // the cap those pairs (whose entire overlap is boilerplate) drop,
    // while a pair ALSO sharing rare grams survives with its Jaccard
    // EXACT — hot grams counted back into the numerator.
    val herd = (0L until 20L).map(i => (i + 10L, f"xx$i%02d"))
    val special = Seq((100L, "xx55a"), (101L, "xx55b"))
    val capped = FuzzyMatch.charTrigramPairs(
        (herd ++ special).toDF("rid", "rname"), "rid", "rname",
        threshold = 0.3, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.map(t => (t._1, t._2)).toSet == Set((100L, 101L)),
      s"only the rare-gram pair may survive the cap: ${capped.toSeq}")
    // padded "__xx55a_"/"__xx55b_": 6 grams each, 4 shared (2 hot + 2
    // cool) → 4 / 8 = 0.5 exactly.
    assert(capped.head._3 == 0.5)
  }

  test("sortedNeighborhood: window pairs only, exact-once, catches block-straddlers") {
    import graft.llmops.FuzzyMatch
    // names that sort adjacently but share NO 4-char prefix block:
    // "azzz" and "baaa" — prefix blocking misses them, the window pairs
    // them with lev 4.
    val recs = Seq((1L, "azzz"), (2L, "baaa"), (3L, "bzzz"), (4L, "zzzz"))
      .toDF("rid", "rname")
    val out = FuzzyMatch.sortedNeighborhood(recs, "rid", "rname",
        identity, window = 1, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    // sort order: azzz(1) baaa(2) bzzz(3) zzzz(4); window 1 → only
    // adjacent pairs; each exactly once.
    assert(out.map(t => (t._1, t._2)).toSeq.sorted ==
      Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(out.forall(_._3 == 1L), "window 1 means rank_gap 1 everywhere")
    val prefixBlocked = FuzzyMatch.blockedLevenshtein(
        recs.select(col("rid").as("l_id"), col("rname").as("l_name")), "l_id", "l_name",
        recs.select(col("rid").as("r_id"), col("rname").as("r_name")), "r_id", "r_name",
        n => substring(n, 1, 1), maxDist = 4)
      .filter(col("l_id") < col("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!prefixBlocked.contains((1L, 2L)),
      "prefix blocking must miss the boundary pair the window catches")
  }

  test("searchTopK plan: query terms broadcast, top-k window partitioned by qid") {
    val queries = Seq((10L, "spark shuffle")).toDF("qid", "qtext")
    val plan = Retrieval.searchTopK(docs, "doc_id", "text",
      queries, "qid", "qtext").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query-term join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
