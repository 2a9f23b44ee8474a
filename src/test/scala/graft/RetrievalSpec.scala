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

  test("searchTopK plan: query terms broadcast, top-k window partitioned by qid") {
    val queries = Seq((10L, "spark shuffle")).toDF("qid", "qtext")
    val plan = Retrieval.searchTopK(docs, "doc_id", "text",
      queries, "qid", "qtext").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query-term join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
