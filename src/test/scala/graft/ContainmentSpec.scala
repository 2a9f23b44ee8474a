package graft

import graft.llmops.Dedup
import org.apache.spark.sql.functions._

/** Containment near-dup pairs: the quote-inside-wrapper asymmetry that
  * symmetric Jaccard misses, ordered-pair semantics, the prefix filter's
  * losslessness against a brute-force check, and the hot-shingle cap's
  * documented recall boundary.
  */
class ContainmentSpec extends SparkTestBase {

  private val quote = "alpha beta gamma delta epsilon zeta"
  private val wrapper = "header menu nav " + quote +
    " footer copyright terms privacy contact about sitemap legal"

  test("a full quote scores containment 1.0 one way, low the other; Jaccard misses it") {
    import spark.implicits._
    val docs = Seq((1L, quote), (2L, wrapper)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment"))).toSeq
    // quote (4 shingles) all appear in wrapper → C(1→2) = 1.0; the
    // reverse direction is far below threshold and must NOT appear
    assert(pairs === Seq((1L, 2L, 1.0)))
    // symmetric Jaccard at the same threshold sees nothing
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8).isEmpty)
  }

  test("prefix filter is lossless: matches the brute-force containment join") {
    import spark.implicits._
    // a small mixed corpus: exact dup, partial overlap, disjoint
    val docs = Seq(
      (1L, quote), (2L, wrapper), (3L, quote),
      (4L, "alpha beta gamma nothing else here at all"),
      (5L, "totally different words in this one entirely")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all ordered pairs via distinct shingle sets
    def shingles(t: String) =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val m = Map(1L -> quote, 2L -> wrapper, 3L -> quote,
      4L -> "alpha beta gamma nothing else here at all",
      5L -> "totally different words in this one entirely")
      .map { case (k, v) => k -> shingles(v) }
    val want = (for {
      a <- m.keys; b <- m.keys if a != b
      c = m(a).intersect(m(b)).size.toDouble / m(a).size if c >= 0.5
    } yield (a, b)).toSet
    assert(got === want, s"got $got want $want")
  }

  test("hot-shingle cap: a pair whose ONLY evidence is ubiquitous shingles is the documented recall loss") {
    import spark.implicits._
    // 30 docs all share one boilerplate shingle run; docs 100/101 are a
    // real containment pair through that SAME ubiquitous text only
    val boiler = "all rights reserved worldwide"
    val docs = ((0L until 30L).map(i => (i, s"unique$i word$i more$i " + boiler)) ++
      Seq((100L, boiler), (101L, boiler + " plus extra trailing tokens here")))
      .toDF("doc_id", "text")
    def pairsWith(cap: Option[Int]) =
      Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
          threshold = 0.9, maxShingleDf = cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap 10: every one of doc 100's shingles has df 32 > 10 → no
    // candidates survive for it (the stated trade); cap off finds it
    assert(!pairsWith(Some(10)).contains((100L, 101L)))
    assert(pairsWith(None).contains((100L, 101L)))
  }
}
