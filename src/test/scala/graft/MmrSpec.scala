package graft

import graft.llmops.Retrieval
import org.apache.spark.sql.functions._

/** MMR re-ranking: the diversity trade hand-checked — a redundant
  * near-duplicate of the top hit loses rank 2 to a diverse lower-scored
  * candidate; λ=1 degrades to pure relevance; k caps; missing vectors
  * are loud.
  */
class MmrSpec extends SparkTestBase {

  private def run(k: Int, lam: Int) = {
    import spark.implicits._
    // d1 and d2 identical direction (sim 1.0), d3 orthogonal
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vid", "vec")
    val cand = Seq(
      (7L, 1L, 1000000L), (7L, 2L, 999000L), (7L, 3L, 600000L))
      .toDF("qid", "doc", "rel_micro")
    Retrieval.mmrTopK(cand, vecs, "vid", "vec", k = k, lambdaBps = lam)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getAs[Long]("mmr_rank"), r.getAs[Long]("doc"))).toSeq
  }

  test("diversity beats redundancy at λ=0.7 (hand-computed trade)") {
    // pick 1: d1 (rel 1e6). step 2: d2 = 0.7·999000 − 0.3·1000000 =
    // 399300; d3 = 0.7·600000 − 0.3·0 = 420000 → the DIVERSE d3 wins
    // rank 2 although d2 outscores it on relevance; d2 takes rank 3.
    assert(run(3, 7000) === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("λ=1 is pure relevance; k caps the output") {
    assert(run(3, 10000) === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(run(2, 7000) === Seq((1L, 1L), (2L, 3L)))
    assert(run(9, 7000).map(_._2) === Seq(1L, 3L, 2L)) // k > n → all
  }

  test("score ties pick the smallest doc id") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vid", "vec")
    val cand = Seq((7L, 2L, 500000L), (7L, 1L, 500000L))
      .toDF("qid", "doc", "rel_micro")
    val out = Retrieval.mmrTopK(cand, vecs, "vid", "vec", k = 1)
      .collect().map(_.getAs[Long]("doc")).toSeq
    assert(out === Seq(1L))
  }

  test("a candidate without a vector fails loudly — on action, and " +
      "construction costs zero Spark jobs") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1.0f))).toDF("vid", "vec")
    val cand = Seq((7L, 1L, 10L), (7L, 9L, 5L)).toDF("qid", "doc", "rel_micro")
    // the refusal is woven into the data path (assert_true), so building
    // the frame is free and the guard fires when the frame is acted on
    val (out, jobs) = countJobs {
      Retrieval.mmrTopK(cand, vecs, "vid", "vec", k = 2)
    }
    assert(jobs === 0, "mmrTopK construction must trigger zero actions")
    val e = intercept[Exception] { out.collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(5).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("no vector"))
  }
}
