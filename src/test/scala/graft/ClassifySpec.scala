package graft

import graft.llmops.Classify
import org.apache.spark.sql.functions._

/** Batch-perceptron quality classifier: hand-checkable learning on a
  * planted separable corpus, the round-1 class-difference identity,
  * update determinism under repartitioning, and the unknown-vocabulary /
  * empty-doc scoring contract.
  */
class ClassifySpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // 8 labeled docs, cleanly separable vocabulary: "clean prose" vs
    // "spam casino". Shared filler word "the" appears on both sides.
    Seq(
      (0L, "clean prose the clean", 1L),
      (1L, "clean prose prose", 1L),
      (2L, "the clean clean prose", 1L),
      (3L, "prose clean", 1L),
      (4L, "spam casino the spam", -1L),
      (5L, "spam casino casino", -1L),
      (6L, "the spam spam casino", -1L),
      (7L, "casino spam", -1L)
    ).toDF("doc_id", "text", "label")
  }

  test("learns a separating margin on planted vocabulary and generalizes to held-out docs") {
    import spark.implicits._
    val docs = fixture
    val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = 256)
    val w = Classify.trainPerceptron(feats, docs.select("doc_id", "label"), "doc_id", rounds = 3)
    assert(w.count() <= 256)
    val scored = Classify.scorePerceptron(docs, feats, w, "doc_id")
      .join(docs.select("doc_id", "label"), "doc_id")
    // every training doc on the right side of the hyperplane
    assert(scored.filter(col("pred") =!= col("label")).count() === 0)
    // held-out docs: good vocabulary → +1, bad → −1, and the shared
    // filler word alone carries no net signal (symmetric counts)
    val held = Seq((100L, "clean prose forever"), (101L, "casino spam casino"))
      .toDF("doc_id", "text")
    val hf = Classify.hashedFeatures(held, "doc_id", "text", dim = 256)
    val hs = Classify.scorePerceptron(held, hf, w, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hs(100L) === 1L && hs(101L) === -1L)
  }

  test("round 1 from w=0 is the exact class-difference vector") {
    import spark.implicits._
    val docs = fixture
    val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = 256)
    val w1 = Classify.trainPerceptron(feats, docs.select("doc_id", "label"), "doc_id", rounds = 1)
    val expected = feats.join(docs.select("doc_id", "label"), "doc_id")
      .groupBy("feat").agg(sum(col("label") * col("cnt")).as("w"))
    assert(w1.join(expected.withColumnRenamed("w", "e"), "feat")
      .filter(col("w") =!= col("e")).count() === 0)
    assert(w1.count() === expected.count())
  }

  test("weights are partition-order independent (order-free integer updates)") {
    import spark.implicits._
    val docs = fixture
    val labels = docs.select("doc_id", "label")
    def weights(f: org.apache.spark.sql.DataFrame) =
      Classify.trainPerceptron(f, labels, "doc_id", rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = 256)
    val a = weights(feats)
    val b = weights(feats.repartition(7))
    val c = weights(feats.repartition(1).sort(desc("feat")))
    assert(a == b && a == c)
  }

  test("averaged weights are exactly the sum of the per-round finals") {
    import spark.implicits._
    // a NON-separable fixture (conflicting labels on overlapping text)
    // keeps every round's update non-empty, so the rounds genuinely
    // differ and the sum identity is not vacuous.
    val docs = Seq(
      (0L, "a b", 1L), (1L, "a a b", -1L),
      (2L, "b c", 1L), (3L, "c a", -1L)).toDF("doc_id", "text", "label")
    val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = 64)
    val labels = docs.select("doc_id", "label")
    def wmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val finals = (1 to 3).map(r =>
      wmap(Classify.trainPerceptron(feats, labels, "doc_id", rounds = r)))
    assert(finals.toSet.size == 3, "rounds must differ for the test to bite")
    val summed = finals.reduce((a, b) => a.map { case (k, v) => k -> (v + b(k)) })
    val avg = wmap(Classify.trainPerceptron(feats, labels, "doc_id",
      rounds = 3, averaged = true))
    assert(avg == summed)
  }

  test("scoring: unknown vocabulary carries weight 0, empty docs score 0 and reject") {
    import spark.implicits._
    val docs = fixture
    val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = 256)
    val w = Classify.trainPerceptron(feats, docs.select("doc_id", "label"), "doc_id", rounds = 2)
    val probe = Seq((200L, "zzz qqq unseen words"), (201L, "   ")).toDF("doc_id", "text")
    val pf = Classify.hashedFeatures(probe, "doc_id", "text", dim = 256)
    val out = Classify.scorePerceptron(probe, pf, w, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((200L, 0L, -1L), (201L, 0L, -1L)))
  }
}
