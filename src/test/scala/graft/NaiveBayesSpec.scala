package graft

import graft.llmops.Classify
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes: exact micro-log model values, multiclass
  * argmax with smallest-label ties, unseen-feature and prior-only
  * scoring paths.
  */
class NaiveBayesSpec extends SparkTestBase {

  private val Dim = 1024

  private def fit(train: Seq[(Long, String, String)]) = {
    import spark.implicits._
    val docs = train.map(t => (t._1, t._2)).toDF("doc_id", "text")
    val labels = train.map(t => (t._1, t._3)).toDF("doc_id", "lang")
    val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = Dim)
    (feats, Classify.trainNaiveBayes(feats, labels, "doc_id", "lang", dim = Dim))
  }

  test("model values sit exactly on the micro-log grid (hand-recomputed)") {
    val (_, model) = fit(Seq((1L, "x x y", "A"), (2L, "z z", "B")))
    val cls = model.classes.orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    def micro(x: Double): Long = math.round(math.log(x) * 1e6)
    assert(cls.toSeq === Seq(
      ("A", 1L, 3L, micro(1.0 / 2), micro(1.0 / (3 + Dim))),
      ("B", 1L, 2L, micro(1.0 / 2), micro(1.0 / (2 + Dim)))))
    // feature x (cnt 2 in A): logp = ln(3/(3+dim))
    val fx = model.features.filter(col("label") === "A" && col("cnt") === 2L)
      .collect()
    assert(fx.length === 1 && fx.head.getAs[Long]("logp_micro") ===
      micro(3.0 / (3 + Dim)))
  }

  test("scoring: trained vocabulary classifies, unseen words fall to the smaller class, empty docs to the prior") {
    import spark.implicits._
    // A sees x,y; B sees z; B has more tokens but equal doc priors
    val (_, model) = fit(Seq((1L, "x x y", "A"), (2L, "z z z z", "B")))
    val held = Seq((10L, "x x"), (11L, "z"), (12L, "q"), (13L, ""))
      .toDF("doc_id", "text")
    val hFeats = Classify.hashedFeatures(held, "doc_id", "text", dim = Dim)
    val out = Classify.scoreNaiveBayes(held, hFeats, model, "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // q is unseen by BOTH: unseen_A = ln(1/(3+dim)) > unseen_B =
    // ln(1/(4+dim)) — the class with FEWER training tokens wins; the
    // empty doc scores priors only (equal) and ties to the smallest label
    assert(out.toSeq === Seq((10L, "A"), (11L, "B"), (12L, "A"), (13L, "A")))
  }

  test("three classes: argmax is per-doc deterministic and multiclass") {
    import spark.implicits._
    val (_, model) = fit(Seq(
      (1L, "aa aa", "A"), (2L, "bb bb", "B"), (3L, "cc cc", "C")))
    val held = Seq((20L, "bb"), (21L, "cc cc aa")).toDF("doc_id", "text")
    val hFeats = Classify.hashedFeatures(held, "doc_id", "text", dim = Dim)
    val out = Classify.scoreNaiveBayes(held, hFeats, model, "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((20L, "B"), (21L, "C")))
  }
}
