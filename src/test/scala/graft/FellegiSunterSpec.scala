package graft

import graft.llmops.FuzzyMatch
import org.apache.spark.sql.functions._

/** Fellegi–Sunter linkage: hand-computed m/u weights on the micro-log
  * grid, discriminating-vs-useless field separation, the three-way
  * decision boundaries, and the loud missing-field guard.
  */
class FellegiSunterSpec extends SparkTestBase {

  private def micro(x: Double): Long = math.round(math.log(x) * 1e6)

  test("weights are the hand-computed smoothed log-likelihood ratios") {
    import spark.implicits._
    // 4 matches (field agrees 3/4), 6 non-matches (agrees 1/6)
    val labeled = (Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(5)((false, false)))
      .toDF("is_match", "ag")
    val w = FuzzyMatch.fellegiSunterWeights(labeled, "is_match", Seq("ag"))
      .collect().head
    assert(w.getAs[Long]("n_match") === 4L)
    assert(w.getAs[Long]("n_unmatch") === 6L)
    assert(w.getAs[Long]("agree_match") === 3L)
    assert(w.getAs[Long]("agree_unmatch") === 1L)
    // m = 4/6, u = 2/8 → w_agree = ln((4/6)/(2/8)), w_dis = ln((2/6)/(6/8))
    assert(w.getAs[Long]("w_agree_micro") === micro((4.0 / 6) / (2.0 / 8)))
    assert(w.getAs[Long]("w_disagree_micro") === micro((2.0 / 6) / (6.0 / 8)))
  }

  test("a useless field weighs ~0; a discriminating field dominates the score") {
    import spark.implicits._
    // good: agrees iff match; noise: agrees half the time regardless
    val labeled = Seq(
      (true, true, true), (true, true, false),
      (false, false, true), (false, false, false))
      .toDF("is_match", "good", "noise")
    val w = FuzzyMatch.fellegiSunterWeights(labeled, "is_match",
      Seq("good", "noise"))
    val byField = w.collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getLong(6))).toMap
    assert(byField("noise")._1 === 0L && byField("noise")._2 === 0L)
    assert(byField("good")._1 > 900000L)  // ln(3) ≈ 1.0986e6
    assert(byField("good")._2 < -900000L)
    // decisions: agree-on-good links, disagree non-links, and the
    // noise field alone cannot move a pair out of 'possible'
    val pairs = Seq((1L, true, true), (2L, true, false),
      (3L, false, true), (4L, false, false))
      .toDF("pid", "good", "noise")
    val out = FuzzyMatch.fellegiSunterScore(pairs, w, Seq("good", "noise"),
        upperMicro = 1000000L, lowerMicro = -1000000L)
      .orderBy("pid").collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[String]("decision"))).toSeq
    assert(out === Seq((1L, "link"), (2L, "link"),
      (3L, "nonlink"), (4L, "nonlink")))
  }

  test("threshold boundaries are inclusive; equal thresholds leave no possible band") {
    import spark.implicits._
    val labeled = Seq((true, true), (false, false), (true, true),
      (false, false)).toDF("is_match", "ag")
    val w = FuzzyMatch.fellegiSunterWeights(labeled, "is_match", Seq("ag"))
    val wa = w.collect().head.getAs[Long]("w_agree_micro")
    val pairs = Seq((1L, true), (2L, false)).toDF("pid", "ag")
    // upper exactly the agree weight → inclusive link
    val out = FuzzyMatch.fellegiSunterScore(pairs, w, Seq("ag"),
        upperMicro = wa, lowerMicro = wa)
      .orderBy("pid").collect().map(_.getAs[String]("decision")).toSeq
    assert(out === Seq("link", "nonlink"))
    val e = intercept[IllegalArgumentException] {
      FuzzyMatch.fellegiSunterScore(pairs, w, Seq("ag", "ghost"), 1L, 0L) }
    assert(e.getMessage.contains("ghost"))
  }
}
