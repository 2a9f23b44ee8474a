package graft

import graft.llmops.RewardFit
import org.apache.spark.sql.functions._

/** Bradley–Terry MM fit: hand-computed micro-grid updates, the
  * never-winner zero, odds-ratio semantics, and the self-pair guard.
  */
class RewardFitSpec extends SparkTestBase {

  test("two-item tournament: exact micro strengths, 2:1 odds, fixed point") {
    import spark.implicits._
    // A(1) beats B(2) twice, B beats A once → true BT: w_A = 2·w_B
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("w", "l")
    // round 1 by hand: denom = floor(3e12 / 2e6) = 1_500_000 for both;
    // w_A = floor(2e12 / 1.5e6) = 1_333_333, w_B = floor(1e12 / 1.5e6)
    val r1 = RewardFit.bradleyTerry(pairs, "w", "l", iterations = 1)
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r1.toSeq === Seq((1L, 2L, 3L, 1333333L), (2L, 1L, 3L, 666666L)))
    // round 2 is (up to the grid) the fixed point: strengths unchanged
    val r3 = RewardFit.bradleyTerry(pairs, "w", "l", iterations = 3)
      .orderBy("item").collect().map(_.getLong(3))
    assert(r3.toSeq === Seq(1333333L, 666666L))
    // the 2:1 win-odds survive on the grid
    assert(math.abs(r3(0).toDouble / r3(1) - 2.0) < 1e-5)
  }

  test("a never-winner's strength is exactly 0 from round one on") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L)).toDF("w", "l")
    val out = RewardFit.bradleyTerry(pairs, "w", "l", iterations = 2)
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out(2) === ((3L, 0L, 0L))) // item 3: 0 wins, strength 0
    assert(out(0)._3 > out(1)._3 && out(1)._3 > 0L)
  }

  test("transitive strengths order a 3-item chain correctly") {
    import spark.implicits._
    // A dominates B 3:1, B dominates C 3:1, A vs C never played —
    // strength must still order A > B > C through the shared opponent
    val pairs = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(3)((2L, 3L)) ++ Seq((3L, 2L))).toDF("w", "l")
    val s = RewardFit.bradleyTerry(pairs, "w", "l", iterations = 5)
      .orderBy("item").collect().map(_.getLong(3))
    assert(s(0) > s(1) && s(1) > s(2) && s(2) > 0L,
      s"expected strictly ordered strengths, got ${s.toSeq}")
  }

  test("self-pairs fail loudly; string keys fail loudly") {
    import spark.implicits._
    val bad = Seq((1L, 1L)).toDF("w", "l")
    val e = intercept[IllegalArgumentException] {
      RewardFit.bradleyTerry(bad, "w", "l") }
    assert(e.getMessage.contains("self-pair"))
    val stringy = Seq(("a", "b")).toDF("w", "l")
    val e2 = intercept[IllegalArgumentException] {
      RewardFit.bradleyTerry(stringy, "w", "l") }
    assert(e2.getMessage.contains("numeric"))
  }
}
