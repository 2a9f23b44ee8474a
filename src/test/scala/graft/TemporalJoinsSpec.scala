package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Semantics of the temporal join operators on hand-built frames — the
  * DuckDB oracles (q_t_*) check them at data scale; these pin the edge
  * cases: inclusivity at equal ts, unmatched nulls, tolerance staleness,
  * null VALUES inside a matched right row, half-open interval bounds,
  * multi-bin intervals emerging exactly once, degenerate intervals.
  */
class TemporalJoinsSpec extends SparkTestBase {

  test("asofJoin attaches the latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 25L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 6L, "c")).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t")
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Any]("t_right"), r.getString(3)))
    // t=10 matches the EQUAL-ts right row (inclusive); t=25 takes the later
    // b; (2,5) has no right row at-or-before → nulls, row survives.
    assert(out.toSeq == Seq((1L, 10L, 10L, "a"), (1L, 25L, 20L, "b"), (2L, 5L, null, null)))
  }

  test("asofJoin tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 95L, "x")).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", tolerance = Some(lit(10L)))
      .orderBy("t").collect().map(r => (r.getLong(1), r.getString(3)))
    assert(out.toSeq == Seq((100L, "x"), (200L, null))) // 200-95=105 > 10 → stale
  }

  test("asofJoin preserves a null VALUE inside the matched right row") {
    import spark.implicits._
    val left = Seq((1L, 30L)).toDF("k", "t")
    // latest right row (t=20) carries a null v; the match must surface THAT
    // null, not skip back to the older non-null row (struct packing).
    val right = Seq((1L, 10L, "old"), (1L, 20L, null)).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t").collect().head
    assert(out.getAs[Long]("t_right") == 20L)
    assert(out.getAs[String]("v") == null)
  }

  test("asofJoinForward attaches the earliest at-or-after right row per key") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 25L), (2L, 9L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 6L, "c")).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoinForward(left, right, Seq("k"), "t")
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Any]("t_right"), r.getString(3)))
    // t=10 matches the EQUAL-ts right row (inclusive); t=25 has no future
    // right → nulls, row survives; (2,9) looks ahead of c → nulls.
    assert(out.toSeq == Seq((1L, 10L, 10L, "a"), (1L, 25L, null, null), (2L, 9L, null, null)))
  }

  test("asofJoinForward tolerance bounds how far ahead the match may be") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 105L, "x")).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoinForward(left, right, Seq("k"), "t",
        tolerance = Some(lit(10L)))
      .orderBy("t")
      .collect().map(r => (r.getLong(1), r.getAs[Any]("v")))
    // t=100 → 105 is 5 ahead (within 10); t=10 → 95 ahead (too far).
    assert(out.toSeq == Seq((10L, null), (100L, "x")))
  }

  test("rangeJoin honors half-open bounds and emits multi-bin pairs once") {
    import spark.implicits._
    val points = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 1999L))
      .toDF("pid", "p")
    // [10, 20) catches 10 and 19 but not 20 (exclusive) nor 0;
    // [0, 2000) spans many 7-wide bins yet each pair appears exactly once;
    // [50, 50) is degenerate and matches nothing.
    val ivs = Seq((100L, 10L, 20L), (200L, 0L, 2000L), (300L, 50L, 50L))
      .toDF("iid", "s", "e")
    val out = TemporalJoins.rangeJoin(points, "p", ivs, "s", "e", binWidth = 7)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "pairs must be emitted exactly once")
    assert(out.toSet == Set((2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L), (3L, 200L), (4L, 200L), (5L, 200L)))
  }

  test("intervalJoin pairs overlapping intervals exactly once, half-open") {
    import spark.implicits._
    // [0, 100) spans many 7-wide bins; every overlapping partner must
    // still emerge exactly once. [10, 20) vs [20, 30) touch only at the
    // excluded endpoint → no pair. [50, 50) is degenerate.
    val left = Seq((1L, 0L, 100L), (2L, 10L, 20L), (3L, 200L, 210L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 90L, 300L), (20L, 20L, 30L), (30L, 50L, 50L),
        (40L, 0L, 1000L))
      .toDF("rid", "rs", "re")
    val out = TemporalJoins.intervalJoin(left, "ls", "le", right, "rs", "re",
        binWidth = 7)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "pairs must be emitted exactly once")
    assert(out.toSet == Set((1L, 10L), (1L, 20L), (1L, 40L),
      (2L, 40L), (3L, 10L), (3L, 40L)))
  }

  test("intervalJoin with keys restricts pairs to equal keys") {
    import spark.implicits._
    val left = Seq((1L, 0L, 50L, 10L), (2L, 0L, 50L, 20L)).toDF("lid", "ls", "le", "u")
    val right = Seq((9L, 40L, 60L, 10L)).toDF("rid", "rs", "re", "u")
    val out = TemporalJoins.intervalJoin(left, "ls", "le", right, "rs", "re",
        binWidth = 100, keys = Seq("u"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 9L)))
  }

  test("rangeJoin with keys co-partitions by key and bin") {
    import spark.implicits._
    val points = Seq((1L, 15L, 10L), (2L, 15L, 20L)).toDF("pid", "p", "u")
    val ivs = Seq((9L, 10L, 20L, 10L)).toDF("iid", "s", "e", "u")
    val out = TemporalJoins.rangeJoin(points, "p", ivs, "s", "e",
        binWidth = 100, keys = Seq("u"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 9L))) // user 20's point misses user 10's interval
  }
}
