package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** The mergeable-partials contract: merge(partials(A), partials(B)) ==
  * partials(A ∪ B), for any split and any merge order.
  */
class IncrementalAggSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select(col("o_custkey").cast("long"), col("cnt"), col("sum"), col("min"), col("max"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq

  test("three-way split merges to the from-scratch aggregate, any merge order") {
    val o = Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val full = canon(IncrementalAgg.partials(o, Seq("o_custkey"), "cents"))
    val parts = (0 until 3).map(i =>
      IncrementalAgg.partials(o.filter(col("o_orderkey") % 3 === i),
        Seq("o_custkey"), "cents"))
    val leftFold = canon(IncrementalAgg.merge(
      IncrementalAgg.merge(parts(0), parts(1), Seq("o_custkey")),
      parts(2), Seq("o_custkey")))
    val otherOrder = canon(IncrementalAgg.merge(
      IncrementalAgg.merge(parts(2), parts(0), Seq("o_custkey")),
      parts(1), Seq("o_custkey")))
    assert(leftFold == full)
    assert(otherOrder == full)
  }

  test("keys present on only one side survive the merge") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 5L)).toDF("o_custkey", "v")
    val b = Seq((2L, 7L), (3L, 1L)).toDF("o_custkey", "v")
    val m = canon(IncrementalAgg.merge(
      IncrementalAgg.partials(a, Seq("o_custkey"), "v"),
      IncrementalAgg.partials(b, Seq("o_custkey"), "v"), Seq("o_custkey")))
    assert(m == Seq((1L, 1L, 10L, 10L, 10L), (2L, 2L, 12L, 5L, 7L), (3L, 1L, 1L, 1L, 1L)))
  }

  private def canonSketch(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Seq[Long], Seq[Long], Seq[Long])] =
    df.select(col("o_custkey").cast("long"), col("cnt"), col("kmv"), col("cms"), col("qs"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toSeq, r.getSeq[Long](3).toSeq, r.getSeq[Long](4).toSeq))
      .sortBy(_._1).toSeq

  test("sketch merge law: merge(partials(A), partials(B)) ≡ partials(A ∪ B) bit-for-bit") {
    // small k/w so the KMV estimator branch AND bucket collisions both
    // occur; the law must hold as ARRAY EQUALITY, not estimate-tolerance.
    val (k, d, w) = (16, 4, 32)
    val o = Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val full = canonSketch(
      IncrementalAgg.partialsWithSketches(o, Seq("o_custkey"), "cents", k, d, w))
    val parts = (0 until 3).map(i =>
      IncrementalAgg.partialsWithSketches(o.filter(col("o_orderkey") % 3 === i),
        Seq("o_custkey"), "cents", k, d, w))
    val leftFold = canonSketch(IncrementalAgg.mergeWithSketches(
      IncrementalAgg.mergeWithSketches(parts(0), parts(1), Seq("o_custkey"), k, d, w),
      parts(2), Seq("o_custkey"), k, d, w))
    val otherOrder = canonSketch(IncrementalAgg.mergeWithSketches(
      IncrementalAgg.mergeWithSketches(parts(2), parts(0), Seq("o_custkey"), k, d, w),
      parts(1), Seq("o_custkey"), k, d, w))
    assert(leftFold == full)
    assert(otherOrder == full)
  }

  test("sketch state estimates match their definitions on a hand-built group") {
    import graft.functions.{CountMin, KMinValues}
    import spark.implicits._
    // key 1: values 10,10,20 → distinct 2, freq(10) ≥ 2; key 2: empty side.
    val a = Seq((1L, 10L), (1L, 10L)).toDF("o_custkey", "v")
    val b = Seq((1L, 20L), (2L, 5L)).toDF("o_custkey", "v")
    val st = IncrementalAgg.mergeWithSketches(
      IncrementalAgg.partialsWithSketches(a, Seq("o_custkey"), "v", 16, 4, 32),
      IncrementalAgg.partialsWithSketches(b, Seq("o_custkey"), "v", 16, 4, 32),
      Seq("o_custkey"), 16, 4, 32)
    val got = st.select(col("o_custkey"),
        KMinValues.estimate(col("kmv"), 16).as("dv"),
        CountMin.estimateArray(col("cms"), lit(10L), 4, 32).as("f10"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2.0, 2L)))   // exact branch below k; CMS never undercounts
    assert(got(2L)._1 == 1.0)
    // CMS of key 2 holds one value (5); probing 10 may collide (≥0), never negative.
    assert(got(2L)._2 >= 0L)
  }

  test("bottom-k sample quantiles: exact below k, lower-rank rule, merge-stable") {
    import graft.functions.BottomKSample
    import spark.implicits._
    // key 1 distinct values {5, 10, 20, 40}: p50 rank = floor(3·50/100)+1
    // = 2 → 10; p100 → 40. Duplicates collapse (distinct-value semantics).
    val a = Seq((1L, 10L), (1L, 10L), (1L, 5L)).toDF("o_custkey", "v")
    val b = Seq((1L, 20L), (1L, 40L), (1L, 5L)).toDF("o_custkey", "v")
    val st = IncrementalAgg.mergeWithSketches(
      IncrementalAgg.partialsWithSketches(a, Seq("o_custkey"), "v", 16, 4, 32),
      IncrementalAgg.partialsWithSketches(b, Seq("o_custkey"), "v", 16, 4, 32),
      Seq("o_custkey"), 16, 4, 32)
    val r = st.filter(col("o_custkey") === 1L).select(
      BottomKSample.distinctQuantile(col("qs"), 50).as("p50"),
      BottomKSample.distinctQuantile(col("qs"), 0).as("p0"),
      BottomKSample.distinctQuantile(col("qs"), 100).as("p100")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 5L, 40L)))
  }

  test("histogram state: merge law exact for any split; clamp and rank rule hand-checked") {
    import graft.functions.LongHistogram
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    def hist(f: org.apache.spark.sql.DataFrame) = f.groupBy("source")
      .agg(LongHistogram.sketch(col("n_chars"), 64, 32L).as("hist"))
    val full = hist(docs).collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    val merged = (0 until 3).map(i => hist(docs.filter(col("doc_id") % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy("source").agg(LongHistogram.mergeSketch(col("hist"), 64).as("hist"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    assert(merged == full, "merge(hist(A), hist(B), hist(C)) must equal hist(A ∪ B ∪ C)")
    // clamp + rank rule on a hand-built group: g = 10, B = 4 → buckets
    // [0,10) [10,20) [20,30) [30,∞). Values: -5 clamps to bucket 0;
    // 35 and 99 clamp INTO the last bucket. n = 6.
    val vals = Seq(-5L, 3L, 12L, 25L, 35L, 99L).map(("k", _)).toDF("k", "v")
    val st = vals.groupBy("k").agg(LongHistogram.sketch(col("v"), 4, 10L).as("hist"))
    val q = LongHistogram.quantiles(st, Seq("k"), "hist", Seq(0, 50, 100), 10L)
      .collect().head
    // hist = [2, 1, 1, 2]; ranks: p0 → 1 → bucket 0 → 0; p50 → (5*50)div100+1
    // = 3 → bucket 1 → 10; p100 → 6 → bucket 3 → 30 (the clamp floor).
    assert((q.getAs[Long]("n"), q.getAs[Long]("p0"), q.getAs[Long]("p50"),
      q.getAs[Long]("p100")) == ((6L, 0L, 10L, 30L)))
  }

  test("weighted histogram: weights accumulate, merge law holds, differs from unweighted") {
    import graft.functions.LongHistogram
    import spark.implicits._
    // values 10 (weight 1) and 30 (weight 9): the unweighted median is
    // rank 1 of {10, 30} → 10, the weighted median is the 5th of 10
    // weight units → 30.
    val vw = Seq(("k", 10L, 1L), ("k", 30L, 9L)).toDF("k", "v", "w")
    val st = vw.groupBy("k")
      .agg(LongHistogram.sketchWeighted(col("v"), col("w"), 8, 10L).as("hist"))
    val q = LongHistogram.quantiles(st, Seq("k"), "hist", Seq(50), 10L).collect().head
    assert((q.getAs[Long]("n"), q.getAs[Long]("p50")) == ((10L, 30L)))
    val stU = vw.groupBy("k")
      .agg(LongHistogram.sketch(col("v"), 8, 10L).as("hist"))
    val qU = LongHistogram.quantiles(stU, Seq("k"), "hist", Seq(50), 10L).collect().head
    assert(qU.getAs[Long]("p50") == 10L)
    // merge law on real data: 3-way split of token-weighted n_chars.
    val docs = Tables.documents(spark, dir)
      .withColumn("__w", size(split(trim(col("text")), "\\s+")).cast("long"))
    def hist(f: org.apache.spark.sql.DataFrame) = f.groupBy("source")
      .agg(LongHistogram.sketchWeighted(col("n_chars"), col("__w"), 64, 32L).as("hist"))
    val full = hist(docs).collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    val merged = (0 until 3).map(i => hist(docs.filter(col("doc_id") % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy("source").agg(LongHistogram.mergeSketch(col("hist"), 64).as("hist"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toMap
    assert(merged == full)
  }

  test("histogram quantiles at granularity 1 equal the exact per-group rank quantiles") {
    import graft.operators.Quantiles
    val docs = Tables.documents(spark, dir)
      .filter(col("n_chars") < 1023) // inside the un-clamped domain
    val st = docs.groupBy("source")
      .agg(graft.functions.LongHistogram.sketch(col("n_chars"), 1024, 1L).as("hist"))
    val viaHist = graft.functions.LongHistogram
      .quantiles(st, Seq("source"), "hist", Seq(50, 90, 99), 1L)
      .select("source", "p50", "p90", "p99").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = Quantiles.perGroup(docs, Seq("source"), "n_chars", Seq(50, 90, 99))
      .select("source", "p50", "p90", "p99").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaHist == exact)
  }
}
