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
}
