package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  test("rank selection hand-checked: p0/p50/p90/p100 over 1..10") {
    val df = (1L to 10L).map(v => ("g", v)).toDF("k", "v")
    val r = Quantiles.perGroup(df, Seq("k"), "v", Seq(0, 50, 90, 100))
      .collect().head
    assert(r.getAs[Long]("p0") == 1L)    // rank floor(9*0)+1   = 1
    assert(r.getAs[Long]("p50") == 5L)   // rank floor(4.5)+1   = 5
    assert(r.getAs[Long]("p90") == 9L)   // rank floor(8.1)+1   = 9
    assert(r.getAs[Long]("p100") == 10L) // rank floor(9)+1     = 10
  }

  test("groups are independent; a 1-element group returns its value everywhere") {
    val df = Seq(("a", 7L), ("b", 1L), ("b", 2L), ("b", 3L)).toDF("k", "v")
    val m = Quantiles.perGroup(df, Seq("k"), "v", Seq(50, 100))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("a" -> ((7L, 7L)), "b" -> ((2L, 3L))))
  }

  test("rank window and final groupBy share one exchange") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderstatus").as("k"),
        col("o_orderkey").as("v"))
    val plan = Quantiles.perGroup(df, Seq("k"), "v", Seq(50))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle:\n$plan")
  }
}
