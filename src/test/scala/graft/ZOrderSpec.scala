package graft

import org.apache.spark.sql.graftfn.BitInterleave
import org.apache.spark.sql.functions._

/** Z-order key: Morton-curve values hand-checked, codegen/interpreted
  * parity, SQL registration, and the layout move it exists for
  * (range-partition by z).
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("Morton values hand-checked on the 4x4 grid and 32-bit contract") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 3L),
      (0xFFFFFFFFL, 0L), (1L | (1L << 32), 0L)) // bit 32 ignored by contract
    val got = pts.toDF("a", "b")
      .select(BitInterleave.zorder(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 12L, 15L, 0x5555555555555555L, 1L))
  }

  test("interpreted eval equals codegen result") {
    val df = (0L until 16L).flatMap(a => (0L until 16L).map(b => (a, b))).toDF("a", "b")
    def run(): Seq[Long] = df
      .select(BitInterleave.zorder(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(withCodegen == run())
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_zorder SQL function registered via extensions") {
    val z = spark.sql("SELECT graft_zorder(3L, 3L) AS z").collect().head.getLong(0)
    assert(z == 15L)
  }

  test("z-sorted order clusters both dimensions (quadrants are contiguous)") {
    // the curve's defining property: each 2x2 quadrant of the 4x4 grid
    // occupies one contiguous run of the z-sorted sequence.
    val pts = (0L until 4L).flatMap(a => (0L until 4L).map(b => (a, b)))
    val sorted = pts.toDF("a", "b")
      .withColumn("z", BitInterleave.zorder(col("a"), col("b")))
      .orderBy("z")
      .collect().map(r => (r.getLong(0) / 2, r.getLong(1) / 2)).toSeq
    val runs = sorted.foldLeft(List.empty[(Long, Long)]) {
      case (acc, q) if acc.headOption.contains(q) => acc
      case (acc, q) => q :: acc
    }
    assert(runs.size == 4, s"each quadrant must be one contiguous z-run: $sorted")
  }

  test("range-partitioning by z gives a RangePartitioning exchange (the layout move)") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("z", BitInterleave.zorder(col("o_custkey"), col("o_orderkey")))
      .repartitionByRange(4, col("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(z"), s"expected range partitioning on z:\n$plan")
  }
}
