package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles by rank selection — the deterministic
  * alternative to `percentile_approx` when the answer must be
  * reproducible (and oracle-checkable) bit-for-bit.
  *
  * Definition: quantile p (in percent) of a group of n values is the
  * element at 1-based ascending rank `floor((n−1)·p/100) + 1` — the
  * "lower" quantile, no interpolation, so the result is always an actual
  * data value and identical on every engine regardless of float rounding
  * or tie order (ties share the value being selected).
  *
  * Plan shape: ONE shuffle. The rank window partitions by the group keys
  * and the final groupBy reuses that partitioning (no second exchange —
  * PlanSpec-asserted). Per-group sort is the unavoidable cost of exact
  * quantiles; for sketch-grade answers at 100 TB the KMV/CountMin family
  * (graft.functions) is the approximate path.
  */
object Quantiles {

  def perGroup(df: DataFrame, keyCols: Seq[String], valCol: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100))
    require(percents.distinct.size == percents.size,
      s"duplicate percents would emit duplicate columns: $percents")
    require(!df.columns.contains("_rn") && !df.columns.contains("_cnt"),
      "input must not carry reserved columns _rn, _cnt")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(valCol))
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val ranked = df
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(wAll))
    val picks = percents.map { p =>
      val rank = floor(((col("_cnt") - 1) * p) / 100) + 1
      max(when(col("_rn") === rank, col(valCol))).as(s"p$p")
    }
    ranked.groupBy(keyCols.map(col): _*)
      .agg(picks.head, picks.tail: _*)
  }
}
