package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins — each expressed as a
  * composition of shuffle-friendly primitives rather than the naive
  * inequality join (which Spark plans as a BroadcastNestedLoopJoin: |L|×|R|
  * work, the classic 100 TB killer).
  *
  * - [[asofJoin]]: latest right row at-or-before each left row per key —
  *   ONE shuffle (a keyed window over the tagged union), no join node at
  *   all, no per-key driver state. The event-pipeline staple ("attach the
  *   most recent snapshot/click/price to every event").
  * - [[rangeJoin]]: point-in-interval join via time-axis bucketing — each
  *   interval explodes into the bins it covers, points equi-join on their
  *   single bin, an exact containment filter removes false bin neighbors.
  *   Each matching pair emerges exactly once (a point owns one bin), so no
  *   dedup pass. Bin width tunes the explode factor vs bucket selectivity
  *   (≈ mean interval length is a good default).
  */
object TemporalJoins {

  /** For each left row, attach the single latest right row with equal
    * `keys` and `right.tsCol <= left.tsCol` (inclusive; unmatched → nulls,
    * left rows always survive). All right columns except keys/ts are
    * attached under their own names (must not collide with left's), plus
    * the matched right timestamp as `<tsCol>_right`. `tolerance` (same
    * units as a numeric tsCol) nulls out matches older than
    * `left.ts - tolerance` — bounding how stale an attached row may be.
    *
    * Right rows sharing an exact (keys, ts) are ambiguous — dedup first
    * (e.g. Upsert.dedupeLastWriter) for deterministic output.
    *
    * Implementation: tag sides, union, and take a running
    * `last(<right struct>, ignoreNulls)` over (keys) ordered by
    * (ts, side) — right sorts before left at equal ts, which is what makes
    * the match inclusive. The right payload rides in ONE struct so a null
    * VALUE inside a matched row is preserved rather than skipped past.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, keys, tsCol, tolerance, forward = false)

  /** Mirror of [[asofJoin]] looking FORWARD: the single EARLIEST right row
    * with `right.tsCol >= left.tsCol` per key (inclusive). The
    * "next-event" staple: attach the next restock to every stock-out, the
    * next deploy to every alert. Same one-shuffle tagged-union window,
    * ordered descending so the running `last` sees the nearest future row.
    * `tolerance` bounds how FAR AHEAD the match may be.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, keys, tsCol, tolerance, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tolerance: Option[Column], forward: Boolean): DataFrame = {
    val valCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(valCols.nonEmpty, "right side carries no value columns")
    val clash = valCols.toSet & left.columns.toSet
    require(clash.isEmpty, s"right value columns collide with left: $clash")
    val rightTs = s"${tsCol}_right"
    // Reserved internals: a caller frame already carrying them would
    // silently corrupt the union/window instead of failing here.
    val reserved = Set("__side", "__rv", "__m", rightTs)
    val resClash = (left.columns.toSet | right.columns.toSet) & reserved
    require(resClash.isEmpty,
      s"inputs must not contain reserved asof columns: $resClash")
    val r = right
      .select(keys.map(col) :+ col(tsCol) :+
        struct(col(tsCol).as(rightTs) +: valCols.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val staleness =
      if (forward) (m: Column) => m(rightTs) - col(tsCol)
      else (m: Column) => col(tsCol) - m(rightTs)
    val bounded = tolerance.fold(matched)(tol => matched.withColumn("__m",
      when(col("__m").isNotNull && staleness(col("__m")) <= tol, col("__m"))))
    bounded.select(left.columns.map(col) ++
      (rightTs +: valCols).map(c => col("__m")(c).as(c)): _*)
  }

  /** Join left points to right half-open intervals `[startCol, endCol)`,
    * optionally also equi-matching on `keys`. Degenerate intervals
    * (end <= start) match nothing. Columns of both sides pass through
    * (caller keeps names disjoint apart from `keys`).
    */
  def rangeJoin(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      binWidth: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "inputs must not contain the reserved column __bin")
    val lb = left.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val rb = right
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        // end is exclusive: the last covered bin holds end - 1.
        floor((col(endCol) - 1) / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin") ++ keys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pair every left interval `[lStart, lEnd)` with
    * every right interval `[rStart, rEnd)` that OVERLAPS it (shares at
    * least one instant: `lStart < rEnd AND rStart < lEnd`), optionally
    * also equi-matching on `keys` — the interval×interval sibling of the
    * point-in-interval [[rangeJoin]] ("which maintenance windows collided
    * with which incident windows"). Degenerate intervals (end <= start)
    * match nothing. Columns of both sides pass through (caller keeps
    * names disjoint apart from `keys`).
    *
    * Implementation: BOTH sides explode to the bins they cover and
    * equi-join on bin (never the inequality join Spark would plan as a
    * NestedLoop). An overlapping pair shares every bin their overlap
    * region covers — to emit it exactly once WITHOUT a dedup shuffle, a
    * pair is kept only in the bin that contains the overlap's first
    * instant, `greatest(lStart, rStart)`: that instant lies in both
    * sides' covered ranges by definition, so exactly one surviving copy
    * exists. Explode factor = interval length / binWidth per side; size
    * `binWidth` ≈ the mean interval length, exactly as [[rangeJoin]].
    */
  def intervalJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidth: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "inputs must not contain the reserved column __bin")
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bin", explode(sequence(
        floor(col(s) / binWidth).cast("long"),
        // end is exclusive: the last covered bin holds end - 1.
        floor((col(e) - 1) / binWidth).cast("long"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("__bin") ++ keys)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // emit-once: only the bin holding the overlap's first instant keeps
      // the pair (that bin is covered by both sides, so it exists).
      .filter(col("__bin") ===
        floor(greatest(col(lStart), col(rStart)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
