package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key partial-aggregate
  * state table (count / sum / min / max — the mergeable algebra) and fold
  * delta batches into it WITHOUT re-reading history.
  *
  * The contract is the partial-aggregation identity Spark itself uses for
  * map-side combine, promoted to a cross-batch operator:
  * `merge(partials(A), partials(B)) == partials(A ∪ B)` for any split and
  * any merge order (the spec asserts both). At 100 TB this is the
  * difference between a refresh that touches one day's delta and one that
  * rescans the corpus: the state table is one row per key, the merge is a
  * single shuffle of state ∪ delta-partials — history volume never moves
  * again. avg and other derivable aggregates come from (sum, cnt) at read
  * time; non-mergeable forms (exact median) are out of scope by design —
  * the sketch aggregates (KMinValues / CountMin, same package family)
  * cover their approximate variants.
  *
  * Sums run on exact integers (callers scale decimals to cents first):
  * float accumulation order would otherwise make "incremental" and
  * "recomputed" differ in the last bits and poison idempotence checks.
  */
object IncrementalAgg {

  private val stateCols = Seq("cnt", "sum", "min", "max")

  /** Collapse a raw batch to per-key partials. */
  def partials(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame = {
    require(!keyCols.exists(stateCols.contains),
      s"key columns must not collide with partial columns $stateCols")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valCol)).cast("long").as("sum"),
      min(col(valCol)).cast("long").as("min"),
      max(col(valCol)).cast("long").as("max"))
  }

  /** Fold a delta's partials into the state. Both sides already hold one
    * row per key, so the union-then-reaggregate is a shuffle of state-size
    * + delta-size rows — never of raw history.
    */
  def merge(state: DataFrame, deltaPartials: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(stateCols.forall(state.columns.contains) &&
      stateCols.forall(deltaPartials.columns.contains),
      s"both sides must carry partial columns $stateCols")
    val cols = keyCols ++ stateCols
    state.select(cols.map(col): _*)
      .unionAll(deltaPartials.select(cols.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("cnt").as("cnt"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"))
  }

  private val sketchStateCols = stateCols ++ Seq("kmv", "cms", "qs")

  /** [[partials]] extended with SKETCH state columns: a KMV distinct-count
    * sketch (`kmv`, ≤ k longs), a per-key count-min array (`cms`, d·w
    * longs), and a bottom-k value sample (`qs`, ≤ 2k longs — the
    * distinct-value quantile state) of the value column. All three are
    * mergeable with the same law as the scalar algebra — KMV and the
    * sample because min-k-by-hash is set-union compatible, CMS because
    * counters add — so incremental DISTINCT, FREQUENCY and QUANTILE
    * estimates ride the identical delta-fold path: state stays one
    * bounded row per key, history never re-shuffles
    * (merge(partials(A), partials(B)) ≡ partials(A ∪ B) is spec-asserted
    * for every column including the sketches).
    */
  def partialsWithSketches(df: DataFrame, keyCols: Seq[String], valCol: String,
      k: Int = 256, d: Int = 4, w: Int = 64): DataFrame = {
    import graft.functions.{BottomKSample, CountMin, KMinValues}
    require(!keyCols.exists(sketchStateCols.contains),
      s"key columns must not collide with state columns $sketchStateCols")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valCol)).cast("long").as("sum"),
      min(col(valCol)).cast("long").as("min"),
      max(col(valCol)).cast("long").as("max"),
      KMinValues.sketch(col(valCol), k).as("kmv"),
      CountMin.sketchArray(col(valCol), d, w).as("cms"),
      BottomKSample.sample(col(valCol), k).as("qs"))
  }

  /** [[merge]] for sketch-carrying state (same (k, d, w) on both sides). */
  def mergeWithSketches(state: DataFrame, deltaPartials: DataFrame,
      keyCols: Seq[String], k: Int = 256, d: Int = 4, w: Int = 64): DataFrame = {
    import graft.functions.{BottomKSample, CountMin, KMinValues}
    require(sketchStateCols.forall(state.columns.contains) &&
      sketchStateCols.forall(deltaPartials.columns.contains),
      s"both sides must carry state columns $sketchStateCols")
    val cols = keyCols ++ sketchStateCols
    state.select(cols.map(col): _*)
      .unionAll(deltaPartials.select(cols.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("cnt").as("cnt"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"),
        KMinValues.mergeSketch(col("kmv"), k).as("kmv"),
        CountMin.mergeArray(col("cms"), d, w).as("cms"),
        BottomKSample.mergeSample(col("qs"), k).as("qs"))
  }
}
