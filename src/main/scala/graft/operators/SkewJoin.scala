package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salting for skew-heavy equi-joins — the manual escape hatch
  * when AQE's skew-join split can't help (e.g. the skew is in a
  * broadcast-ineligible build side, or the join feeds an operator AQE
  * won't re-plan). At 100 TB a single hot key (the null-ish default
  * tenant, the empty-string folder) can pin an entire executor; salting
  * spreads that key's rows across `salts` reducers at the cost of
  * replicating the (smaller) right side `salts`×.
  *
  * The salt is a deterministic per-row hash of the whole left row — not a
  * random number — so the operator stays idempotent and retry-safe
  * (Spark task retries recompute identical salts; a rand() salt would
  * silently duplicate/drop rows on stage retry, the classic trap).
  */
object SkewJoin {

  /** Inner equi-join on `keys` with the left side salted into `salts`
    * sub-keys and the right side replicated once per salt. Result is
    * row-for-row identical to `left.join(right, keys)`.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s)): _*)))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
