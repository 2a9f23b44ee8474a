package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive of a
  * training-data pipeline (cross-source record linkage, PII-name
  * clustering, near-identical title collapse).
  *
  * The quadratic risk is the same one the dedup family fights: an
  * unblocked edit-distance join is all-pairs. `blockedLevenshtein` makes
  * the blocking key explicit and part of the contract — candidates are
  * ONLY pairs sharing the key (an equi-join, one shuffle, skew bounded by
  * the largest block), then the exact Levenshtein filter runs inside the
  * join's codegen stage. Recall is exactly "pairs that share the key":
  * pick a normalization the match must survive (a digit suffix, a
  * soundex/metaphone code, a sorted-token fingerprint) the way
  * Dedup.minHashPairs picks bands.
  */
object FuzzyMatch {

  /** Fuzzy-join `left` and `right` on `blockKey(name)` equality, keeping
    * pairs with levenshtein(leftName, rightName) <= maxDist. Emits the
    * left/right id columns, both names, and the distance.
    */
  def blockedLevenshtein(
      left: DataFrame, leftId: String, leftName: String,
      right: DataFrame, rightId: String, rightName: String,
      blockKey: Column => Column, maxDist: Int): DataFrame = {
    val l = left.select(col(leftId), col(leftName).as("_lname"),
      blockKey(col(leftName)).as("_blk"))
    val r = right.select(col(rightId), col(rightName).as("_rname"),
      blockKey(col(rightName)).as("_blk"))
    l.join(r, Seq("_blk"))
      .withColumn("dist", levenshtein(col("_lname"), col("_rname")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col(leftId), col(rightId),
        col("_lname").as(leftName), col("_rname").as(rightName), col("dist"))
  }
}
