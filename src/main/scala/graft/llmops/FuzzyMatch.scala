package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Character-trigram similarity pairs (the pg_trgm method — the third
    * classic fuzzy matcher alongside edit distance and the sorted window):
    * two names match when the Jaccard of their padded character-trigram
    * sets reaches `threshold`. Unlike Levenshtein it is transposition-
    * and word-order-tolerant ("ACME Corp" ~ "Corp ACME"), and unlike the
    * window it needs no sort key. Names pad with leading/trailing `_` (2
    * front, 1 back — the pg_trgm convention, so 1-char names still emit
    * trigrams and word starts weigh double).
    *
    * Candidates come from the inverted equi-join on shared trigrams
    * (never all-pairs — the [[graft.llmops.Dedup.ngramJaccardPairs]]
    * shape at character granularity); per-name trigram counts are
    * bounded by name length, and exact set Jaccard verifies. Emits
    * (id_a < id_b, jaccard).
    */
  def charTrigramPairs(df: DataFrame, idCol: String, nameCol: String,
      threshold: Double = 0.4, maxDf: Long = 10000L): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    require(maxDf >= 1)
    val padded = concat(lit("__"), lower(col(nameCol)), lit("_"))
    val ex = df.select(col(idCol).as("doc"), padded.as("__p"))
      .select(col("doc"),
        explode(array_distinct(expr(
          "transform(sequence(1, length(__p) - 2), i -> substring(__p, i, 3))")))
          .as("g"))
      .cache()
    val sizes = ex.groupBy("doc").agg(count(lit(1)).as("n"))
    // the [[graft.llmops.Multimodal.frameJaccardPairs]] skew defense: a
    // corpus-wide naming convention ("Supplier#000…") makes its prefix
    // trigrams ubiquitous and the raw inverted join d²-quadratic — grams
    // above `maxDf` are excluded from CANDIDATE GENERATION only, then
    // counted back per candidate pair so the Jaccard stays EXACT over the
    // full sets; pairs overlapping solely in boilerplate grams are the
    // accepted loss.
    val hot = ex.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("g").cache()
    val cool = ex.join(hot, Seq("g"), "left_anti")
    val sharedCool = cool.alias("x").join(cool.alias("y"),
        col("x.g") === col("y.g") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .agg(count(lit(1)).as("shared_cool"))
    val hotByDoc = ex.join(broadcast(hot), Seq("g"), "left_semi")
    val hotShared = sharedCool.select("id_a", "id_b")
      .join(hotByDoc.select(col("doc").as("id_a"), col("g")), Seq("id_a"))
      .join(hotByDoc.select(col("doc").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_hot"))
    val out = sharedCool
      .join(hotShared, Seq("id_a", "id_b"), "left")
      .withColumn("shared",
        col("shared_cool") + coalesce(col("shared_hot"), lit(0L)))
      .join(sizes.select(col("doc").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint(true)
    ex.unpersist(); hot.unpersist()
    out
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the OTHER
    * classic ER blocker: sort by a key, compare each record only with its
    * `window` successors in the sort order. Where [[blockedLevenshtein]]
    * needs key EQUALITY (misses pairs straddling a block boundary), the
    * sliding window catches near-keys that sort adjacently without ever
    * agreeing exactly — the standard complement; production linkage runs
    * both and unions.
    *
    * Scale: the global sort RANK comes from a range-repartition plus
    * per-partition row_number and a broadcast partition-offset table —
    * the [[Corpus.trainingOrder]] two-pass shape, never a
    * single-partition window. Candidate pairs (0 < rb − ra ≤ window)
    * join on rank BUCKETS of width `window`: the left row sits in its
    * one bucket, the right row replicates to its bucket and the
    * previous one, so every candidate pair emerges exactly ONCE (the
    * left bucket is unique) — an equi-join, never an inequality
    * NestedLoop. Work is n·window candidates by construction. The exact
    * Levenshtein filter runs inside the join stage.
    *
    * Ranks are well-defined regardless of partition boundaries (total
    * order by (sortKey, id)), so output is deterministic. Emits
    * (id_a, id_b, name_a, name_b, rank_gap, dist) with ranks ra < rb.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, nameCol: String,
      sortKey: Column => Column, window: Int, maxDist: Int): DataFrame = {
    require(window >= 1 && maxDist >= 0)
    val reserved = Seq("__sk", "__pid", "__rn", "__off", "__r", "__b")
    require(!df.columns.exists(reserved.contains),
      s"input must not carry reserved columns ${reserved.mkString(", ")}")
    val staged = df
      .select(col(idCol).as("id"), col(nameCol).as("name"),
        sortKey(col(nameCol)).as("__sk"))
      .repartitionByRange(col("__sk"), col("id"))
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
      // materialize ONCE: the offsets and rank branches below both read
      // this frame, and a recomputed range-repartition may sample
      // different boundaries — __pid must mean the same thing in both.
      .localCheckpoint(true)
    val inP = Window.partitionBy("__pid").orderBy(col("__sk"), col("id"))
    val offsets = staged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val ranked = staged
      .withColumn("__rn", row_number().over(inP).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("__r", col("__off") + col("__rn") - 1)
      .select("id", "name", "__r")
      .localCheckpoint(true)
    val leftS = ranked.select(col("id").as("id_a"), col("name").as("name_a"),
      col("__r").as("__ra"), floor(col("__r") / window).cast("long").as("__b"))
    val rightS = ranked.select(col("id").as("id_b"), col("name").as("name_b"),
        col("__r").as("__rb"),
        explode(array(floor(col("__r") / window).cast("long"),
          floor(col("__r") / window).cast("long") - 1)).as("__b"))
    leftS.join(rightS, Seq("__b"))
      .filter(col("__rb") > col("__ra") && col("__rb") <= col("__ra") + window)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        (col("__rb") - col("__ra")).as("rank_gap"), col("dist"))
  }

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    * 1969) — the DECISION layer over this object's candidate generators:
    * blocking/trigram/neighborhood produce candidate pairs with
    * per-field agreement flags; this weighs each field by how much its
    * agreement actually discriminates, instead of treating every field
    * equally. From LABELED pairs (`labelCol` boolean is-match), each
    * field f gets add-1-smoothed conditional agreement rates
    *
    *   m_f = P(agree_f | match) = (a_m + 1) / (n_m + 2)
    *   u_f = P(agree_f | non-match) = (a_u + 1) / (n_u + 2)
    *
    * and the classic log-likelihood-ratio weights `w_agree = ln(m/u)`,
    * `w_disagree = ln((1−m)/(1−u))` — both on the 1e-6 micro-log grid
    * (the Naive Bayes recipe: the single `ln` computed from exact
    * integer counts, every later decision an integer sum). A field that
    * agrees as often on non-matches as matches weighs ~0; a
    * discriminating field's disagreement actively argues against the
    * link. Returns one row per field: (field, n_match, n_unmatch,
    * agree_match, agree_unmatch, w_agree_micro, w_disagree_micro). ONE
    * aggregation pass over the labeled pairs; the result is
    * fields-bounded.
    */
  def fellegiSunterWeights(labeled: DataFrame, labelCol: String,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty, "at least one agreement column")
    val isM = col(labelCol).cast("boolean")
    val aggs = Seq(
      sum(when(isM, 1L).otherwise(0L)).as("n_match"),
      sum(when(!isM, 1L).otherwise(0L)).as("n_unmatch")) ++
      agreeCols.flatMap { f =>
        Seq(sum(when(isM && col(f).cast("boolean"), 1L).otherwise(0L))
          .as(s"__am_$f"),
          sum(when(!isM && col(f).cast("boolean"), 1L).otherwise(0L))
            .as(s"__au_$f"))
      }
    val t = labeled.agg(aggs.head, aggs.tail: _*)
    val spark = labeled.sparkSession
    agreeCols.map { f =>
      t.select(lit(f).as("field"), col("n_match"), col("n_unmatch"),
        col(s"__am_$f").as("agree_match"), col(s"__au_$f").as("agree_unmatch"),
        round(log(((col(s"__am_$f") + 1L).cast("double") / (col("n_match") + 2L)) /
          ((col(s"__au_$f") + 1L).cast("double") / (col("n_unmatch") + 2L))) * 1e6)
          .cast("long").as("w_agree_micro"),
        round(log((lit(1.0) - (col(s"__am_$f") + 1L).cast("double") / (col("n_match") + 2L)) /
          (lit(1.0) - (col(s"__au_$f") + 1L).cast("double") / (col("n_unmatch") + 2L))) * 1e6)
          .cast("long").as("w_disagree_micro"))
    }.reduce(_ unionByName _)
  }

  /** Score candidate pairs under trained [[fellegiSunterWeights]] and
    * decide: `score = Σ_f (agree_f ? w_agree_f : w_disagree_f)`,
    * `decision = link` at `score ≥ upperMicro`, `nonlink` at
    * `≤ lowerMicro`, `possible` between (the FS three-way rule — the
    * clerical-review band is the method's point). The weight table is
    * fields-bounded and collects to DRIVER LITERALS, so scoring is one
    * pure codegen'd projection over the pair stream — zero joins, zero
    * shuffles.
    */
  def fellegiSunterScore(pairs: DataFrame, weights: DataFrame,
      agreeCols: Seq[String], upperMicro: Long, lowerMicro: Long): DataFrame = {
    require(upperMicro >= lowerMicro, "upper threshold below lower")
    val w = weights
      .select("field", "w_agree_micro", "w_disagree_micro").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val missing = agreeCols.filterNot(w.contains)
    require(missing.isEmpty,
      s"no trained weights for field(s): ${missing.mkString(", ")}")
    val score = agreeCols.map { f =>
      val (wa, wd) = w(f)
      when(col(f).cast("boolean"), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    pairs.withColumn("score_micro", score)
      .withColumn("decision",
        when(col("score_micro") >= upperMicro, lit("link"))
          .when(col("score_micro") <= lowerMicro, lit("nonlink"))
          .otherwise(lit("possible")))
  }
}
