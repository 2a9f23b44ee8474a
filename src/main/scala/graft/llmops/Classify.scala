package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A trainable document-quality classifier — the fastText-style linear
  * filter every modern corpus pipeline runs (CCNet scores pages against
  * Wikipedia; RefinedWeb and FineWeb-Edu gate on a learned quality
  * model) — re-expressed as three engine operators: hashed bag-of-words
  * featurization, distributed BATCH-PERCEPTRON training, and broadcast
  * linear scoring.
  *
  * Why a batch perceptron and not logistic regression: the perceptron's
  * batch update `w ← w + Σ_{misclassified i} y_i·x_i` is a SUM over an
  * order-free set — all-integer when counts are integers and labels are
  * ±1 — so K training rounds produce BIT-IDENTICAL weights on any
  * engine, any partitioning, any parallelism. A gradient step through
  * `exp`/float sums would depend on libm and partition order and break
  * the value-exact oracle contract (the same trade [[Selection]]
  * documents for DSIR's log-ratio). The margin signal it learns is the
  * same "which vocabulary separates good from bad" a linear logistic
  * filter uses.
  *
  * Scale (the 100 TB question): features are one token explode + one
  * (id, feat) count — linear in corpus tokens, feat space capped at
  * `dim`. Each training round is exactly two linear shuffles over the
  * LABELED set only (margins: broadcast-weight join + groupBy id;
  * update: semi-join misclassified ids + groupBy feat, ≤ dim rows out);
  * the weight table is ≤ dim rows and ALWAYS broadcasts. Labeled sets
  * are small by nature (human or model labels), the corpus-wide pass is
  * scoring only: one broadcast join + map-side-combinable sum. Nothing
  * quadratic, nothing driver-side, rounds bounded by the caller.
  */
object Classify {

  /** Hashed bag-of-words features: one row per (doc, bucket) with the
    * token count, `feat = hash52(lowercased token) % dim`. The hashing
    * trick caps the feature space at `dim` regardless of vocabulary
    * (collisions fold rare features together — the standard trade).
    * `tokens` defaults to whitespace tokenization; pass
    * [[TextAnalysis.scriptTokens]] for CJK-aware units.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024,
      tokens: Column => Column = TextAnalysis.wsTokens): DataFrame = {
    require(dim >= 2)
    df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol),
        (PortableHash.hash52(col("tok")) % dim.toLong).as("feat"))
      .groupBy(col(idCol), col("feat")).agg(count(lit(1)).as("cnt"))
  }

  /** Batch-perceptron training: from w = 0, each round scores every
    * labeled doc (margin = Σ_f w[f]·cnt[f]), collects the misclassified
    * set (y·margin ≤ 0 — a zero margin counts as wrong, which is what
    * makes round 1 from w = 0 the plain class-difference vector), and
    * adds `Σ_mis y_i·x_i` to the weights. Returns the (feat, w) table —
    * ≤ dim rows, broadcastable by construction. All arithmetic is
    * integer: counts × (±1) labels summed into longs, exact on any
    * engine and replayable as an unrolled SQL chain.
    *
    * `labels` must be one row per labeled doc: (idCol, label ∈ {−1,+1}).
    * Docs with no feature rows (empty text) never enter the update sum —
    * equivalent to carrying them misclassified with an empty
    * contribution. The per-round weight frame is eagerly checkpointed:
    * iterative plans double otherwise, and the materialized ≤ dim-row
    * frame broadcasts on exact size.
    *
    * `averaged = true` returns `Σ_t w_t` — the UNNORMALIZED averaged
    * perceptron (Freund & Schapire's voted-perceptron average without
    * the division, so it stays integer-exact; the missing 1/K factor is
    * sign-irrelevant for classification). On non-separable data the
    * plain batch update OSCILLATES — each round the full misclassified
    * mass flips the common-vocabulary weights, and the final round's
    * parity decides the verdict for every borderline doc; the round-sum
    * damps exactly that (measured on the distillation fixture: final
    * weights alternate all-reject/learned by round parity, the average
    * is stable from round 5 on).
    */
  def trainPerceptron(features: DataFrame, labels: DataFrame,
      idCol: String, rounds: Int = 3, averaged: Boolean = false): DataFrame = {
    require(rounds >= 1)
    val ft = features.join(labels, Seq(idCol))
      .select(col(idCol), col("feat"), col("cnt"), col("label"))
      .localCheckpoint(true)
    var w = ft.groupBy("feat")
      .agg(sum(col("label") * col("cnt")).as("w")).localCheckpoint(true)
    // r16: the round-sum is assembled ONCE at the end from the rounds'
    // already-checkpointed weight frames (every round shares w₁'s feat
    // set — round 1 aggregates ALL labeled features and later rounds
    // left-join deltas onto it — so the union-groupBy integer sum equals
    // the old per-round inner-join accumulation exactly, minus one join
    // and one eager checkpoint job per round).
    val roundWs = Seq.newBuilder[DataFrame]
    roundWs += w
    for (_ <- 2 to rounds) {
      val mis = ft.join(broadcast(w), Seq("feat"))
        .groupBy(col(idCol), col("label"))
        .agg(sum(col("cnt") * col("w")).as("margin"))
        .filter(col("label") * col("margin") <= 0)
        .select(col(idCol))
      val delta = ft.join(mis, Seq(idCol))
        .groupBy("feat").agg(sum(col("label") * col("cnt")).as("d"))
      w = w.join(delta, Seq("feat"), "left")
        .select(col("feat"), (col("w") + coalesce(col("d"), lit(0L))).as("w"))
        .localCheckpoint(true)
      roundWs += w
    }
    if (averaged)
      roundWs.result().reduce(_.unionByName(_))
        .groupBy("feat").agg(sum(col("w")).as("w"))
    else w
  }

  /** Corpus-wide linear scoring against a trained weight table: margin
    * per doc (features absent from the table — vocabulary the training
    * set never saw — carry weight 0), `pred = sign(margin)` with 0 → −1
    * (reject on no evidence, the conservative gate). One broadcast join
    * and one map-side-combinable sum over the corpus feature rows; docs
    * with no features at all score 0 via the left join from `docs`.
    */
  def scorePerceptron(docs: DataFrame, features: DataFrame,
      weights: DataFrame, idCol: String): DataFrame = {
    val m = features.join(broadcast(weights), Seq("feat"))
      .groupBy(col(idCol)).agg(sum(col("cnt") * col("w")).as("m0"))
    docs.select(col(idCol)).join(m, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("m0"), lit(0L)).as("margin"))
      .withColumn("pred", when(col("margin") > 0, lit(1L)).otherwise(lit(-1L)))
  }

  /** Trained multinomial Naive Bayes model over hashed features: the
    * `classes` table is one row per label (doc/token counts, micro-log
    * prior, micro-log unseen-feature probability), `features` one row
    * per (label, feat) with the Laplace-smoothed micro-log likelihood —
    * both ≤ classes × dim rows, broadcastable by construction.
    */
  final case class NbModel(classes: DataFrame, features: DataFrame)

  /** Multinomial Naive Bayes training — the GENERATIVE counterpart to
    * [[trainPerceptron]], and natively MULTICLASS (the shape language-ID
    * and topic gates want, where the perceptron is binary): per class c,
    *
    *   log P(c)    = ln(N_c / N)
    *   log P(f|c)  = ln((cnt(c,f) + 1) / (T_c + dim))   (Laplace)
    *
    * quantized to a 1e-6 micro-log grid ([[Unigram]]'s nll recipe — the
    * single `ln` is the only float, computed from exact integer counts
    * with the SAME expression shape on both engines, so the DuckDB
    * oracle reproduces every grid value; all later scoring arithmetic is
    * integer sums). Training is ONE pass: join labels, one (label, feat)
    * groupBy, one per-class total — no rounds at all, NB's classic
    * operational advantage over every iterative fit here.
    *
    * `labels` is one row per labeled doc: (idCol, labelCol) — labels of
    * any orderable type; `dim` must be the featurizer's dim (it is the
    * smoothing denominator's vocabulary size).
    */
  def trainNaiveBayes(features: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String, dim: Int = 1024): NbModel = {
    require(dim >= 2)
    val lab = labels.select(col(idCol), col(labelCol).as("label"))
    val byClass = lab.groupBy("label").agg(count(lit(1)).as("n_docs"))
    val tot = lab.agg(count(lit(1)).as("__n"))
    val fc = features.join(lab, Seq(idCol))
      .groupBy("label", "feat").agg(sum("cnt").as("cnt"))
      .localCheckpoint(true)
    val tc = fc.groupBy("label").agg(sum("cnt").as("n_tokens"))
    val classes = byClass.join(tc, Seq("label"), "left")
      .na.fill(0L, Seq("n_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("label"), col("n_docs"), col("n_tokens"),
        round(log(col("n_docs").cast("double") / col("__n")) * 1e6)
          .cast("long").as("logprior_micro"),
        round(log(lit(1.0) / (col("n_tokens") + dim.toLong)) * 1e6)
          .cast("long").as("unseen_micro"))
      .localCheckpoint(true)
    val feats = fc.join(classes.select("label", "n_tokens"), Seq("label"))
      .select(col("label"), col("feat"), col("cnt"),
        round(log((col("cnt") + 1L).cast("double") /
          (col("n_tokens") + dim.toLong)) * 1e6)
          .cast("long").as("logp_micro"))
      .localCheckpoint(true)
    NbModel(classes, feats)
  }

  /** Corpus-wide Naive Bayes scoring: per doc and class,
    * `score = logprior + Σ_f cnt_f · logp(f|c)` (features the class
    * never saw take the class's unseen cost), prediction = the highest
    * score with ties to the SMALLEST label — deterministic on any
    * engine. One broadcast of each model table, one corpus-feature ×
    * classes expansion (classes are few; the standard multiclass cost),
    * one keyed sum, one per-doc ≤-classes-row window. Docs with no
    * features score on priors alone. Returns (idCol, pred,
    * score_micro).
    */
  def scoreNaiveBayes(docs: DataFrame, features: DataFrame,
      model: NbModel, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perFeat = features
      .crossJoin(broadcast(model.classes.select("label", "unseen_micro")))
      .join(broadcast(model.features.select("label", "feat", "logp_micro")),
        Seq("label", "feat"), "left")
      .select(col(idCol), col("label"),
        (col("cnt") * coalesce(col("logp_micro"), col("unseen_micro"))).as("t"))
      .groupBy(col(idCol), col("label")).agg(sum("t").as("t"))
    val scored = docs.select(col(idCol))
      .crossJoin(broadcast(model.classes.select("label", "logprior_micro")))
      .join(perFeat, Seq(idCol, "label"), "left")
      .na.fill(0L, Seq("t"))
      .select(col(idCol), col("label"),
        (col("logprior_micro") + col("t")).as("score_micro"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score_micro").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("pred"), col("score_micro"))
  }
}
