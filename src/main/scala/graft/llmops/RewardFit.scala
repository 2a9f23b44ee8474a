package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry reward-model fitting over preference pairs — the
  * analytics closing the post-training preference loop: [[Corpus
  * .preferencePairs]] / [[Corpus.bestOfN]] assemble (winner, loser)
  * judgments; this estimates a per-item STRENGTH from them (the
  * Bradley–Terry model: P(i beats j) = w_i / (w_i + w_j)), the classic
  * fit behind reward-model leaderboards and Elo-style data valuation.
  *
  * Algorithm: Hunter's MM iteration (Hunter 2004, "MM algorithms for
  * generalized Bradley–Terry models") —
  *
  *   w_i ← W_i / Σ_{j played i} n_ij / (w_i + w_j)
  *
  * with W_i the win count and n_ij the games between i and j. Each MM
  * round is monotone in likelihood; a FIXED `iterations` count (not a
  * convergence test) keeps the plan static and the oracle replayable.
  *
  * Arithmetic is the quantize-then-decide discipline ([[Unigram]]'s
  * micro-nll, [[WordPiece]]'s scaled score key): strengths live on a
  * 1e-6 grid (`strength_micro`, init 1.0 = 10⁶), every division is a
  * DECIMAL(38,0) integral `div` (≡ DuckDB hugeint `//` on positive
  * operands), every sum is an integer sum — order-invariant, so the
  * DuckDB oracle replays each round value-for-value. A winner's updated
  * strength clamps to ≥ 1 micro (floor-to-zero would erase a positive
  * win record at extreme denominators); never-winners go to 0 after
  * round one, exactly where the true MM limit sends them. Strengths are
  * UNNORMALIZED (BT is identifiable up to scale; ranks and win-odds
  * ratios are what downstream reads — stated, not hidden).
  *
  * Scale: `games` is one groupBy over the pair stream; each round is
  * two keyed equi-joins of the directed-adjacency table against the
  * item-strength table plus one keyed sum — pair-cardinality shuffles,
  * no window, no driver state; rounds localCheckpoint so the plan stays
  * flat. Division by zero cannot occur: a played pair's two endpoints
  * cannot both be never-winners (one of them won their shared game).
  */
object RewardFit {

  /** Fit strengths; returns (item, wins, n_games, strength_micro).
    * `pairs` has one row per judgment: `winnerCol` beat `loserCol`
    * (compose directly with preferencePairs' chosen_id/rejected_id).
    * Self-pairs (winner = loser) are degenerate and fail loudly.
    */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    Corpus.requireNumericKey(pairs, winnerCol, "RewardFit.bradleyTerry")
    Corpus.requireNumericKey(pairs, loserCol, "RewardFit.bradleyTerry")
    val g = pairs.select(col(winnerCol).cast("long").as("win"),
        col(loserCol).cast("long").as("lose"))
      .where(col("win").isNotNull && col("lose").isNotNull)
    require(g.where(col("win") === col("lose")).isEmpty,
      "bradleyTerry: a self-pair (winner = loser) is degenerate — fix the " +
        "pair assembly upstream")
    val wins = g.groupBy(col("win").as("item"))
      .agg(count(lit(1)).as("wins")).localCheckpoint(true)
    val games = g.select(least(col("win"), col("lose")).as("i"),
        greatest(col("win"), col("lose")).as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
    val adj = games.select(col("i").as("x"), col("j").as("y"), col("n"))
      .unionByName(games.select(col("j").as("x"), col("i").as("y"), col("n")))
      .localCheckpoint(true)
    val items = adj.select(col("x").as("item")).distinct()
      .join(wins, Seq("item"), "left")
      .na.fill(0L, Seq("wins"))
      .localCheckpoint(true)
    val nGames = adj.groupBy(col("x").as("item")).agg(sum("n").as("n_games"))
    var w = items.select(col("item"), lit(1000000L).as("w"))
      .localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val denom = adj
        .join(w.select(col("item").as("x"), col("w").as("wx")), Seq("x"))
        .join(w.select(col("item").as("y"), col("w").as("wy")), Seq("y"))
        .select(col("x").as("item"),
          expr("CAST(n AS DECIMAL(38,0)) * 1000000000000 div " +
            "(CAST(wx AS DECIMAL(38,0)) + wy)").as("c"))
        .groupBy("item").agg(sum("c").as("denom"))
      w = items.join(denom, Seq("item"))
        .select(col("item"),
          when(col("wins") === 0L, lit(0L))
            .otherwise(greatest(
              expr("CAST(wins AS DECIMAL(38,0)) * 1000000000000 div denom"),
              lit(1L))).as("w"))
        .localCheckpoint(true)
    }
    items.join(nGames, Seq("item"))
      .join(w, Seq("item"))
      .select(col("item"), col("wins"), col("n_games"),
        col("w").as("strength_micro"))
  }
}
