package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import graft.llmops.WordPiece
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-prep operators added after the round-12 core: the WordPiece
  * tokenizer family (trainer + greedy longest-match serving — the BERT
  * lineage next to [[graft.llmops.Bpe]] and [[graft.llmops.Unigram]]),
  * and downstream model-prep surfaces that build on the corpus tables.
  * Every query carries a full DuckDB value-replay oracle: the WordPiece
  * training rounds unroll to a CTE chain (the `bpeRoundsSql` discipline,
  * with the likelihood-score argmax replayed in exact scaled-integer
  * arithmetic), and the greedy serving loop replays as a list_reduce
  * fold over the same position-classed candidate maps the Spark fold
  * reads.
  */
object ModelPrepQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  /** Merge count for the WordPiece queries — same tractability/remerge
    * balance as the BPE oracles' BpeK.
    */
  private val WpK = 8

  /** Serving word-length cap — [[WordPiece.segment]]'s default
    * maxWordLen (the BERT max_input_chars_per_word rule); the oracle's
    * greedy lambda unrolls its match attempts to this bound.
    */
  private val WpMaxWordLen = 32

  /** MM rounds for the Bradley–Terry oracle — 3 is where the planted
    * tournament's strengths settle on the micro grid (spec-pinned).
    */
  private val BtIters = 3

  /** Hashed feature dim for the Naive Bayes query — the featurizer
    * default, and the Laplace smoothing vocabulary size.
    */
  private val NbDim = 1024

  /** MMR query constants: candidate depth, picks, λ in basis points. */
  private val MmrN = 20
  private val MmrK = 5
  private val MmrLam = 7000

  /** IVF probe width for the production-lane MMR query (nlist = 16 via
    * the deterministic vec_id < 16 centroid rule the ANN oracles share).
    */
  private val MmrProbe = 4

  /** The Bradley–Terry MM-round CTE chain, shared by the standalone fit
    * and the composed preference pipeline: assumes a CTE `pr(win, lose)`
    * exists; emits wins/games/adjacency/items, w0 = 1e6, and the
    * unrolled rounds through w{BtIters}.
    */
  private def btChainSql: String = {
    val rounds = (0 until BtIters).map { r =>
      s"d$r AS (SELECT adj.x AS item, sum(CAST(n AS HUGEINT) * 1000000000000 // (wx.w + wy.w)) AS denom " +
        s"FROM adj JOIN w$r wx ON wx.item = adj.x JOIN w$r wy ON wy.item = adj.y GROUP BY 1), " +
        s"w${r + 1} AS MATERIALIZED (SELECT it.item, CASE WHEN it.wins = 0 THEN CAST(0 AS HUGEINT) " +
        s"ELSE greatest(CAST(it.wins AS HUGEINT) * 1000000000000 // d.denom, 1) END AS w " +
        s"FROM items it JOIN d$r d ON d.item = it.item)"
    }.mkString(", ")
    "wn AS MATERIALIZED (SELECT win AS item, CAST(count(*) AS BIGINT) AS n_wins FROM pr GROUP BY 1), " +
      "games AS (SELECT least(win, lose) AS i, greatest(win, lose) AS j, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2), " +
      "adj AS MATERIALIZED (SELECT i AS x, j AS y, n FROM games UNION ALL SELECT j AS x, i AS y, n FROM games), " +
      "items AS MATERIALIZED (SELECT item, coalesce(n_wins, 0) AS wins FROM (SELECT DISTINCT x AS item FROM adj) ii LEFT JOIN wn USING (item)), " +
      "ng AS (SELECT x AS item, CAST(sum(n) AS BIGINT) AS n_games FROM adj GROUP BY 1), " +
      "w0 AS MATERIALIZED (SELECT item, CAST(1000000 AS HUGEINT) AS w FROM items), " +
      rounds

  }

  private def btFinalSql: String =
    "SELECT it.item, it.wins, ng.n_games, CAST(wf.w AS BIGINT) AS strength_micro " +
      s"FROM items it JOIN ng ON ng.item = it.item JOIN w$BtIters wf ON wf.item = it.item ORDER BY it.item"

  /** Shared MMR-oracle fragments: the per-vector norm fold, and the
    * greedy selection chain over an upstream `cand(qid, doc, rel)` CTE +
    * `en(vec_id, embedding, nrm)` — set-based unrolled steps, NOT nested
    * lambdas (DuckDB 1.0 corrupts accumulators when list_reduce nests:
    * struct accumulators return nondeterministic results — reproduced, 4
    * distinct outputs in 4 runs — and list accumulators misread inside a
    * 3-deep nest); only SINGLE-LEVEL folds (norms, dots) stay lambdas,
    * the class every float-fold oracle already uses.
    */
  private val mmrNrmSql =
    "sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))"

  private def mmrGreedySql: String = {
    val dotAB = "list_reduce(list_transform(generate_series(1, len(a.vec)), p -> CAST(a.vec[p] AS DOUBLE) * CAST(b.vec[p] AS DOUBLE)), (aa, bb) -> aa + bb)"
    val steps = (1 to MmrK).map { r =>
      s"st$r AS (SELECT c.qid, c.doc, c.rel, coalesce(mx.m, 0) AS maxsim FROM cv c " +
        s"LEFT JOIN (SELECT s.qid AS mq, sims.da AS md, max(sims.sim) AS m FROM sel${r - 1} s " +
        "JOIN sims ON sims.qid = s.qid AND sims.db = s.doc GROUP BY 1, 2) mx " +
        "ON mx.mq = c.qid AND mx.md = c.doc " +
        s"WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s2 WHERE s2.qid = c.qid AND s2.doc = c.doc)), " +
        s"pk$r AS (SELECT qid, doc FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY $MmrLam * rel - ${10000 - MmrLam} * maxsim DESC, doc) AS rn FROM st$r) z$r WHERE rn = 1), " +
        s"sel$r AS MATERIALIZED (SELECT qid, doc, rnk FROM sel${r - 1} UNION ALL SELECT qid, doc, $r AS rnk FROM pk$r)"
    }.mkString(", ")
    "cv AS MATERIALIZED (SELECT cand.qid, cand.doc, cand.rel, en.embedding AS vec, en.nrm FROM cand JOIN en ON en.vec_id = cand.doc), " +
      "sims AS MATERIALIZED (SELECT a.qid, a.doc AS da, b.doc AS db, " +
      s"CASE WHEN a.nrm * b.nrm = 0 THEN CAST(0 AS BIGINT) ELSE CAST(round($dotAB / (a.nrm * b.nrm) * 1000000) AS BIGINT) END AS sim " +
      "FROM cv a JOIN cv b ON a.qid = b.qid AND a.doc <> b.doc), " +
      "sel0 AS (SELECT qid, doc, 0 AS rnk FROM cv WHERE false), " +
      steps + " " +
      s"SELECT s.qid, CAST(s.rnk AS BIGINT) AS mmr_rank, s.doc, cv.rel AS rel_micro " +
      s"FROM sel$MmrK s JOIN cv ON cv.qid = s.qid AND cv.doc = s.doc " +
      "ORDER BY s.qid, mmr_rank"
  }

  /** DuckDB replay of LmArtifact.arpaTable3: the bigram chain (verbatim
    * the q_x_arpa_lm fragments — counts, context totals, D = 0.75
    * discounting, micro-grid log10; DuckDB `log` IS log10) extended one
    * order: trigram counts, per-(w1,w2) context bookkeeping with the
    * single-denominator Σ_seen P(w3|w2) rational, and the bigram-row
    * backoff weights.
    */
  private def arpa3ChainSql(srcFilter: String): String =
    s"WITH t AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents $srcFilter), " +
      "cu AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(cu) AS BIGINT) AS tt, count(*) AS vd FROM cu), " +
      "up AS MATERIALIZED (SELECT u.w, u.cu, CAST(-floor(log((u.cu + 1) / CAST(tot.tt + tot.vd + 1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll " +
      "FROM (SELECT w, cu FROM cu UNION ALL SELECT '<unk>', CAST(0 AS BIGINT)) u CROSS JOIN tot), " +
      "gr AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i) WHERE len(toks) >= 2), " +
      "cb AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM gr GROUP BY 1, 2), " +
      "ctx AS MATERIALIZED (SELECT cb.w1, CAST(count(*) AS BIGINT) AS n1p, CAST(sum(cb.cb) AS BIGINT) AS c1, CAST(sum(cu2.cu + 1) AS BIGINT) AS seen_num " +
      "FROM cb JOIN cu cu2 ON cb.w2 = cu2.w GROUP BY 1), " +
      "bows AS (SELECT ctx.w1, CAST(floor(log((CAST(0.75 AS DOUBLE) * ctx.n1p / CAST(ctx.c1 AS DOUBLE)) / " +
      "(1 - ctx.seen_num / CAST(tot.tt + tot.vd + 1 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS bow FROM ctx CROSS JOIN tot), " +
      "bm AS MATERIALIZED (SELECT cb.w1, cb.w2, CAST(-floor(log((cb.cb - CAST(0.75 AS DOUBLE)) / CAST(ctx.c1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll " +
      "FROM cb JOIN ctx ON cb.w1 = ctx.w1), " +
      "tg AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3 FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i) WHERE len(toks) >= 3), " +
      "ct AS MATERIALIZED (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS ct FROM tg GROUP BY 1, 2, 3), " +
      "ctx2 AS MATERIALIZED (SELECT ct.w1, ct.w2, CAST(count(*) AS BIGINT) AS n1p3, CAST(sum(ct.ct) AS BIGINT) AS c12, CAST(sum(cb23.cb) AS BIGINT) AS sum_cb23 " +
      "FROM ct JOIN cb cb23 ON cb23.w1 = ct.w2 AND cb23.w2 = ct.w3 GROUP BY 1, 2), " +
      "bow2 AS MATERIALIZED (SELECT c2.w1, c2.w2, CAST(floor(log((CAST(0.75 AS DOUBLE) * c2.n1p3 / CAST(c2.c12 AS DOUBLE)) / " +
      "(1 - (c2.sum_cb23 - CAST(0.75 AS DOUBLE) * c2.n1p3) / CAST(cx.c1 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS bow2 " +
      "FROM ctx2 c2 JOIN ctx cx ON cx.w1 = c2.w2), " +
      "tm AS MATERIALIZED (SELECT ct.w1, ct.w2, ct.w3, CAST(-floor(log((ct.ct - CAST(0.75 AS DOUBLE)) / CAST(c2.c12 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll " +
      "FROM ct JOIN ctx2 c2 ON c2.w1 = ct.w1 AND c2.w2 = ct.w2)"

  /** DuckDB replay of LmArtifact.arpaTable3Kn: the Kneser–Ney chain —
    * bigram-type/continuation counts, the continuation-smoothed
    * unigrams, KN bigram probabilities over distinct-left-context
    * counts, the two discount-mass bow rationals, and the
    * backoff-consistent context-only bigram rows (integer micro
    * subtraction, exactly the Spark side's arithmetic).
    */
  private def arpa3KnChainSql(srcFilter: String): String =
    s"WITH t AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents $srcFilter), " +
      "cu AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1), " +
      "gr AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i) WHERE len(toks) >= 2), " +
      "cb AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM gr GROUP BY 1, 2), " +
      "nbv AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM cb) AS nb, (SELECT CAST(count(*) AS BIGINT) FROM cu) AS vd), " +
      "uc AS MATERIALIZED (SELECT w2 AS w, CAST(count(*) AS BIGINT) AS nc FROM cb GROUP BY 1), " +
      "up AS MATERIALIZED (SELECT u.w, coalesce(uc.nc, 0) AS nc, " +
      "CAST(-floor(log((coalesce(uc.nc, 0) + 1) / CAST(nbv.nb + nbv.vd + 1 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll " +
      "FROM (SELECT w FROM cu UNION ALL SELECT '<unk>') u LEFT JOIN uc ON u.w = uc.w CROSS JOIN nbv), " +
      "tg AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3 FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i) WHERE len(toks) >= 3), " +
      "ct AS MATERIALIZED (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS ct FROM tg GROUP BY 1, 2, 3), " +
      "ckn AS MATERIALIZED (SELECT w2 AS a, w3 AS b, CAST(count(*) AS BIGINT) AS cknb FROM ct GROUP BY 1, 2), " +
      "ckn2 AS MATERIALIZED (SELECT a, CAST(count(*) AS BIGINT) AS n1pk, CAST(sum(cknb) AS BIGINT) AS ckntot FROM ckn GROUP BY 1), " +
      "bows AS MATERIALIZED (SELECT ckn.a AS w, CAST(floor(log((CAST(0.75 AS DOUBLE) * c2.n1pk / CAST(c2.ckntot AS DOUBLE)) / " +
      "(1 - CAST(sum(coalesce(uc.nc, 0) + 1) AS DOUBLE) / (nbv.nb + nbv.vd + 1))) * 1000000 + 0.5) AS BIGINT) AS bow " +
      "FROM ckn JOIN ckn2 c2 USING (a) LEFT JOIN uc ON ckn.b = uc.w CROSS JOIN nbv " +
      "GROUP BY ckn.a, c2.n1pk, c2.ckntot, nbv.nb, nbv.vd), " +
      "ctx3 AS MATERIALIZED (SELECT ct.w1, ct.w2, CAST(count(*) AS BIGINT) AS n1p3, CAST(sum(ct.ct) AS BIGINT) AS c12, CAST(sum(k.cknb) AS BIGINT) AS sum_ckn " +
      "FROM ct JOIN ckn k ON k.a = ct.w2 AND k.b = ct.w3 GROUP BY 1, 2), " +
      "bow2 AS MATERIALIZED (SELECT c3.w1 AS a, c3.w2 AS b, CAST(floor(log((CAST(0.75 AS DOUBLE) * c3.n1p3 / CAST(c3.c12 AS DOUBLE)) / " +
      "(1 - (c3.sum_ckn - CAST(0.75 AS DOUBLE) * c3.n1p3) / CAST(c2.ckntot AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS bow2 " +
      "FROM ctx3 c3 JOIN ckn2 c2 ON c2.a = c3.w2), " +
      "knp AS MATERIALIZED (SELECT ckn.a, ckn.b, CAST(-floor(log((ckn.cknb - CAST(0.75 AS DOUBLE)) / CAST(c2.ckntot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS kn_nll " +
      "FROM ckn JOIN ckn2 c2 USING (a)), " +
      "bi AS MATERIALIZED (SELECT coalesce(knp.a, bow2.a) AS a, coalesce(knp.b, bow2.b) AS b, " +
      "coalesce(knp.kn_nll, upb.nll - coalesce(bwa.bow, 0)) AS nll, coalesce(bow2.bow2, 0) AS bow " +
      "FROM knp FULL JOIN bow2 ON knp.a = bow2.a AND knp.b = bow2.b " +
      "JOIN up upb ON upb.w = coalesce(knp.b, bow2.b) " +
      "LEFT JOIN bows bwa ON bwa.w = coalesce(knp.a, bow2.a)), " +
      "tm AS MATERIALIZED (SELECT ct.w1, ct.w2, ct.w3, CAST(-floor(log((ct.ct - CAST(0.75 AS DOUBLE)) / CAST(c3.c12 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll " +
      "FROM ct JOIN ctx3 c3 ON c3.w1 = ct.w1 AND c3.w2 = ct.w2)"

  /** DuckDB replay of [[WordPiece.learnMerges]]: `##`-marked
    * symbolization, per-round likelihood argmax
    * (`pf · 10^15 // (freq(l) · freq(r))` in hugeint — exactly Spark's
    * DECIMAL(38,0) `div`; ties pf DESC, lhs, rhs), then the shared
    * island-parity greedy rewrite with the marker-stripped merge product.
    * Returns the CTE chain WITHOUT the leading WITH so callers can
    * prefix `WITH` or `WITH RECURSIVE`.
    */
  private def wpRoundsSql(k: Int): String = {
    // s$j and sf$j are each referenced twice per round (and b$j up to
    // three times by the callers) — MATERIALIZED stops DuckDB's CTE
    // inlining from doubling the scan tree per round (4^k scans of the
    // base table otherwise: an fd-exhaustion, not just a slowdown).
    val base =
      "v AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM documents) GROUP BY 1), " +
        "s0p AS (SELECT word, freq, unnest(generate_series(1, length(word))) AS i FROM v), " +
        "s0 AS MATERIALIZED (SELECT word, freq, CAST(i AS BIGINT) AS i, CASE WHEN i = 1 THEN substr(word, i, 1) ELSE '##' || substr(word, i, 1) END AS s FROM s0p), "
    val rounds = (0 until k).map { j =>
      s"p$j AS MATERIALIZED (SELECT word, freq, i, s, lead(s) OVER (PARTITION BY word ORDER BY i) AS s2 FROM s$j), " +
        s"sf$j AS MATERIALIZED (SELECT s, CAST(sum(freq) AS BIGINT) AS f FROM s$j GROUP BY 1), " +
        s"pc$j AS (SELECT s AS lhs, s2 AS rhs, CAST(sum(freq) AS BIGINT) AS pf FROM p$j WHERE s2 IS NOT NULL GROUP BY 1, 2), " +
        s"b$j AS MATERIALIZED (SELECT pc.lhs, pc.rhs, pc.pf, fl.f AS fl, fr.f AS fr, " +
        "CAST(CAST(pc.pf AS HUGEINT) * 1000000000000000 // (CAST(fl.f AS HUGEINT) * fr.f) AS BIGINT) AS score, " +
        "pc.lhs || CASE WHEN pc.rhs LIKE '##%' THEN substr(pc.rhs, 3) ELSE pc.rhs END AS ms " +
        s"FROM pc$j pc JOIN sf$j fl ON fl.s = pc.lhs JOIN sf$j fr ON fr.s = pc.rhs " +
        "ORDER BY score DESC, pf DESC, lhs, rhs LIMIT 1), " +
        s"c$j AS (SELECT p.word, p.freq, p.i, p.s, (p.s2 IS NOT NULL AND p.s = b.lhs AND p.s2 = b.rhs) AS cand, b.ms FROM p$j p CROSS JOIN b$j b), " +
        s"d$j AS (SELECT *, CASE WHEN cand THEN i - sum(CASE WHEN cand THEN 1 ELSE 0 END) OVER (PARTITION BY word ORDER BY i ROWS UNBOUNDED PRECEDING) END AS isl FROM c$j), " +
        s"e$j AS (SELECT *, cand AND ((i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0) AS keep FROM d$j), " +
        s"f$j AS (SELECT *, coalesce(lag(keep) OVER (PARTITION BY word ORDER BY i), false) AS dropped FROM e$j), " +
        s"s${j + 1} AS MATERIALIZED (SELECT word, freq, CAST(row_number() OVER (PARTITION BY word ORDER BY i) AS BIGINT) AS i, CASE WHEN keep THEN ms ELSE s END AS s FROM f$j WHERE NOT dropped)"
    }.mkString(", ")
    base + rounds
  }

  /** The trained piece set as SQL: training alphabet ∪ merge products
    * (dedup'd) with position-class decomposition — `strip` is the piece
    * without its `##` marker, `cont` whether it carries one.
    */
  private def wpVocabSql(k: Int): String =
    "alpha AS (SELECT DISTINCT s AS piece FROM s0), " +
      "mrgp AS (" + (0 until k).map(j => s"SELECT ms AS piece FROM b$j").mkString(" UNION ALL ") + "), " +
      "vp AS (SELECT DISTINCT piece FROM (SELECT piece FROM alpha UNION ALL SELECT piece FROM mrgp)), " +
      "vt AS MATERIALIZED (SELECT piece, CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS strip, (piece LIKE '##%') AS cont FROM vp)"

  /** The greedy longest-match step as a DuckDB lambda (the unigram
    * oracle's list_reduce idiom — a correlated longest-match subquery
    * inside a recursive CTE silently decorrelates to NULL in DuckDB 1.0,
    * so the walk folds instead). Accumulator is a VARCHAR list
    * `[pos, unkFlag, piece...]`; each step tries k = maxK..1 against the
    * per-word candidate map `m` (keys `"0:"/"1:" + substring` — initial /
    * continuation position class, exactly the Spark fold's vkeys) and
    * either advances the cursor, or collapses the word to [UNK].
    */
  private def wpGreedyLambda(maxK: Int): String = {
    val pos = "CAST(a[1] AS BIGINT)"
    def sub(k: Int) = s"substr(w, CAST($pos AS INT), $k)"
    def key(k: Int) = s"((CASE WHEN $pos = 1 THEN '0:' ELSE '1:' END) || ${sub(k)})"
    def piece(k: Int) = s"(CASE WHEN $pos = 1 THEN ${sub(k)} ELSE '##' || ${sub(k)} END)"
    val branches = (maxK to 1 by -1).map { k =>
      s"WHEN $pos + ${k - 1} <= n AND m[${key(k)}][1] IS NOT NULL THEN " +
        s"list_concat([CAST($pos + $k AS VARCHAR), '0'], list_append(a[3:], ${piece(k)}))"
    }.mkString(" ")
    s"CASE WHEN a[2] = '1' OR $pos > n THEN a ELSE CASE $branches " +
      "ELSE [CAST(n + 1 AS VARCHAR), '1', '[UNK]'] END END"
  }

  val queries: Seq[OracleQuery] = Seq(

    // WordPiece trainer: the K-round likelihood-argmax loop replayed in
    // DuckDB — pair freq, both symbol freqs AND the scaled-integer
    // selection key all value-exact, so the oracle pins the DECISION
    // arithmetic, not just the winning pair.
    q("q_x_wordpiece_merges", {
      "WITH " + wpRoundsSql(WpK) + " " +
        (0 until WpK).map(j =>
          s"SELECT CAST(${j + 1} AS BIGINT) AS mrank, lhs, rhs, pf AS pair_freq, " +
            s"fl AS left_freq, fr AS right_freq, score FROM b$j")
          .mkString(" UNION ALL ") +
        " ORDER BY mrank"
    }) { (s, d) =>
      val vocab = WordPiece.wordVocab(Tables.documents(s, d), "text")
      val (merges, _) = WordPiece.learnMerges(vocab, WpK)
      WordPiece.mergeTable(s, merges).orderBy("mrank")
    },

    // WordPiece serving: greedy longest-match-first segmentation with the
    // trained vocabulary, replayed in DuckDB as a per-word list_reduce
    // fold over the same "0:/1:"-keyed candidate map the Spark fold
    // reads — the oracle walks the exact same greedy chain, value-exact.
    // A cursor with no match (or a word over maxWordLen) collapses the
    // word to [UNK]; the synthetic corpus' words are short and fully
    // covered by the trained alphabet, so the UNK and length paths are
    // pinned by WordPieceSpec on planted data instead.
    q("q_x_wordpiece_segment", {
      "WITH " + wpRoundsSql(WpK) + ", " + wpVocabSql(WpK) + ", " +
        "vk AS MATERIALIZED (SELECT DISTINCT (CASE WHEN cont THEN '1:' ELSE '0:' END) || strip AS vkey FROM vt), " +
        "dw AS MATERIALIZED (SELECT doc_id, CAST(i - 1 AS BIGINT) AS widx, toks[i] AS word FROM " +
        "(SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents WHERE doc_id < 40), " +
        "unnest(generate_series(1, len(toks))) u(i)), " +
        "wds AS MATERIALIZED (SELECT DISTINCT word AS w, CAST(length(word) AS BIGINT) AS n FROM dw WHERE length(word) >= 1), " +
        "subs1 AS (SELECT w, n, unnest(generate_series(1, CAST(n AS INT))) AS p FROM wds), " +
        "dsubs AS (SELECT DISTINCT w, (CASE WHEN p = 1 THEN '0:' ELSE '1:' END) || substr(w, CAST(p AS INT), CAST(k AS INT)) AS vkey FROM " +
        s"(SELECT w, p, unnest(generate_series(1, CAST(least($WpMaxWordLen, n - p + 1) AS INT))) AS k FROM subs1)), " +
        "cand AS (SELECT dsubs.w, dsubs.vkey FROM dsubs JOIN vk USING (vkey)), " +
        "wm AS MATERIALIZED (SELECT w, map_from_entries(list(struct_pack(k := vkey, v := true))) AS m FROM cand GROUP BY w), " +
        s"seg AS MATERIALIZED (SELECT w, CASE WHEN n > $WpMaxWordLen THEN ['[UNK]'] ELSE " +
        s"list_reduce(list_prepend(['1', '0'], list_transform(generate_series(1, CAST(least(n, $WpMaxWordLen) AS INT)), i -> [CAST(i AS VARCHAR)])), " +
        s"(a, b) -> ${wpGreedyLambda(WpMaxWordLen)})[3:] END AS ps " +
        "FROM (SELECT wo.w, wo.n, wm.m FROM wds wo LEFT JOIN wm ON wm.w = wo.w) qq) " +
        "SELECT dw.doc_id AS id, dw.widx AS word_idx, CAST(j - 1 AS BIGINT) AS piece_idx, seg.ps[j] AS piece " +
        "FROM dw JOIN seg ON seg.w = dw.word, unnest(generate_series(1, len(seg.ps))) v2(j) " +
        "ORDER BY id, word_idx, piece_idx"
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val vocab = WordPiece.wordVocab(docs, "text").localCheckpoint(true)
      val (merges, _) = WordPiece.learnMerges(vocab, WpK)
      WordPiece.segment(docs.filter(col("doc_id") < 40), "doc_id", "text",
          WordPiece.vocabTable(vocab, merges))
        .orderBy("id", "word_idx", "piece_idx")
    },

    // the WordPiece artifact table — the (piece, id) mapping vocab.txt
    // serializes: training alphabet (distinct marked symbols, sorted) at
    // ids 0.., then merge products in rank order with first-occurrence
    // dedup. The oracle replays training AND the id assignment.
    q("q_x_wordpiece_artifact", {
      "WITH " + wpRoundsSql(WpK) + ", " +
        "alpha AS (SELECT s AS piece, CAST(row_number() OVER (ORDER BY s) - 1 AS BIGINT) AS id FROM (SELECT DISTINCT s FROM s0)), " +
        "mrg AS (" + (0 until WpK).map(j => s"SELECT $j AS r, ms AS piece FROM b$j").mkString(" UNION ALL ") + "), " +
        "mrg2 AS (SELECT piece, min(r) AS r FROM mrg WHERE piece NOT IN (SELECT piece FROM alpha) GROUP BY piece), " +
        "mids AS (SELECT piece, (SELECT count(*) FROM alpha) + CAST(row_number() OVER (ORDER BY r) - 1 AS BIGINT) AS id FROM mrg2) " +
        "SELECT piece, CAST(id AS BIGINT) AS id FROM (SELECT piece, id FROM alpha UNION ALL SELECT piece, id FROM mids) ORDER BY id"
    }) { (s, d) =>
      val vocab = WordPiece.wordVocab(Tables.documents(s, d), "text")
        .localCheckpoint(true)
      val (merges, _) = WordPiece.learnMerges(vocab, WpK)
      WordPiece.vocabTable(vocab, merges).orderBy("id")
    },

    // safetensors embedding hand-off, end to end: write the embeddings
    // table to deterministic safetensors shards, read every vector back
    // through the structural verifier, and aggregate a position-weighted
    // micro-integer checksum the oracle recomputes from the SOURCE table
    // — ids, dimensions, every float32 value (on the exact 1e-6 grid;
    // double-exact for |e| < ~4000) and the shard count all pin the
    // round trip (the q_x_token_bin_interop discipline).
    q("q_x_safetensors_interop",
      "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(max(len(embedding)) AS BIGINT) AS dim, " +
        "CAST(sum(vec_id) AS BIGINT) AS id_sum, " +
        "CAST(sum(chk) AS BIGINT) AS vec_checksum, " +
        "CAST(4 AS BIGINT) AS n_shards FROM " +
        "(SELECT vec_id, embedding, list_sum(list_transform(generate_series(1, len(embedding)), " +
        "j -> CAST(round(CAST(embedding[j] AS DOUBLE) * 1000000) AS BIGINT) * j)) AS chk " +
        "FROM embeddings)") { (s, d) =>
      import graft.ingest.SafeTensors
      val path = java.nio.file.Files
        .createTempDirectory("graft_safetensors_interop").toString
      val out = new org.apache.hadoop.fs.Path(path)
      out.getFileSystem(s.sparkContext.hadoopConfiguration).delete(out, true)
      SafeTensors.writeVectors(Tables.embeddings(s, d), "vec_id", "embedding",
        path, shards = 4)
      val back = SafeTensors.readVectors(s, path)
      require(back.where(!col("ok")).isEmpty,
        "self-written safetensors shards must parse cleanly")
      back.select(col("path"), col("vec_id"),
          size(col("embedding")).cast("long").as("__d"),
          aggregate(sequence(lit(1), size(col("embedding"))), lit(0L),
            (a, j) => a + round(element_at(col("embedding"), j)
              .cast("double") * 1e6).cast("long") * j.cast("long")).as("__chk"))
        .agg(count(lit(1)).as("n_rows"), max("__d").as("dim"),
          sum("vec_id").as("id_sum"), sum("__chk").as("vec_checksum"),
          countDistinct("path").as("n_shards"))
    },

    // Bradley-Terry reward fit: a deterministic 20-item tournament
    // synthesized from doc_id arithmetic (both engines derive the same
    // pair stream), then 3 Hunter-MM rounds on the 1e-6 strength grid.
    // The oracle unrolls every round — each per-opponent term is one
    // hugeint // (Spark DECIMAL div), each denominator an integer sum —
    // so all three updates are replayed value-for-value, not just the
    // final ranking.
    q("q_x_reward_fit", {
      "WITH g AS (SELECT doc_id % 20 AS a, (doc_id // 20) % 20 AS b, doc_id % 3 AS r " +
        "FROM documents WHERE doc_id % 20 != (doc_id // 20) % 20), " +
        "pr AS (SELECT CASE WHEN r = 0 THEN b ELSE a END AS win, CASE WHEN r = 0 THEN a ELSE b END AS lose FROM g), " +
        btChainSql + " " + btFinalSql
    }) { (s, d) =>
      import graft.llmops.RewardFit
      val pairs = Tables.documents(s, d)
        .select((col("doc_id") % 20).as("a"),
          expr("(doc_id div 20) % 20").as("b"),
          (col("doc_id") % 3).as("r"))
        .where(col("a") =!= col("b"))
        .select(when(col("r") === 0, col("b")).otherwise(col("a")).as("winner"),
          when(col("r") === 0, col("a")).otherwise(col("b")).as("loser"))
      RewardFit.bradleyTerry(pairs, "winner", "loser", iterations = BtIters)
        .orderBy("item")
    },

    // MMR diversified re-ranking: exact-cosine top-20 candidates per
    // query (the double-fold scoring both engines share), then 5 greedy
    // MMR steps at λ=0.7. The oracle replays the WHOLE greedy walk —
    // per-query candidate arrays, pairwise cosine on the 1e-6 grid, the
    // max-sim-over-selected inner fold and the strict-> argmax with its
    // ascending-scan smallest-doc ties — as nested DuckDB list lambdas,
    // value-exact (the wordpiece/unigram fold-replay discipline).
    q("q_x_mmr_rerank", {
      val dotQD = "list_reduce(list_transform(generate_series(1, len(q.embedding)), p -> CAST(q.embedding[p] AS DOUBLE) * CAST(d.embedding[p] AS DOUBLE)), (a, b) -> a + b)"
      s"WITH en AS MATERIALIZED (SELECT vec_id, embedding, $mmrNrmSql AS nrm FROM embeddings), " +
        "sc AS (SELECT q.vec_id AS qid, d.vec_id AS doc, " +
        s"CASE WHEN q.nrm * d.nrm = 0 THEN CAST(0 AS BIGINT) ELSE CAST(round($dotQD / (q.nrm * d.nrm) * 1000000) AS BIGINT) END AS rel " +
        "FROM en q JOIN en d ON d.vec_id <> q.vec_id WHERE q.vec_id % 50 = 0), " +
        s"cand AS MATERIALIZED (SELECT qid, doc, rel FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc) AS rn FROM sc) rr WHERE rn <= $MmrN), " +
        mmrGreedySql
    }) { (s, d) =>
      import graft.llmops.Retrieval
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      def nrm(c: org.apache.spark.sql.Column) =
        sqrt(aggregate(c, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
      val en = emb.select(col("vec_id"), col("embedding"),
        nrm(col("embedding")).as("nrm")).localCheckpoint(true)
      val q0 = en.select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("nrm").as("qn")).filter(col("qid") % 50 === 0)
      val dot = aggregate(zip_with(col("qv"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)
      val scored = en.join(broadcast(q0), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("doc"),
          when(col("qn") * col("nrm") === 0.0, lit(0L))
            .otherwise(round(dot / (col("qn") * col("nrm")) * 1e6).cast("long"))
            .as("rel_micro"))
      val w = Window.partitionBy("qid")
        .orderBy(col("rel_micro").desc, col("doc").asc)
      val cand = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= MmrN).drop("rn")
      Retrieval.mmrTopK(cand, emb, "vec_id", "embedding",
          k = MmrK, lambdaBps = MmrLam)
        .orderBy("qid", "mmr_rank")
    },

    // MMR over IVF candidates — the PRODUCTION lane of q_x_mmr_rerank
    // (whose exact-cosine candidate stage is the oracle-baseline class
    // that pays queries x corpus): candidates come only from the
    // query's nprobe=4 nearest cells (centroids = vec_id < 16, the
    // deterministic rule the ANN oracles share), then the same greedy
    // MMR chain re-ranks. Cell comparisons are RAW double cosines from
    // the shared sequential folds — identical on both engines, so cell
    // assignment, probes, candidate set and the whole walk replay
    // value-exact.
    q("q_x_mmr_ivf", {
      val dotVC = "list_reduce(list_transform(generate_series(1, len(v.embedding)), p -> CAST(v.embedding[p] AS DOUBLE) * CAST(c.embedding[p] AS DOUBLE)), (a, b) -> a + b)"
      val dotQD = "list_reduce(list_transform(generate_series(1, len(q.embedding)), p -> CAST(q.embedding[p] AS DOUBLE) * CAST(d.embedding[p] AS DOUBLE)), (a, b) -> a + b)"
      s"WITH en AS MATERIALIZED (SELECT vec_id, embedding, $mmrNrmSql AS nrm FROM embeddings), " +
        "cs AS (SELECT v.vec_id, c.vec_id AS cent_id, " +
        s"CASE WHEN v.nrm * c.nrm = 0 THEN -2.0 ELSE $dotVC / (v.nrm * c.nrm) END AS ccos " +
        "FROM en v JOIN en c ON c.vec_id < 16), " +
        "rkd AS MATERIALIZED (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM cs), " +
        "assign AS MATERIALIZED (SELECT vec_id AS cid, cent_id AS cell FROM rkd WHERE rn = 1), " +
        s"probes AS (SELECT vec_id AS qid, cent_id AS cell FROM rkd WHERE rn <= $MmrProbe AND vec_id % 50 = 0), " +
        "cd AS (SELECT p.qid, a.cid AS doc FROM probes p JOIN assign a USING (cell) WHERE a.cid <> p.qid), " +
        "sc AS (SELECT cd.qid, cd.doc, " +
        s"CASE WHEN q.nrm * d.nrm = 0 THEN CAST(0 AS BIGINT) ELSE CAST(round($dotQD / (q.nrm * d.nrm) * 1000000) AS BIGINT) END AS rel " +
        "FROM cd JOIN en q ON q.vec_id = cd.qid JOIN en d ON d.vec_id = cd.doc), " +
        s"cand AS MATERIALIZED (SELECT qid, doc, rel FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc) AS rn FROM sc) rr WHERE rn <= $MmrN), " +
        mmrGreedySql
    }) { (s, d) =>
      import graft.llmops.Retrieval
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      def nrmOf(c: org.apache.spark.sql.Column) =
        sqrt(aggregate(c, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
      val en = emb.select(col("vec_id"), col("embedding"),
        nrmOf(col("embedding")).as("nrm")).localCheckpoint(true)
      val cents = en.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"),
          col("nrm").as("cn"))
      val dotVC = aggregate(zip_with(col("embedding"), col("cv"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)
      val cs = en.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
          when(col("nrm") * col("cn") === 0.0, lit(-2.0))
            .otherwise(dotVC / (col("nrm") * col("cn"))).as("ccos"))
      val wC = Window.partitionBy("vec_id")
        .orderBy(col("ccos").desc, col("cent_id").asc)
      val rkd = cs.withColumn("rn", row_number().over(wC)).localCheckpoint(true)
      val assign = rkd.filter(col("rn") === 1)
        .select(col("vec_id").as("doc"), col("cent_id").as("cell"))
      val probes = rkd.filter(col("rn") <= MmrProbe && col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("cent_id").as("cell"))
      val cd = probes.join(assign, Seq("cell"))
        .filter(col("doc") =!= col("qid")).select("qid", "doc")
      val dotQD = aggregate(zip_with(col("qv"), col("dv"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)
      val sc0 = cd
        .join(en.select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("nrm").as("qn")), Seq("qid"))
        .join(en.select(col("vec_id").as("doc"), col("embedding").as("dv"),
          col("nrm").as("dn")), Seq("doc"))
        .select(col("qid"), col("doc"),
          when(col("qn") * col("dn") === 0.0, lit(0L))
            .otherwise(round(dotQD / (col("qn") * col("dn")) * 1e6).cast("long"))
            .as("rel_micro"))
      val wR = Window.partitionBy("qid")
        .orderBy(col("rel_micro").desc, col("doc").asc)
      val cand = sc0.withColumn("rn", row_number().over(wR))
        .filter(col("rn") <= MmrN).drop("rn")
      Retrieval.mmrTopK(cand, emb, "vec_id", "embedding",
          k = MmrK, lambdaBps = MmrLam)
        .orderBy("qid", "mmr_rank")
    },

    // Multinomial Naive Bayes language-ID: train on the even half's
    // (lang, hashed-feature) counts, score the odd half, report the
    // confusion matrix. The oracle replays the one-pass fit — Laplace
    // micro-log likelihoods, priors, per-class unseen costs (the same
    // round(ln(·)·1e6) grid recipe as the unigram trainer, from exact
    // integer counts) — and the argmax with its smallest-label ties,
    // value-exact.
    q("q_x_naive_bayes_langid", {
      val h = graft.llmops.PortableHash.duckHash52("tok")
      val dim = NbDim
      "WITH nf AS MATERIALIZED (SELECT doc_id, " + h + s" % $dim AS feat, CAST(count(*) AS BIGINT) AS cnt FROM " +
        "(SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok FROM documents) tnf " +
        "WHERE tok <> '' GROUP BY 1, 2), " +
        "l AS MATERIALIZED (SELECT doc_id, lang AS label FROM documents WHERE doc_id % 2 = 0), " +
        "fc AS MATERIALIZED (SELECT l.label, nf.feat, CAST(sum(nf.cnt) AS BIGINT) AS cnt FROM nf JOIN l USING (doc_id) GROUP BY 1, 2), " +
        "bc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs FROM l GROUP BY 1), " +
        "tcc AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS n_tokens FROM fc GROUP BY 1), " +
        "cls AS MATERIALIZED (SELECT bc.label, bc.n_docs, coalesce(tcc.n_tokens, 0) AS n_tokens, " +
        "CAST(round(ln(CAST(bc.n_docs AS DOUBLE) / (SELECT count(*) FROM l)) * 1000000) AS BIGINT) AS logprior, " +
        s"CAST(round(ln(1.0 / (coalesce(tcc.n_tokens, 0) + $dim)) * 1000000) AS BIGINT) AS unseen " +
        "FROM bc LEFT JOIN tcc USING (label)), " +
        s"fm AS MATERIALIZED (SELECT fc.label, fc.feat, CAST(round(ln(CAST(fc.cnt + 1 AS DOUBLE) / (cls.n_tokens + $dim)) * 1000000) AS BIGINT) AS logp " +
        "FROM fc JOIN cls USING (label)), " +
        "fh AS (SELECT * FROM nf WHERE doc_id % 2 = 1), " +
        "pf AS (SELECT fh.doc_id, cls.label, sum(fh.cnt * coalesce(fm.logp, cls.unseen)) AS t " +
        "FROM fh CROSS JOIN cls LEFT JOIN fm ON fm.label = cls.label AND fm.feat = fh.feat GROUP BY 1, 2), " +
        "sc AS (SELECT d.doc_id, cls.label, cls.logprior + coalesce(pf.t, 0) AS score " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d CROSS JOIN cls " +
        "LEFT JOIN pf ON pf.doc_id = d.doc_id AND pf.label = cls.label), " +
        "prd AS (SELECT doc_id, label AS pred FROM (SELECT doc_id, label, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc) rr WHERE rn = 1) " +
        "SELECT dd.lang AS actual, p.pred, CAST(count(*) AS BIGINT) AS n " +
        "FROM prd p JOIN documents dd ON dd.doc_id = p.doc_id GROUP BY 1, 2 ORDER BY 1, 2"
    }) { (s, d) =>
      import graft.llmops.Classify
      val docs = Tables.documents(s, d)
      val feats = Classify.hashedFeatures(docs, "doc_id", "text", dim = NbDim)
        .localCheckpoint(true)
      val labels = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
      val model = Classify.trainNaiveBayes(feats, labels, "doc_id", "lang",
        dim = NbDim)
      val held = docs.filter(col("doc_id") % 2 === 1)
      Classify.scoreNaiveBayes(held,
          feats.join(held.select("doc_id"), Seq("doc_id")), model, "doc_id")
        .join(docs.select(col("doc_id"), col("lang").as("actual")), Seq("doc_id"))
        .groupBy("actual", "pred").agg(count(lit(1)).as("n"))
        .orderBy("actual", "pred")
    },

    // Fellegi-Sunter record linkage: adjacent-doc candidate pairs with
    // three agreement fields (lang / source / length bucket), weights
    // trained on the labeled quarter (planted lang-correlation with 1/17
    // XOR noise), all pairs scored and three-way decided. The oracle
    // replays the m/u estimation (add-1 from exact counts, micro-log
    // grid - the NB ln recipe), both weight forms and the threshold
    // decisions, value-exact.
    q("q_x_record_linkage", {
      val pairsSql =
        "pairs AS MATERIALIZED (SELECT d1.doc_id AS a, d2.doc_id AS b, " +
          "(d1.lang = d2.lang) AS ag_lang, (d1.source = d2.source) AS ag_source, " +
          "(length(d1.text) // 100 = length(d2.text) // 100) AS ag_len " +
          "FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1 " +
          "WHERE d1.doc_id % 2 = 0), " +
          "lab AS MATERIALIZED (SELECT *, (ag_lang != (a % 17 = 0)) AS is_match FROM pairs WHERE a % 4 = 0), "
      def wSql(f: String) =
        s"SELECT '$f' AS field, n_match, n_unmatch, am_$f AS agree_match, au_$f AS agree_unmatch, " +
          s"CAST(round(ln(((am_$f + 1) / CAST(n_match + 2 AS DOUBLE)) / ((au_$f + 1) / CAST(n_unmatch + 2 AS DOUBLE))) * 1000000) AS BIGINT) AS wa, " +
          s"CAST(round(ln((1 - (am_$f + 1) / CAST(n_match + 2 AS DOUBLE)) / (1 - (au_$f + 1) / CAST(n_unmatch + 2 AS DOUBLE))) * 1000000) AS BIGINT) AS wd FROM t0"
      "WITH " + pairsSql +
        "t0 AS MATERIALIZED (SELECT CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match, " +
        "CAST(sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT) AS n_unmatch, " +
        Seq("ag_lang", "ag_source", "ag_len").map(f =>
          s"CAST(sum(CASE WHEN is_match AND $f THEN 1 ELSE 0 END) AS BIGINT) AS am_$f, " +
            s"CAST(sum(CASE WHEN NOT is_match AND $f THEN 1 ELSE 0 END) AS BIGINT) AS au_$f").mkString(", ") +
        " FROM lab), " +
        "wt AS MATERIALIZED (" +
        Seq("ag_lang", "ag_source", "ag_len").map(wSql).mkString(" UNION ALL ") + "), " +
        "sc AS (SELECT p.a, p.b, " +
        Seq("ag_lang", "ag_source", "ag_len").map(f =>
          s"(CASE WHEN p.$f THEN (SELECT wa FROM wt WHERE field = '$f') ELSE (SELECT wd FROM wt WHERE field = '$f') END)")
          .mkString(" + ") + " AS score_micro FROM pairs p) " +
        "SELECT a, b, score_micro, CASE WHEN score_micro >= 500000 THEN 'link' " +
        "WHEN score_micro <= -500000 THEN 'nonlink' ELSE 'possible' END AS decision " +
        "FROM sc ORDER BY a"
    }) { (s, d) =>
      import graft.llmops.FuzzyMatch
      val docs = Tables.documents(s, d)
      val d1 = docs.select(col("doc_id").as("a"), col("lang").as("l1"),
        col("source").as("s1"), length(col("text")).as("n1"))
      val d2 = docs.select((col("doc_id") - 1).as("a"), col("lang").as("l2"),
        col("source").as("s2"), length(col("text")).as("n2"))
      val pairs = d1.filter(col("a") % 2 === 0).join(d2, Seq("a"))
        .select(col("a"), (col("a") + 1).as("b"),
          (col("l1") === col("l2")).as("ag_lang"),
          (col("s1") === col("s2")).as("ag_source"),
          (expr("n1 div 100") === expr("n2 div 100")).as("ag_len"))
        .localCheckpoint(true)
      val labeled = pairs.filter(col("a") % 4 === 0)
        .withColumn("is_match", col("ag_lang") =!= (col("a") % 17 === 0))
      val w = FuzzyMatch.fellegiSunterWeights(labeled, "is_match",
        Seq("ag_lang", "ag_source", "ag_len"))
      FuzzyMatch.fellegiSunterScore(pairs, w,
          Seq("ag_lang", "ag_source", "ag_len"),
          upperMicro = 500000L, lowerMicro = -500000L)
        .select("a", "b", "score_micro", "decision")
        .orderBy("a")
    },

    // The composed preference pipeline (the tokenize_export discipline
    // pointed at post-training): a scored response table flows through
    // preferencePairs' full rule set (rank pairing, strict margin >= 5,
    // rank-cross stop, within-pair Jaccard dedup) and the surviving
    // judgments fit Bradley-Terry response strengths — the new reward
    // fit proven to COMPOSE with the pair assembler it exists for. The
    // oracle replays the entire chain: both rank windows, the
    // integer-bps Jaccard rule, then all 3 MM rounds.
    q("q_x_reward_pipeline", {
      val hSc = graft.llmops.PortableHash.duckHash52(
        "CAST(doc_id AS VARCHAR) || ':sc'")
      def dtoks(c: String) =
        s"list_distinct(list_transform(regexp_split_to_array(trim($c), '\\s+'), x -> lower(x)))"
      s"WITH resp AS MATERIALIZED (SELECT doc_id AS resp_id, doc_id // 4 AS prompt_id, text AS resp, $hSc % 100 AS score FROM documents), " +
        "ranked AS MATERIALIZED (SELECT r.*, " +
        "row_number() OVER (PARTITION BY prompt_id ORDER BY score DESC, resp_id ASC) AS rb, " +
        "row_number() OVER (PARTITION BY prompt_id ORDER BY score ASC, resp_id DESC) AS rw FROM resp r), " +
        "ch AS (SELECT prompt_id, rb AS pair_rank, resp_id AS chosen_id, resp AS chosen, score AS cs, rw AS crw FROM ranked WHERE rb <= 2), " +
        "rj AS (SELECT prompt_id, rw AS pair_rank, resp_id AS rejected_id, resp AS rejected, score AS rs FROM ranked WHERE rw <= 2), " +
        s"jac AS (SELECT ch.prompt_id, ch.pair_rank, chosen_id, rejected_id, cs - rs AS margin, crw, cs, rs, " +
        s"len(list_intersect(${dtoks("chosen")}, ${dtoks("rejected")})) AS i, " +
        s"len(${dtoks("chosen")}) + len(${dtoks("rejected")}) AS ab " +
        "FROM ch JOIN rj ON rj.prompt_id = ch.prompt_id AND rj.pair_rank = ch.pair_rank), " +
        "pr AS MATERIALIZED (SELECT chosen_id AS win, rejected_id AS lose FROM jac " +
        "WHERE pair_rank < crw AND cs > rs AND margin >= 5 AND i * 10000 < (ab - i) * 9000), " +
        btChainSql + " " + btFinalSql
    }) { (s, d) =>
      import graft.llmops.{Corpus, PortableHash, RewardFit}
      val responses = Tables.documents(s, d)
        .select(col("doc_id").as("resp_id"),
          expr("doc_id div 4").as("prompt_id"), col("text").as("resp"),
          (PortableHash.hash52(concat(col("doc_id").cast("string"),
            lit(":sc"))) % 100).as("score"))
        .withColumn("prompt", concat(lit("p"), col("prompt_id")))
      val pairs = Corpus.preferencePairs(responses, "prompt_id", "prompt",
        "resp_id", "resp", "score", minMargin = 5.0, maxPairsPerPrompt = 2)
      RewardFit.bradleyTerry(
          pairs.select(col("chosen_id"), col("rejected_id")),
          "chosen_id", "rejected_id", iterations = BtIters)
        .orderBy("item")
    },

    // Containment near-dup pairs (the asymmetric axis): ordered pairs
    // where >= 80% of id_a's distinct 3-gram shingles appear in id_b —
    // the quote/wrapper-page class symmetric Jaccard is blind to. The
    // prefix filter is lossless for containment (one-sided pruning) and
    // the df cap is inactive at oracle scale, so the oracle computes
    // the EXACT containment join directly (raw shingle strings — hash
    // collisions in the Spark side's xxhash64 would break the compare,
    // which is the point).
    q("q_x_dedup_containment",
      "WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
        "sh AS (SELECT doc_id AS doc, list_distinct(list_transform(generate_series(1, len(toks) - 2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles FROM t WHERE len(toks) >= 3), " +
        "ex AS MATERIALIZED (SELECT doc, unnest(shingles) AS s FROM sh), " +
        "sz AS MATERIALIZED (SELECT doc, CAST(count(*) AS BIGINT) AS n_sh FROM ex GROUP BY 1), " +
        "shr AS (SELECT a.doc AS id_a, b.doc AS id_b, CAST(count(*) AS BIGINT) AS sh FROM ex a JOIN ex b ON a.s = b.s AND a.doc <> b.doc GROUP BY 1, 2) " +
        "SELECT id_a, id_b, round(CAST(sh AS DOUBLE) / sa.n_sh, 6) AS containment, sa.n_sh AS n_a, sb.n_sh AS n_b " +
        "FROM shr JOIN sz sa ON sa.doc = id_a JOIN sz sb ON sb.doc = id_b " +
        "WHERE CAST(sh AS DOUBLE) / sa.n_sh >= 0.8 ORDER BY id_a, id_b") { (s, d) =>
      graft.llmops.Dedup.containmentPairs(Tables.documents(s, d),
          "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")
    },

    // Trigram absolute-discount backoff LM: the full artifact table —
    // unigram rows with their bows, bigram rows NOW carrying the
    // (w1,w2)-context bows the trigram order backs off through, and the
    // trigram rows — replayed value-exact (counts → context totals →
    // the single-denominator seen-mass rational → micro-grid log10).
    q("q_x_arpa3_lm",
      arpa3ChainSql("") +
        " SELECT * FROM (" +
        "SELECT 1 AS n, up.w AS gram, up.nll AS nll10_micro, coalesce(b.bow, CAST(0 AS BIGINT)) AS bow10_micro FROM up LEFT JOIN bows b ON up.w = b.w1 " +
        "UNION ALL SELECT 2 AS n, bm.w1 || ' ' || bm.w2 AS gram, bm.nll AS nll10_micro, coalesce(b2.bow2, CAST(0 AS BIGINT)) AS bow10_micro FROM bm LEFT JOIN bow2 b2 ON b2.w1 = bm.w1 AND b2.w2 = bm.w2 " +
        "UNION ALL SELECT 3 AS n, w1 || ' ' || w2 || ' ' || w3 AS gram, nll AS nll10_micro, CAST(NULL AS BIGINT) AS bow10_micro FROM tm) " +
        "ORDER BY n, CASE WHEN n = 1 AND gram = '<unk>' THEN 0 ELSE 1 END, gram") { (s, d) =>
      graft.llmops.LmArtifact.arpaTable3(Tables.documents(s, d), "text")
    },

    // Kneser-Ney trigram artifact: continuation-count lower orders
    // (distinct-left-context bigram probabilities, continuation-smoothed
    // unigrams), the two discount-mass bow rationals over the KN
    // distributions, and the backoff-consistent context-only bigram rows
    // (exact integer micro subtraction) — the whole chain replayed
    // value-exact.
    q("q_x_arpa3_kn",
      arpa3KnChainSql("") +
        " SELECT * FROM (" +
        "SELECT 1 AS n, up.w AS gram, up.nll AS nll10_micro, coalesce(b.bow, CAST(0 AS BIGINT)) AS bow10_micro FROM up LEFT JOIN bows b ON up.w = b.w " +
        "UNION ALL SELECT 2 AS n, a || ' ' || b AS gram, nll AS nll10_micro, bow AS bow10_micro FROM bi " +
        "UNION ALL SELECT 3 AS n, w1 || ' ' || w2 || ' ' || w3 AS gram, nll AS nll10_micro, CAST(NULL AS BIGINT) AS bow10_micro FROM tm) " +
        "ORDER BY n, CASE WHEN n = 1 AND gram = '<unk>' THEN 0 ELSE 1 END, gram") { (s, d) =>
      graft.llmops.LmArtifact.arpaTable3Kn(Tables.documents(s, d), "text")
    },

    // Trigram backoff scoring: model trained on even doc_ids, odd docs
    // scored triple by triple — trigram hits, bigram backoff through the
    // context bow, and the double-backoff unigram path (OOV targets map
    // to <unk>) all replayed; per-doc totals exact BIGINT sums.
    q("q_x_arpa3_score",
      arpa3ChainSql("WHERE doc_id % 2 = 0") +
        ", t2 AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents WHERE doc_id % 2 = 1), " +
        "tr AS (SELECT doc_id AS doc, toks[i] AS r1, toks[i+1] AS r2, toks[i+2] AS r3 FROM t2, unnest(generate_series(1, len(toks) - 2)) AS u(i) WHERE len(toks) >= 3), " +
        "mp AS (SELECT doc, CASE WHEN c1m.w IS NULL THEN '<unk>' ELSE r1 END AS w1, " +
        "CASE WHEN c2m.w IS NULL THEN '<unk>' ELSE r2 END AS w2, " +
        "CASE WHEN c3m.w IS NULL THEN '<unk>' ELSE r3 END AS w3, " +
        "CASE WHEN c3m.w IS NULL THEN 1 ELSE 0 END AS oov FROM tr " +
        "LEFT JOIN cu c1m ON tr.r1 = c1m.w LEFT JOIN cu c2m ON tr.r2 = c2m.w LEFT JOIN cu c3m ON tr.r3 = c3m.w), " +
        "sc AS (SELECT mp.doc, mp.oov, tm.nll AS t_nll, bm23.nll AS b_nll, " +
        "coalesce(b2.bow2, CAST(0 AS BIGINT)) AS bow12, up3.nll AS u3, coalesce(bw.bow, CAST(0 AS BIGINT)) AS bow1 FROM mp " +
        "LEFT JOIN tm ON mp.w1 = tm.w1 AND mp.w2 = tm.w2 AND mp.w3 = tm.w3 " +
        "LEFT JOIN bm bm23 ON mp.w2 = bm23.w1 AND mp.w3 = bm23.w2 " +
        "LEFT JOIN bow2 b2 ON mp.w1 = b2.w1 AND mp.w2 = b2.w2 " +
        "JOIN up up3 ON mp.w3 = up3.w LEFT JOIN bows bw ON mp.w2 = bw.w1) " +
        "SELECT doc, CAST(count(*) AS BIGINT) AS n_triples, CAST(sum(oov) AS BIGINT) AS n_oov, " +
        "CAST(sum(CASE WHEN t_nll IS NULL AND b_nll IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff_bi, " +
        "CAST(sum(CASE WHEN t_nll IS NULL AND b_nll IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff_uni, " +
        "CAST(sum(coalesce(t_nll, coalesce(b_nll - bow12, u3 - bow1 - bow12))) AS BIGINT) AS sum_nll10_micro " +
        "FROM sc GROUP BY doc ORDER BY doc") { (s, d) =>
      import graft.llmops.LmArtifact
      val docs = Tables.documents(s, d)
      val lm = LmArtifact.arpaTable3(docs.filter(col("doc_id") % 2 === 0), "text")
        .localCheckpoint(true)
      LmArtifact.arpaScore3(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", lm)
        .orderBy("doc")
    },

    // Per-URL revisit scheduling (lastmod + adaptive TTL) — a TWO-CYCLE
    // replay: cycle 1 fetches every url (first contact -> initTtl),
    // cycle 2 re-fetches the doc_id%5 lane (changed on %10 -> TTL
    // halves; unchanged -> doubles), sitemaps carry CONSTRUCTED W3C
    // lastmod strings (month<=2 exercising the civil-arithmetic year
    // adjust, date-only and full datetime forms), and the plan keeps
    // exactly the lastmod-newer and TTL-elapsed rows with the
    // boost+overdue-bps priority. The oracle replays recordFetches'
    // TTL fold, lastmodKey's era/yoe/doy epoch arithmetic and the due
    // rules value-exact; joining the plan back to the history pins the
    // n_fetches/n_changes fold too.
    q("q_x_crawl_revisit", {
      val t0 = 1704067200L
      val (t2, now) = (t0 + 172800L, t0 + 250000L)
      "WITH b AS (SELECT doc_id, 'https://h' || (doc_id % 7) || '.example/p' || doc_id AS url FROM documents), " +
        "h AS (SELECT doc_id, url, " +
        s"CASE WHEN doc_id % 5 = 0 THEN $t2 ELSE $t0 + (doc_id % 1000) * 37 END AS last_fetch, " +
        "CASE WHEN doc_id % 10 = 0 THEN 43200 WHEN doc_id % 5 = 0 THEN 172800 ELSE 86400 END AS ttl_secs, " +
        "CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS n_fetches, " +
        "CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS n_changes FROM b), " +
        "lc AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 2024 ELSE 2023 END AS y, " +
        "CASE WHEN doc_id % 3 = 0 THEN 2 ELSE doc_id % 12 + 1 END AS m, doc_id % 28 + 1 AS d, " +
        "CASE WHEN doc_id % 3 = 0 THEN doc_id % 24 ELSE 0 END AS hh, " +
        "CASE WHEN doc_id % 3 = 0 THEN doc_id % 60 ELSE 0 END AS mi, " +
        "CASE WHEN doc_id % 3 = 0 THEN doc_id % 59 ELSE 0 END AS ss " +
        "FROM documents WHERE doc_id % 3 < 2), " +
        "l1 AS (SELECT doc_id, y - CASE WHEN m <= 2 THEN 1 ELSE 0 END AS ya, m, d, hh, mi, ss FROM lc), " +
        "l2 AS (SELECT doc_id, ya // 400 AS era, ya - (ya // 400) * 400 AS yoe, " +
        "CASE WHEN m > 2 THEN m - 3 ELSE m + 9 END AS mp2, d, hh, mi, ss FROM l1), " +
        "l3 AS (SELECT doc_id, era, yoe, (153 * mp2 + 2) // 5 + d - 1 AS doy, hh, mi, ss FROM l2), " +
        "lmk AS (SELECT doc_id, (era * 146097 + yoe * 365 + yoe // 4 - yoe // 100 + doy - 719468) * 86400 " +
        "+ hh * 3600 + mi * 60 + ss AS lm FROM l3), " +
        "p AS (SELECT h.*, lmk.lm FROM h LEFT JOIN lmk ON h.doc_id = lmk.doc_id), " +
        s"q AS (SELECT *, (lm IS NOT NULL AND lm > last_fetch) AS due_lm, " +
        s"$now >= last_fetch + ttl_secs AS due_ttl FROM p) " +
        "SELECT url, 'h' || (doc_id % 7) || '.example' AS host, " +
        s"CAST(CASE WHEN due_lm THEN 1000000 ELSE 0 END + (($now - last_fetch) * 10000) // ttl_secs AS BIGINT) AS priority, " +
        "CAST(last_fetch AS BIGINT) AS last_fetch, CAST(ttl_secs AS BIGINT) AS ttl_secs, " +
        "CAST(n_fetches AS BIGINT) AS n_fetches, CAST(n_changes AS BIGINT) AS n_changes " +
        "FROM q WHERE due_lm OR due_ttl ORDER BY url"
    }) { (s, d) =>
      import graft.llmops.TextAnalysis
      val t0 = 1704067200L
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"),
        concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
          lit(".example/p"), col("doc_id").cast("string")).as("url"))
      val f1 = base.select(col("url"),
        (lit(t0) + (col("doc_id") % 1000) * 37).as("at"),
        lit(false).as("chg"))
      val h1 = TextAnalysis.recordFetches(
        TextAnalysis.emptyFetchHistory(s), f1, "url", "at", "chg")
      val f2 = base.filter(col("doc_id") % 5 === 0)
        .select(col("url"), lit(t0 + 172800L).as("at"),
          (col("doc_id") % 10 === 0).as("chg"))
      val h2 = TextAnalysis.recordFetches(h1, f2, "url", "at", "chg")
        .localCheckpoint(true)
      val sm = base.filter(col("doc_id") % 3 < 2).select(
        lit("https://sm.example/sitemap.xml").as("sitemap_url"),
        lit("url").as("kind"), col("url").as("loc"),
        when(col("doc_id") % 3 === 0,
          format_string("2024-02-%02dT%02d:%02d:%02d",
            col("doc_id") % 28 + 1, col("doc_id") % 24,
            col("doc_id") % 60, col("doc_id") % 59))
          .otherwise(format_string("2023-%02d-%02d",
            col("doc_id") % 12 + 1, col("doc_id") % 28 + 1)).as("lastmod"))
      val plan = TextAnalysis.revisitPlan(h2, sm, nowEpoch = t0 + 250000L)
      plan.join(h2, Seq("url"))
        .select("url", "host", "priority", "last_fetch", "ttl_secs",
          "n_fetches", "n_changes")
        .orderBy("url")
    },

    // WebDataset .tar interop round trip (the q_x_warc_interop shape,
    // for the shard envelope multimodal trainers consume): Spark WRITES
    // the corpus as key-grouped USTAR members (a txt part for every
    // sample, a meta part skipped on the %7 lane — the optional-field
    // rule), reads the tars back through the checksum-verifying
    // quarantine parser, and aggregates per extension; the ORACLE
    // computes the identical counts, key sums and order-invariant
    // key:md5(payload) checksums STRAIGHT from the table — any member
    // the tar layer loses, tears, mis-names or mutates breaks the hash.
    q("q_x_webdataset_interop", {
      import graft.llmops.PortableHash
      val hTxt = PortableHash.duckHash52(
        "CAST(doc_id AS VARCHAR) || ':' || md5(text)")
      val hMeta = PortableHash.duckHash52(
        "CAST(doc_id AS VARCHAR) || ':' || md5('{\"id\":' || doc_id || '}')")
      "SELECT * FROM (" +
        "SELECT 'txt' AS ext, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(doc_id) AS BIGINT) AS key_sum, " +
        s"CAST(bit_xor($hTxt) AS BIGINT) AS checksum FROM documents " +
        "UNION ALL " +
        "SELECT 'meta' AS ext, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(doc_id) AS BIGINT) AS key_sum, " +
        s"CAST(bit_xor($hMeta) AS BIGINT) AS checksum FROM documents " +
        "WHERE doc_id % 7 <> 0) ORDER BY ext"
    }) { (s, d) =>
      import graft.ingest.WebDataset
      import graft.llmops.PortableHash
      val path = java.nio.file.Files
        .createTempDirectory("graft_webdataset_interop").toString
      val docs = Tables.documents(s, d)
      val meta = when(col("doc_id") % 7 =!= 0,
        concat(lit("{\"id\":"), col("doc_id").cast("string"), lit("}")))
      WebDataset.write(docs, col("doc_id"),
        Seq("txt" -> col("text"), "meta" -> meta), path, shards = 4)
      val back = WebDataset.read(s, path)
      require(back.where(!col("ok")).isEmpty,
        "self-written WebDataset must parse cleanly")
      back.select(col("ext"), col("key").cast("long").as("__k"),
          PortableHash.hash52(concat(col("key"), lit(":"),
            md5(col("payload")))).as("__h"))
        .groupBy("ext")
        .agg(count(lit(1)).as("n"), sum("__k").as("key_sum"),
          expr("bit_xor(__h)").as("checksum"))
        .orderBy("ext")
    })
}
