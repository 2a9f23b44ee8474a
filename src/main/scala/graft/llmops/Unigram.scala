package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER half
  * of production tokenizers next to [[Bpe]]: merge-based BPE grows a
  * vocabulary bottom-up; the unigram LM (Kudo 2018, the Llama/T5
  * lineage) starts from an over-complete seed and EM-prunes it, scoring
  * segmentations by piece log-probabilities. This implementation is the
  * hard-EM (Viterbi) form over the word-frequency table:
  *
  *   1. SEED: every substring of length ≤ `maxPieceLen` of every
  *      (truncated) word, occurrence-weighted; ALL single characters
  *      enter and STAY in the vocabulary (full coverage by construction
  *      — no UNK in training data), plus the top
  *      `vocabSize · seedCapFactor` multi-character pieces by
  *      (count DESC, piece ASC).
  *   2. E-STEP: Viterbi-segment each distinct word under the current
  *      piece costs — a per-row dynamic program over character
  *      positions (one compiled kernel, r16; cost(i) =
  *      min over k ≤ maxPieceLen of cost(i−k) + nll(piece ending at
  *      i)), then the backpointer-free argmin walk back out
  *      (ties break to the SHORTEST piece — deterministic and
  *      engine-portable). Piece counts = Viterbi occurrences weighted
  *      by word frequency.
  *   3. M-STEP + PRUNE: keep all single characters (zero-count ones
  *      included — coverage) plus the top `vocabSize` multi-character
  *      pieces by (count DESC, piece ASC); re-score with add-1
  *      smoothing, `nll = round(ln((T + V)/(cnt + 1)) · 1e6)` as a
  *      BIGINT micro-nll — integer costs make every later DP comparison
  *      and tie EXACT on both engines (the curriculumPhases
  *      quantize-then-decide discipline; only the ln itself is float,
  *      on a 1e-6 grid).
  *
  * Deliberate simplifications vs the paper, stated: hard EM instead of
  * forward-backward expectations (the common reimplementation choice;
  * counts are Viterbi counts), a fixed per-round prune to `vocabSize`
  * instead of a gradual shrink schedule, and training words truncate at
  * `maxWordLen` chars (SentencePiece itself caps piece and sentence
  * lengths; the DP cost is length × maxPieceLen per word).
  *
  * Scale: everything runs on the DISTINCT-WORD table (the [[Bpe]]
  * discipline — corpus size enters only through the one token-count
  * aggregation); per round: one vocab equi-join on candidate substrings,
  * one map-build aggregation, the two codegen'd per-row folds, one
  * count aggregation, and a vocab-bounded TakeOrdered prune. No
  * corpus-wide window, no driver state; rounds checkpoint so the plan
  * stays flat.
  *
  * [[Bpe.fertility]] applies unchanged to the resulting segmentation
  * for quality audits.
  */
object Unigram {

  private val Big = 1000000000000L // unreachable-cost sentinel; real paths stay ≤ ~1e9
  // per-char cost of an uncovered single char under byte fallback: far
  // above any learned piece (≤ ~1e9), far below Big — so the DP crosses an
  // OOV char one char at a time and never absorbs covered neighbors.
  private[llmops] val UnkCharCost = 1000000000L * 10

  /** Train the vocabulary; returns (piece, n_chars, cnt, nll_micro)
    * ordered by (cnt DESC, piece) — `cnt` is the final round's Viterbi
    * count (zero-count single chars kept for coverage).
    *
    * `tokens` is the pre-tokenizer (the r10 threading rule every text
    * operator follows — [[Bpe.tokenCounts]], [[TextAnalysis.withQuality]],
    * …): the default whitespace split is bit-identical to the historical
    * behavior; pass [[TextAnalysis.scriptTokens]] for CJK/no-space-script
    * corpora, where a whitespace split would see one 12-char-truncated
    * sentence-"word" per line and train a degenerate vocabulary.
    */
  def unigramVocab(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, rounds: Int = 2, maxPieceLen: Int = 3,
      maxWordLen: Int = 12, seedCapFactor: Int = 2,
      tokens: Column => Column = TextAnalysis.wsTokens): DataFrame = {
    require(vocabSize >= 1 && rounds >= 1 && maxPieceLen >= 1 &&
      maxWordLen >= 1 && seedCapFactor >= 1)
    val words = df
      .select(explode(tokens(col(textCol))).as("tok"))
      .select(substring(col("tok"), 1, maxWordLen).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("n", length(col("w")).cast("long"))
      .localCheckpoint(eager = true)
    // every (word, piece) candidate — shared by the seed and every round
    val allSubs = words
      .select(col("w"), col("freq"), col("n"),
        explode(sequence(lit(1L), col("n"))).as("p"))
      .withColumn("k", explode(sequence(lit(1L),
        least(lit(maxPieceLen.toLong), col("n") - col("p") + 1L))))
      .withColumn("piece",
        col("w").substr(col("p").cast("int"), col("k").cast("int")))
      .localCheckpoint(eager = true)

    // branch points checkpoint: seed counts feed singles, the multi
    // TakeOrdered AND the smoothing total — uncheckpointed, the upstream
    // aggregation would re-run once per consumer (and each EM round's
    // counts would re-run the whole Viterbi pipeline three times).
    val seedCounts = allSubs.groupBy("piece").agg(sum("freq").as("cnt"))
      .localCheckpoint(eager = true)
    val seed = seedCounts.where(length(col("piece")) === 1)
      .unionByName(seedCounts.where(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece"))
        .limit(vocabSize * seedCapFactor))
    var vocab = withNll(seed).localCheckpoint(eager = true)

    (1 to rounds).foreach { _ =>
      val counts = viterbiCounts(words, allSubs, vocab, maxPieceLen)
        .localCheckpoint(eager = true)
      val singles = vocab.where(length(col("piece")) === 1).select("piece")
        .join(counts, Seq("piece"), "left")
        .na.fill(0L, Seq("cnt"))
      val multis = counts.where(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      vocab = withNll(singles.unionByName(multis)).localCheckpoint(eager = true)
    }
    vocab.select(col("piece"), length(col("piece")).cast("long").as("n_chars"),
        col("cnt"), col("nll").as("nll_micro"))
      .orderBy(col("cnt").desc, col("piece"))
  }

  /** Add-1-smoothed micro-nll over the kept set: the corpus total and
    * vocabulary size ride a broadcast scalar (never a driver action).
    */
  private def withNll(v: DataFrame): DataFrame = {
    val tot = v.agg(sum("cnt").as("__t"), count(lit(1)).as("__v"))
    v.crossJoin(broadcast(tot))
      .withColumn("nll", round(log((col("__t") + col("__v")).cast("double") /
        (col("cnt") + lit(1L))) * 1e6).cast("long"))
      .drop("__t", "__v")
  }

  /** One Viterbi E-step: per-word piece-cost map, the shared
    * forward+backward fold, and frequency-weighted counts.
    */
  private def viterbiCounts(words: DataFrame, allSubs: DataFrame,
      vocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val cand = allSubs.select("w", "piece").distinct()
      .join(vocab.select("piece", "nll"), Seq("piece"))
    val wm = cand.groupBy("w")
      .agg(map_from_entries(collect_list(struct(col("piece"), col("nll"))))
        .as("m"))
    segmentFold(words.join(wm, Seq("w")), maxPieceLen)
      .join(words.select("w", "freq"), Seq("w"))
      .select(col("freq"), explode(col("ps")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  /** Segment arbitrary text with a TRAINED vocabulary (the serving
    * half): one row per (id, piece) in reading order — feed it to
    * [[Bpe.fertility]]-style audits or token-id assignment. Same DP as
    * training, so serving segmentations are exactly the ones the counts
    * were estimated from. `tokens` must be the pre-tokenizer the vocab
    * was TRAINED with, or the word stream and the piece statistics
    * disagree.
    *
    * A vocabulary trained by [[unigramVocab]] keeps every single
    * character, so the DP always has a path; a FOREIGN vocabulary (e.g.
    * one imported via [[VocabArtifact]]) may lack some single chars, and
    * the walk's k=1 fallback would then silently emit pieces that are
    * not in the vocab. `checkCoverage = true` turns that into a loud
    * driver-side error (the TokenBin loud-failure discipline): one extra
    * distinct-char aggregation over the distinct-word table, bounded
    * collect. Default off — bit-identical plans for trained vocabs.
    *
    * `byteFallback = true` is the PRODUCTION answer to missing coverage
    * (the SentencePiece `byte_fallback` convention, the Llama lineage):
    * a character no vocab piece covers emits its UTF-8 bytes as
    * `<0xXX>` pieces (uppercase hex), making segmentation TOTAL over
    * any input. Two parts: (1) the DP prices each uncovered single
    * char at a finite per-char cost (10⁹ micro-nll — far above any real
    * piece, far below the Big sentinel), so an OOV char is always
    * spanned ALONE and never absorbs covered neighbors into a jump
    * (an in-vocab char next to an OOV char still emits its own learned
    * piece — spec-pinned); (2) post-walk, pieces the vocab lacks expand
    * in place to their byte pieces, positions renumbering inside the
    * word's own array (no window). Pair with
    * [[VocabArtifact.unigramArtifactTable]]'s `byteFallback` so the
    * byte pieces hold real ids in the shipped artifact.
    */
  def segment(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 3,
      maxWordLen: Int = 12,
      tokens: Column => Column = TextAnalysis.wsTokens,
      checkCoverage: Boolean = false,
      byteFallback: Boolean = false): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol)))
          .as(Seq("word_idx", "tok")))
      .select(col("id"), col("word_idx").cast("long").as("word_idx"),
        substring(col("tok"), 1, maxWordLen).as("w"))
      .where(length(col("w")) >= 1)
    val words = toks.select("w").distinct()
      .withColumn("n", length(col("w")).cast("long"))
    if (checkCoverage) {
      val missing = words
        .select(explode(transform(sequence(lit(1), col("n").cast("int")),
          i => col("w").substr(i, lit(1)))).as("piece"))
        .distinct()
        .join(vocab.select("piece"), Seq("piece"), "left_anti")
        .orderBy("piece").limit(20).collect().map(_.getString(0))
      require(missing.isEmpty,
        s"segment: vocabulary lacks single-character coverage of the input " +
          s"(first missing: ${missing.mkString("'", "', '", "'")}) — the DP " +
          "would emit out-of-vocab fallback pieces; fix the vocabulary or " +
          "pre-filter the corpus")
    }
    val subs = words
      .select(col("w"), col("n"), explode(sequence(lit(1L), col("n"))).as("p"))
      .withColumn("k", explode(sequence(lit(1L),
        least(lit(maxPieceLen.toLong), col("n") - col("p") + 1L))))
      .withColumn("piece",
        col("w").substr(col("p").cast("int"), col("k").cast("int")))
      .select("w", "piece").distinct()
      .join(vocab.select(col("piece"),
        col(if (vocab.columns.contains("nll_micro")) "nll_micro" else "nll")
          .as("nll")), Seq("piece"))
    val wm = subs.groupBy("w")
      .agg(map_from_entries(collect_list(struct(col("piece"), col("nll"))))
        .as("m"))
    // byte fallback LEFT-joins: a word NO vocab piece touches still
    // segments (null map → every lookup misses → per-char unk costs →
    // all-byte expansion). The historical inner join stays for the
    // default path (an all-OOV word dropping silently is the behavior
    // checkCoverage exists to flag — bit-identical plans preserved).
    val seg = segmentFold(
      words.join(wm, Seq("w"), if (byteFallback) "left" else "inner"),
      maxPieceLen,
      unkCharCost = if (byteFallback) UnkCharCost else Big)
    val pieces =
      if (!byteFallback) reverse(col("ps"))
      else flatten(transform(reverse(col("ps")), p =>
        when(element_at(col("m"), p).isNotNull, array(p))
          .otherwise(bytePieces(p))))
    toks.join(seg, Seq("w"))
      .select(col("id"), col("word_idx"),
        posexplode(pieces).as(Seq("piece_idx", "piece")))
      .withColumn("piece_idx", col("piece_idx").cast("long"))
  }

  /** The UTF-8 byte pieces of a string, SentencePiece convention:
    * `<0xXX>`, uppercase hex, one piece per byte.
    */
  private[llmops] def bytePieces(p: Column): Column = {
    val hx = hex(encode(p, "UTF-8"))
    transform(sequence(lit(1), length(hx) - 1, lit(2)),
      i => concat(lit("<0x"), hx.substr(i, lit(2)), lit(">")))
  }

  /** The shared forward+backward fold, returning (w, ps, m) — ps is the
    * Viterbi piece list END-FIRST (training counts don't care; [[segment]]
    * reverses it for reading order), m rides along for the byte-fallback
    * expansion (Catalyst prunes it everywhere it goes unused).
    * `unkCharCost` prices a single char with no vocab piece: the Big
    * sentinel by default (bit-identical historical behavior — trained
    * vocabs never hit it), a finite 10⁹ under byte fallback so OOV chars
    * span alone (see [[segment]]).
    */
  private def segmentFold(withMap: DataFrame, maxPieceLen: Int,
      unkCharCost: Long = Big): DataFrame = {
    // The DP as ONE compiled kernel (r16 phase 2; previously two nested
    // `aggregate` higher-order folds — CodegenFallback, so every inner
    // cost probe paid interpreted expression dispatch, the q_x_mmr_*
    // lesson). Semantics bit-identical to the expression form it
    // replaces: the same integer micro-nll Long arithmetic, the same
    // Big/unkCharCost sentinels included in the min exactly as `least`
    // saw them, the same backpointer-free walk that re-derives the
    // argmin at each position and breaks cost ties to the SHORTEST
    // piece (the k = 1..maxPieceLen first-match order), the same
    // end-first piece list, and positions in Unicode CODE POINTS
    // exactly like the substr-built candidate map keys. A null map
    // (the byte-fallback left-join miss) prices every lookup at
    // miss(k), as element_at of a null map did.
    val kernel = udf((w: String, m: Map[String, Long]) => {
      if (w == null) null
      else {
        val offs = {
          val b = Array.newBuilder[Int]
          var i = 0
          while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
          b += w.length
          b.result()
        }
        val n = offs.length - 1
        def cost(p: Int, k: Int): Long = {
          val hit = if (m == null) None
            else m.get(w.substring(offs(p - 1), offs(p - 1 + k)))
          hit.getOrElse(if (k == 1) unkCharCost else Big)
        }
        val costs = new Array[Long](n + 1)
        var i = 1
        while (i <= n) {
          var best = Long.MaxValue
          var k = 1
          while (k <= maxPieceLen) {
            val opt = if (i - k >= 0) costs(i - k) + cost(i - k + 1, k) else Big
            if (opt < best) best = opt
            k += 1
          }
          costs(i) = best
          i += 1
        }
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = n
        while (pos > 0) {
          var chosen = 1
          var k = 1
          var done = false
          while (k <= maxPieceLen && !done) {
            if (pos - k >= 0 && costs(pos - k) + cost(pos - k + 1, k) == costs(pos)) {
              chosen = k; done = true
            }
            k += 1
          }
          ps += w.substring(offs(pos - chosen), offs(pos))
          pos -= chosen
        }
        ps.toSeq
      }
    })
    withMap.withColumn("ps", kernel(col("w"), col("m")))
      .select("w", "ps", "m")
  }
}
