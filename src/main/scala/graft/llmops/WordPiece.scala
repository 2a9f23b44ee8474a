package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT lineage) —
  * the THIRD production tokenizer family next to merge-frequency [[Bpe]]
  * and EM-pruned [[Unigram]]. Two halves, both implemented here:
  *
  * TRAINING is BPE-shaped — grow the vocabulary by merging the best
  * adjacent symbol pair per round — but the selection rule is the
  * LIKELIHOOD score, not raw frequency:
  *
  *   score(l, r) = freq(l r) / (freq(l) · freq(r))
  *
  * the pointwise-mutual-information-style criterion that prefers pairs
  * whose co-occurrence is surprising given their parts (the published
  * WordPiece rule; HF "training WordPiece" documents the same formula).
  * Symbols carry the `##` continuation marker from symbolization on:
  * every non-word-initial character seeds as `##c`, and a merge product
  * strips the marker off its right side (`ab + ##cd → abcd`,
  * `##ab + ##cd → ##abcd`) — so the learned vocabulary IS the
  * position-annotated piece set `vocab.txt` serializes.
  *
  * The score is compared as an exact scaled-integer key — engine-portable
  * like [[Unigram]]'s micro-nll:
  * `key = (pf · 10^15) div (freq(l) · freq(r))` computed in DECIMAL(38,0)
  * (Spark `div` ≡ DuckDB hugeint `//` on positive operands); ties break
  * (key DESC, pf DESC, l ASC, r ASC). Pairs whose true scores differ by
  * < 10⁻¹⁵ compare equal and fall to the deterministic tie chain — the
  * same quantize-then-decide discipline as the micro-nll DP.
  *
  * SERVING is greedy longest-match-first (the WordPiece inference rule,
  * entirely unlike BPE's merge replay): per word, repeatedly take the
  * LONGEST vocabulary piece matching at the cursor — word-initial
  * positions match only unmarked pieces, later positions only
  * `##`-marked ones — and a position with no match makes the whole word
  * `[UNK]` (as does a word longer than `maxWordLen`, the BERT
  * `max_input_chars_per_word` rule). Implemented as one codegen'd
  * per-row fold over the DISTINCT-WORD table (the [[Unigram.segment]]
  * shape — corpus size enters through one distinct + the final join
  * back): a per-word candidate map keyed `"0:"/"1:" + strip` (initial /
  * continuation), then an `aggregate` fold that advances the cursor by
  * the longest hit. No driver loop, no window, no recursion.
  *
  * Marker ambiguity, stated: a piece's continuation-ness derives from
  * its SURFACE form (`##`-prefix), exactly as in `vocab.txt` — a word
  * literally beginning "##" cannot match its own leading characters as
  * an initial piece. Both the Spark fold and the DuckDB oracle share the
  * rule, as does every real vocab.txt consumer.
  *
  * Scale: training runs on the word-frequency table ([[Bpe]] discipline)
  * — per round one pair-count groupBy, one symbol-frequency groupBy, two
  * broadcast-sized joins, a 1-row argmax, one windowed rewrite; serving
  * is distinct-words + a vocab equi-join on candidate substrings + the
  * fold, all map-side after the one distinct.
  */
object WordPiece {

  val Cont = "##"
  val Unk = "[UNK]"

  final case class Merge(rank: Int, left: String, right: String,
      pairFreq: Long, leftFreq: Long, rightFreq: Long, scoreKey: Long)

  /** Merge product: continuation marker stripped off the right symbol. */
  def mergedSym(l: String, r: String): String =
    l + (if (r.startsWith(Cont)) r.substring(Cont.length) else r)

  /** (word, freq) vocabulary — the training input ([[Bpe.wordVocab]]
    * with the pre-tokenizer threaded, the r10 rule).
    */
  def wordVocab(df: DataFrame, textCol: String,
      tokens: Column => Column = TextAnalysis.wsTokens): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbolization with the continuation marker: position 1 is
    * the bare character, later positions are `##c`.
    */
  def initialSyms(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("freq"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as(Seq("i0", "c")))
      .select(col("word"), col("freq"), (col("i0") + 1).cast("long").as("i"),
        when(col("i0") === 0, col("c"))
          .otherwise(concat(lit(Cont), col("c"))).as("s"))

  /** The best pair under the likelihood score — exact scaled-integer key,
    * deterministic ties; 1-row driver action (the [[Bpe]] pattern).
    */
  private def bestPair(syms: DataFrame): Option[Merge] = {
    val w = Window.partitionBy("word").orderBy("i")
    val pairs = syms.withColumn("s2", lead(col("s"), 1).over(w))
      .filter(col("s2").isNotNull)
      .groupBy("s", "s2").agg(sum("freq").as("pf"))
    val sf = syms.groupBy("s").agg(sum("freq").as("f"))
    pairs
      .join(sf.select(col("s").as("__l"), col("f").as("fl")),
        col("s") === col("__l"))
      .join(sf.select(col("s").as("__r"), col("f").as("fr")),
        col("s2") === col("__r"))
      .withColumn("score",
        expr("CAST(pf AS DECIMAL(38,0)) * 1000000000000000 div " +
          "(CAST(fl AS DECIMAL(38,0)) * CAST(fr AS DECIMAL(38,0)))"))
      .orderBy(col("score").desc, col("pf").desc, col("s").asc, col("s2").asc)
      .limit(1).collect().headOption
      .map(r => Merge(0, r.getAs[String]("s"), r.getAs[String]("s2"),
        r.getAs[Long]("pf"), r.getAs[Long]("fl"), r.getAs[Long]("fr"),
        r.getAs[Long]("score")))
  }

  /** Learn `k` merges; returns the merge table and the post-merge
    * position table (word, freq, i, s). Stops early on exhaustion.
    */
  def learnMerges(vocab: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    require(k >= 1)
    var syms = initialSyms(vocab).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      bestPair(syms) match {
        case Some(m) =>
          merges += m.copy(rank = rank)
          syms = Bpe.mergeRound(syms, m.left, m.right,
            mergedSym(m.left, m.right)).localCheckpoint(true)
          rank += 1
        case None => exhausted = true
      }
    }
    (merges.result(), syms)
  }

  /** The learned merge table as a frame: (mrank, lhs, rhs, pair_freq,
    * left_freq, right_freq, score) — the scaled-integer selection key
    * rides along so the oracle pins the DECISION, not just the winner.
    */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.pairFreq,
        m.leftFreq, m.rightFreq, m.scoreKey))
      .toDF("mrank", "lhs", "rhs", "pair_freq", "left_freq", "right_freq",
        "score")
  }

  /** The servable piece set: the training alphabet (distinct initial
    * symbols, sorted) at ids 0.., then merge products in rank order with
    * first-occurrence dedup — the exact (piece, id) mapping `vocab.txt`
    * serializes (modulo the specials prelude, which the artifact writer
    * owns).
    */
  def vocabTable(trainVocab: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = trainVocab.sparkSession
    import spark.implicits._
    wordPiecePieces(trainVocab, merges).toSeq.map { case (p, id) => (p, id.toLong) }
      .toDF("piece", "id")
  }

  /** Alphabet + merge-product id assignment (insertion-ordered) — the
    * [[VocabArtifact]] `bpePieces` discipline; the collect is
    * alphabet-sized (bounded by the corpus script repertoire × 2 for the
    * marker forms).
    */
  private[llmops] def wordPiecePieces(trainVocab: DataFrame,
      merges: Seq[Merge]): scala.collection.mutable.LinkedHashMap[String, Int] = {
    val alphabet = initialSyms(trainVocab).select("s").distinct()
      .orderBy("s").collect().map(_.getString(0))
    val pieces = new scala.collection.mutable.LinkedHashMap[String, Int]()
    alphabet.foreach(a => pieces.getOrElseUpdate(a, pieces.size))
    merges.sortBy(_.rank).foreach(m =>
      pieces.getOrElseUpdate(mergedSym(m.left, m.right), pieces.size))
    pieces
  }

  /** Greedy longest-match segmentation with a piece vocabulary (column
    * `piece`): one row per (id, word_idx, piece_idx, piece) in reading
    * order — the [[Bpe.segment]]/[[Unigram.segment]] shape, so fertility
    * audits and token-id assignment compose unchanged. Words longer than
    * `maxWordLen` emit `[UNK]` whole (never enter the fold — the row's
    * DP cost is length × maxK, so the cap is also the scale guard
    * against adversarial megaword documents).
    */
  def segment(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxWordLen: Int = 32,
      tokens: Column => Column = TextAnalysis.wsTokens,
      unkPiece: String = Unk): DataFrame = {
    require(maxWordLen >= 1)
    val vt = vocab.select(col("piece"),
        when(col("piece").startsWith(Cont),
          col("piece").substr(lit(Cont.length + 1), length(col("piece"))))
          .otherwise(col("piece")).as("strip"),
        col("piece").startsWith(Cont).as("cont"))
      .select(concat(when(col("cont"), "1:").otherwise("0:"),
        col("strip")).as("vkey"), col("strip"))
      .distinct()
    // longest possible match = longest strip; 1-row bounded driver action
    // (empty vocabulary → nothing can match → maxK 1, every word [UNK])
    val maxKRow = vt.agg(max(length(col("strip")))).collect().head
    val maxK =
      if (maxKRow.isNullAt(0)) 1
      else math.max(1, math.min(maxWordLen, maxKRow.getInt(0)))
    val toks = df.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("word_idx", "w")))
      .where(length(col("w")) >= 1)
      .withColumn("word_idx", col("word_idx").cast("long"))
    val words = toks.select("w").distinct()
      .withColumn("n", length(col("w")).cast("long"))
    val longs = words.filter(col("n") > maxWordLen)
      .select(col("w"), array(lit(unkPiece)).as("ps"))
    val shorts = words.filter(col("n") <= maxWordLen)
    // per-word candidate map: every (position-class, substring ≤ maxK)
    // that IS a vocabulary piece → true
    val cands = shorts
      .select(col("w"), col("n"), explode(sequence(lit(1L), col("n"))).as("p"))
      .withColumn("k", explode(sequence(lit(1L),
        least(lit(maxK.toLong), col("n") - col("p") + 1L))))
      .select(col("w"),
        concat(when(col("p") === 1L, "0:").otherwise("1:"),
          col("w").substr(col("p").cast("int"), col("k").cast("int"))).as("vkey"))
      .distinct()
      .join(vt.select("vkey"), Seq("vkey"))
    val wm = cands.groupBy("w")
      .agg(map_from_entries(collect_list(struct(col("vkey"), lit(true))))
        .as("m"))
    // the greedy longest-match walk as ONE compiled kernel (r16 phase 2;
    // previously an `aggregate` higher-order fold — CodegenFallback, so
    // every cursor step paid a maxK-deep interpreted when-chain of map
    // probes). Semantics bit-identical: same position-class keys, the
    // longest match at the cursor wins, any miss declares the whole word
    // [UNK]; positions count Unicode CODE POINTS exactly like the
    // substr-built candidate keys. A null map (no candidate of this word
    // is in the vocabulary — the left-join miss) yields [UNK] just as
    // every element_at of a null map missed.
    val wpWalk = udf((w: String, m: Map[String, Boolean]) => {
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
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 1
        var unk = false
        while (!unk && pos <= n) {
          var k = math.min(maxK, n - pos + 1)
          var found = 0
          while (k >= 1 && found == 0) {
            val key = (if (pos == 1) "0:" else "1:") +
              w.substring(offs(pos - 1), offs(pos - 1 + k))
            if (m != null && m.contains(key)) found = k else k -= 1
          }
          if (found == 0) { ps.clear(); ps += unkPiece; unk = true }
          else {
            val sub = w.substring(offs(pos - 1), offs(pos - 1 + found))
            ps += (if (pos == 1) sub else Cont + sub)
            pos += found
          }
        }
        ps.toSeq
      }
    })
    val seg = shorts.join(wm, Seq("w"), "left")
      .select(col("w"), wpWalk(col("w"), col("m")).as("ps"))
    toks.join(seg.unionByName(longs), Seq("w"))
      .select(col("id"), col("word_idx"),
        posexplode(col("ps")).as(Seq("piece_idx", "piece")))
      .withColumn("piece_idx", col("piece_idx").cast("long"))
  }
}
