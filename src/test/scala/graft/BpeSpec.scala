package graft

import graft.llmops.Bpe
import org.apache.spark.sql.functions._

/** Trained BPE: hand-checked merge order on the classic Sennrich
  * vocabulary, greedy left-to-right chain semantics, early exhaustion.
  */
class BpeSpec extends SparkTestBase {

  test("learned merges match the hand-computed Sennrich example (deterministic ties)") {
    import spark.implicits._
    // low×5, lower×2, newest×6, widest×3 — the worked example from
    // Sennrich et al.; every argmax and tie below is hand-verifiable.
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val (merges, syms) = Bpe.learnMerges(Bpe.wordVocab(docs, "text"), 8)
    val got = merges.map(m => (m.left, m.right, m.pairFreq))
    assert(got == Seq(
      ("e", "s", 9L), ("es", "t", 9L),   // 9-tie: e < s
      ("l", "o", 7L), ("lo", "w", 7L),   // 7-tie: l < o
      ("e", "w", 6L), ("ew", "est", 6L), ("n", "ewest", 6L),
      ("d", "est", 3L)), s"got $got")
    // after 8 merges: newest=1 symbol, low=1, lower=low+e+r=3, widest=w+i+dest=3
    val n = syms.groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("newest" -> 1L, "low" -> 1L, "lower" -> 3L, "widest" -> 3L))
  }

  test("greedy left-to-right merge on same-symbol chains (island parity)") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.learnMerges(Bpe.wordVocab(docs, "text"), 2)
    // round 1: (a,a) freq 3 → greedy rewrite [aa, aa] (NOT [aa, a, a] or
    // an overlapping triple); round 2: (aa,aa) freq 1 → [aaaa].
    assert(merges.map(m => (m.left, m.right, m.pairFreq)) ==
      Seq(("a", "a", 3L), ("aa", "aa", 1L)))
    val out = syms.orderBy("i").collect().map(_.getAs[String]("s")).toSeq
    assert(out == Seq("aaaa"))
  }

  test("odd-length chain leaves the trailing symbol unmerged") {
    import spark.implicits._
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val syms = Bpe.mergeRound(Bpe.initialSyms(Bpe.wordVocab(docs, "text")), "a", "a")
    assert(syms.orderBy("i").collect().map(_.getAs[String]("s")).toSeq ==
      Seq("aa", "aa", "a"))
  }

  test("exhausted vocabulary stops early; tokenCounts sums per-doc subwords") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, "cd")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.learnMerges(Bpe.wordVocab(docs, "text"), 10)
    // (a,b) freq 2 first, then (c,d) freq 1 — and nothing left: 2 merges.
    assert(merges.size == 2)
    assert(merges.head.left == "a" && merges.head.right == "b")
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", syms)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // every word collapsed to one symbol → n_bpe_tokens = n_words
    assert(counts == Seq((1L, 3L, 3L), (2L, 1L, 1L)))
  }

  test("segment: trained words reproduce training segmentation, novel words segment through the rules, byte-level composes") {
    import spark.implicits._
    val corpus = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val wv = Bpe.wordVocab(corpus, "text").localCheckpoint(true)
    val (merges, finalSyms) = Bpe.learnMerges(wv, k = 3)
    val pairList = merges.map(m => (m.left, m.right))
    // trained words: serving piece counts == the training position table's
    val served = Bpe.segment(corpus, "doc_id", "text", pairList)
      .groupBy("word_idx").agg(count(lit(1)).as("n"))
      .orderBy("word_idx").collect().map(_.getLong(1))
    val trained = finalSyms.groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = Seq("low", "low", "low", "lower", "lowest")
    assert(served.toSeq === words.map(trained))
    // a NOVEL word (never trained) still segments through the rules
    val novel = Seq((9L, "lowly")).toDF("doc_id", "text")
    val nv = Bpe.segment(novel, "doc_id", "text", pairList)
      .orderBy("piece_idx").collect().map(_.getString(3))
    assert(nv.mkString("") === "lowly")
    assert(nv.length < 5, s"the trained merges must apply: ${nv.toSeq}")
    // GPT-2 stack: byte-level pre-tokenizer composes and round-trips
    val docs = Seq((1L, "café low")).toDF("doc_id", "text")
    val seg = Bpe.segment(docs, "doc_id", "text", pairList,
      tokens = graft.llmops.VocabArtifact.byteLevel())
    val back = graft.llmops.VocabArtifact.detokenizeByteLevel(seg).collect()
    assert(back.head.getString(1) === "café low")
  }
}
