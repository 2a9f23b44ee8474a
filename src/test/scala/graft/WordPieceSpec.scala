package graft

import graft.llmops.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece: likelihood-scored training (NOT raw pair frequency), the
  * `##` marker algebra, greedy longest-match-first serving, and both
  * [UNK] paths — all on hand-computable planted corpora.
  */
class WordPieceSpec extends SparkTestBase {

  private def seg(docs: org.apache.spark.sql.DataFrame,
      vocab: Seq[String], maxWordLen: Int = 32) = {
    import spark.implicits._
    WordPiece.segment(docs, "doc_id", "text", vocab.toDF("piece"),
        maxWordLen = maxWordLen)
      .orderBy("id", "word_idx", "piece_idx")
      .collect().map(_.getAs[String]("piece")).toSeq
  }

  test("likelihood score beats raw frequency: rare-but-surprising pair wins") {
    import spark.implicits._
    // xy ×2: score(x,##y) = 2/(2·2) = 0.5
    // ab ×10, ac ×10: score(a,##b) = 10/(20·10) = 0.05 despite pf 10 ≫ 2
    val docs = Seq((1L, (Seq.fill(2)("xy") ++ Seq.fill(10)("ab") ++
      Seq.fill(10)("ac")).mkString(" "))).toDF("doc_id", "text")
    val (merges, _) =
      WordPiece.learnMerges(WordPiece.wordVocab(docs, "text"), 1)
    assert(merges.head.left == "x" && merges.head.right == "##y",
      s"got ${merges.head}")
    assert(merges.head.pairFreq == 2L)
    // the scaled-integer key: 2·10^15 / 4 = 5·10^14
    assert(merges.head.scoreKey == 500000000000000L)
  }

  test("merge products strip the continuation marker off the right side") {
    assert(WordPiece.mergedSym("a", "##b") == "ab")
    assert(WordPiece.mergedSym("##a", "##b") == "##ab")
    assert(WordPiece.mergedSym("ab", "##cd") == "abcd")
    // no marker on the right (word-initial right symbol can't occur in a
    // pair, but the algebra is total): pass through
    assert(WordPiece.mergedSym("a", "b") == "ab")
  }

  test("symbolization marks every non-initial character") {
    import spark.implicits._
    val vocab = Seq(("abc", 1L)).toDF("word", "freq")
    val syms = WordPiece.initialSyms(vocab).orderBy("i")
      .collect().map(_.getAs[String]("s")).toSeq
    assert(syms == Seq("a", "##b", "##c"))
  }

  test("serving is greedy longest-match-first, not shortest or optimal") {
    import spark.implicits._
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    // greedy takes abc (longest initial match) then ##d — even though
    // [a, ##bcd] also spans the word with fewer lookups
    assert(seg(docs, Seq("a", "abc", "##b", "##c", "##bcd", "##d")) ==
      Seq("abc", "##d"))
  }

  test("an initial-only piece cannot match mid-word (position classes)") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    // 'b' is in the vocab but only as an INITIAL piece; pos 2 needs ##b
    assert(seg(docs, Seq("a", "b")) == Seq(WordPiece.Unk))
    assert(seg(docs, Seq("a", "##b")) == Seq("a", "##b"))
  }

  test("uncovered character and over-length words collapse to [UNK] whole") {
    import spark.implicits._
    val docs = Seq((1L, "axb ab abcdef")).toDF("doc_id", "text")
    val vocab = Seq("a", "##b", "##x", "##c", "##d", "##e", "##f")
    // axb: a, ##x, ##b — covered; ab fine; abcdef exceeds maxWordLen 5
    assert(seg(docs, vocab, maxWordLen = 5) ==
      Seq("a", "##x", "##b", "a", "##b", WordPiece.Unk))
    // drop ##x from the vocab: axb dies WHOLE (not a partial [a, UNK, ##b])
    assert(seg(docs, vocab.filterNot(_ == "##x"), maxWordLen = 5) ==
      Seq(WordPiece.Unk, "a", "##b", WordPiece.Unk))
  }

  test("vocabTable: sorted alphabet first, then merge products in rank order") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val wv = WordPiece.wordVocab(docs, "text").localCheckpoint(true)
    val (merges, _) = WordPiece.learnMerges(wv, 1)
    val got = WordPiece.vocabTable(wv, merges).orderBy("id")
      .collect().map(r => (r.getAs[String]("piece"), r.getAs[Long]("id"))).toSeq
    assert(got == Seq(("##b", 0L), ("a", 1L), ("ab", 2L)))
  }

  test("trainer stops early when the vocabulary exhausts") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val (merges, syms) =
      WordPiece.learnMerges(WordPiece.wordVocab(docs, "text"), 10)
    assert(merges.size == 1 &&
      WordPiece.mergedSym(merges.head.left, merges.head.right) == "ab")
    assert(syms.count() == 1)
  }

  test("empty corpus: no merges, empty segmentation") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (merges, _) =
      WordPiece.learnMerges(WordPiece.wordVocab(empty, "text"), 3)
    assert(merges.isEmpty)
    assert(seg(empty, Seq("a")).isEmpty)
  }
}
