package graft

import graft.llmops.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // one document per stage, plus a quota trio and clean keepers
  private def corpus = Seq(
    // blocked AND too short — blocklist must win (stage order)
    (1L, "tiny", "badsrc"),
    // quality: 2 tokens < minTokens=5
    (2L, "tiny doc", "good"),
    // exact dups: 4 loses to 3
    (3L, "alpha bravo charlie delta echo foxtrot golf hotel", "good"),
    (4L, "alpha bravo charlie delta echo foxtrot golf hotel", "good"),
    // near dups (differ only in the last of 20 tokens): 6 loses to 5
    (5L, "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty", "good"),
    (6L, "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twentyone", "good"),
    // contaminated: shares a 5-gram with the bench doc
    (7L, "warmup words then gamma delta epsilon zeta ends here", "good"),
    // quota trio: distinct content, same source, quota = 2 -> one drops
    (8L, "red orange yellow green blue indigo violet", "quotasrc"),
    (9L, "monday tuesday wednesday thursday friday saturday sunday", "quotasrc"),
    (10L, "january february march april may june july august", "quotasrc")
  ).toDF("doc_id", "text", "source")

  private def bench = Seq(
    (100L, "prefix gamma delta epsilon zeta ends suffix tokens")
  ).toDF("doc_id", "text")

  private def blocked = Seq("badsrc").toDF("source")

  private def run() = Curation.ledger(
    corpus, "doc_id", "text", "source", bench, blocked, quota = 2)
    .collect().map(r => r.getLong(0) ->
      (r.getString(2), Option(r.getString(3)), r.getBoolean(4))).toMap

  test("every stage attributes its first failure; blocklist precedes quality") {
    val led = run()
    assert(led(1L)._1 == "blocked_source" && led(1L)._2.isEmpty)
    assert(led(2L) == (("quality", Some("too_short"), false)))
    assert(led(3L)._1 == "kept")
    assert(led(4L) == (("exact_dup", None, false)))
    assert(led(5L)._1 == "kept")
    assert(led(6L) == (("near_dup", None, false)))
    assert(led(7L) == (("contaminated", None, false)))
    val quotaTrio = Seq(8L, 9L, 10L).map(led(_)._1)
    assert(quotaTrio.count(_ == "kept") == 2 && quotaTrio.count(_ == "quota") == 1,
      s"quota trio got $quotaTrio")
    assert(led.values.forall(v => (v._1 == "kept") == v._3))
    assert(led.size == 10) // every input doc gets a verdict row
  }

  test("quota winners are the smallest key hashes (sourceQuota rule)") {
    val led = run()
    val hashes = Seq(8L, 9L, 10L).toDF("doc_id")
      .select(col("doc_id"),
        graft.llmops.PortableHash.hash52(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedDrop = hashes.maxBy(_._2)._1
    assert(led(expectedDrop)._1 == "quota")
  }

  test("empty blocklist and empty bench degrade those stages to no-ops") {
    val led = Curation.ledger(
      corpus, "doc_id", "text", "source", bench.limit(0),
      blocked.limit(0), quota = 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(led(1L) == "quality") // no longer blocked; its 1 token fails the gate
    assert(led(7L) == "kept")    // no bench, no contamination
    assert(Seq(8L, 9L, 10L).forall(led(_) == "kept")) // quota wide open
  }

  test("ledger diff across two real cascade runs classifies every planted mutation") {
    // corpus B mutates A one class at a time: doc 3 truncated (its
    // exact-dup partner 4 thereby recovers), doc 7 truncated so it
    // drops EARLIER in the cascade, doc 9 withdrawn, doc 11 new.
    // quota = 5 on both runs keeps the quota stage out of the picture
    // so every change is the planted one.
    val corpusB = Seq(
      (1L, "tiny", "badsrc"),
      (2L, "tiny doc", "good"),
      (3L, "now small", "good"), // kept in A -> quality in B: regressed
      (4L, "alpha bravo charlie delta echo foxtrot golf hotel", "good"), // dup partner gone: recovered
      (5L, "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty", "good"),
      (6L, "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twentyone", "good"),
      (7L, "ct tiny", "good"), // contaminated in A -> quality in B: restaged
      (8L, "red orange yellow green blue indigo violet", "quotasrc"),
      (10L, "january february march april may june july august", "quotasrc"),
      (11L, "brand new clean document with plenty distinct tokens", "good")
    ).toDF("doc_id", "text", "source")
    def led(c: org.apache.spark.sql.DataFrame) =
      Curation.ledger(c, "doc_id", "text", "source", bench, blocked, quota = 5)
    val diff = Curation.ledgerDiff(led(corpus), led(corpusB))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), Option(r.getString(3)), r.getString(4))).toMap
    assert(diff(3L) === ((Some("kept"), Some("quality"), "regressed")))
    assert(diff(4L) === ((Some("exact_dup"), Some("kept"), "recovered")))
    assert(diff(7L) === ((Some("contaminated"), Some("quality"), "restaged")))
    assert(diff(9L) === ((Some("kept"), None, "removed")))
    assert(diff(11L) === ((None, Some("kept"), "added")))
    assert(Seq(1L, 2L, 5L, 6L, 8L, 10L).forall(diff(_)._3 == "same"),
      s"unmutated docs must diff as same: $diff")
    assert(diff.size === 11)
  }
}
