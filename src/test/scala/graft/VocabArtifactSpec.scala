package graft

import graft.llmops.{Bpe, Unigram, VocabArtifact}
import org.apache.spark.sql.functions._

/** Tokenizer artifact export/import: byte-pinned file forms (the
  * TfRecordFrame/TokenBin byte-pin precedent), export→import→serve round
  * trips that must reproduce native segmentation decision-for-decision,
  * hand-assembled FOREIGN files (the Xlsx/PDF discipline), and the
  * reversible-whitespace detokenize law.
  */
class VocabArtifactSpec extends SparkTestBase {

  test("unigram tokenizer.json bytes are pinned: unk at 0, rank ids, micro-grid scores, Metaspace declared") {
    import spark.implicits._
    val vocab = Seq(
      ("a", 1L, 5L, 200000L),
      ("ab", 2L, 3L, 1500000L),
      ("b", 1L, 0L, 2000000L)
    ).toDF("piece", "n_chars", "cnt", "nll_micro")
    val dir = java.nio.file.Files.createTempDirectory("vocab_pin").toString
    val m = VocabArtifact.writeUnigramJson(vocab, s"$dir/tokenizer.json").collect()
    assert(m.length === 1 && m.head.getAs[Long]("n_pieces") === 4L)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tokenizer.json"))
    val expected =
      "{\"version\":\"1.0\",\"truncation\":null,\"padding\":null," +
        "\"added_tokens\":[],\"normalizer\":null," +
        "\"pre_tokenizer\":{\"type\":\"Metaspace\",\"replacement\":\"▁\",\"prepend_scheme\":\"always\",\"split\":true}," +
        "\"post_processor\":null," +
        "\"decoder\":{\"type\":\"Metaspace\",\"replacement\":\"▁\",\"prepend_scheme\":\"always\",\"split\":true}," +
        "\"model\":{\"type\":\"Unigram\",\"unk_id\":0,\"vocab\":[" +
        "[\"<unk>\",0.0],[\"a\",-0.200000],[\"ab\",-1.500000],[\"b\",-2.000000]]}}"
    assert(new String(bytes, "UTF-8") === expected)
    // manifest md5 is the md5 of the shipped bytes
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    assert(m.head.getAs[String]("content_md5") === md5)
  }

  test("export → import → segment reproduces native segmentation decision-for-decision (metaspace)") {
    import spark.implicits._
    val docs = Seq((1L, "banana banana band bandana"),
      (2L, "nab nab banana xz")).toDF("doc_id", "text")
    val toks = VocabArtifact.metaspace()
    val vocab = Unigram.unigramVocab(docs, "doc_id", "text", vocabSize = 8,
      rounds = 2, maxPieceLen = 3, maxWordLen = 12, tokens = toks)
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("vocab_rt").toString
    VocabArtifact.writeUnigramJson(vocab, s"$dir/tokenizer.json")
    val imported = VocabArtifact.readUnigramJson(spark, s"$dir/tokenizer.json")
      .localCheckpoint(true)
    // ids are dense, unk is row 0, every trained piece came back
    assert(imported.filter(col("unk")).select("id").head().getLong(0) === 0L)
    assert(imported.count() === vocab.count() + 1)
    def segSet(v: org.apache.spark.sql.DataFrame) =
      Unigram.segment(docs, "doc_id", "text", v, maxPieceLen = 3,
        maxWordLen = 12, tokens = toks, checkCoverage = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    assert(segSet(imported.filter(!col("unk")).select("piece", "nll_micro"))
      === segSet(vocab))
  }

  test("FOREIGN tokenizer.json parses: whitespace, escapes, \\uXXXX, field order; missing singles fail segment loudly") {
    import spark.implicits._
    val foreign =
      """
      {
        "model": {
          "vocab": [ ["<unk>", 0.0],
                     ["▁", -0.5],
                     ["x", -1.25],
                     ["quote\"slash\\", -2.0],
                     ["tab\there", -3.5e0] ],
          "unk_id": 0,
          "type": "Unigram"
        },
        "version": "1.0"
      }
      """
    val dir = java.nio.file.Files.createTempDirectory("vocab_foreign").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "tokenizer.json"),
      foreign.getBytes("UTF-8"))
    val got = VocabArtifact.readUnigramJson(spark, s"$dir/tokenizer.json")
      .orderBy("id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(("<unk>", 0L, true), ("▁", 500000L, false),
      ("x", 1250000L, false), ("quote\"slash\\", 2000000L, false),
      ("tab\there", 3500000L, false)))
    // serving with a vocab that lacks singles for the corpus must fail
    // LOUDLY under checkCoverage (the k=1 fallback would otherwise emit
    // out-of-vocab pieces silently)
    val docs = Seq((1L, "xy")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Unigram.segment(docs, "doc_id", "text",
        VocabArtifact.readUnigramJson(spark, s"$dir/tokenizer.json")
          .filter(!col("unk")).select("piece", "nll_micro"),
        tokens = VocabArtifact.metaspace(), checkCoverage = true)
    }
    assert(ex.getMessage.contains("coverage"))
    // malformed JSON names the offset
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      "{\"model\": oops}".getBytes("UTF-8"))
    val ex2 = intercept[IllegalArgumentException] {
      VocabArtifact.readUnigramJson(spark, s"$dir/bad.json")
    }
    assert(ex2.getMessage.contains("offset"))
  }

  test("detokenize inverts metaspace segmentation: whitespace normalizes, words reassemble, truncation is the documented limit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  the   quick\tbrown\nfox  "),
      (2L, "supercalifragilisticexpialidocious word"), // 34 chars: truncates
      (3L, "plain text")
    ).toDF("doc_id", "text")
    val toks = VocabArtifact.metaspace()
    val vocab = Unigram.unigramVocab(docs, "doc_id", "text", vocabSize = 16,
      rounds = 1, maxPieceLen = 3, maxWordLen = 24, tokens = toks)
    val seg = Unigram.segment(docs, "doc_id", "text", vocab,
      maxPieceLen = 3, maxWordLen = 24, tokens = toks)
    val back = VocabArtifact.detokenize(seg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(1L) === "the quick brown fox")
    // maxWordLen 24 minus the marker = 23 chars of the original word
    assert(back(2L) === "supercalifragilisticexp word")
    assert(back(3L) === "plain text")
  }

  test(".vocab TSV: byte-pin, round trip, foreign SentencePiece-style file, malformed lines loud") {
    import spark.implicits._
    val vocab = Seq(
      ("a", 1L, 5L, 200000L),
      ("ab", 2L, 3L, 1500000L)
    ).toDF("piece", "n_chars", "cnt", "nll_micro")
    val dir = java.nio.file.Files.createTempDirectory("vocab_tsv").toString
    val m = VocabArtifact.writeUnigramTsv(vocab, s"$dir/sp.vocab").collect()
    assert(m.head.getAs[Long]("n_pieces") === 3L)
    val bytes = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "sp.vocab")), "UTF-8")
    assert(bytes === "<unk>\t0.0\na\t-0.200000\nab\t-1.500000\n")
    // round trip: id order, unk flag, micro grid exact
    val back = VocabArtifact.readUnigramTsv(spark, s"$dir/sp.vocab")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(back.toSeq === Seq((0L, "<unk>", 0L, true),
      (1L, "a", 200000L, false), (2L, "ab", 1500000L, false)))
    // a real SP-style foreign file: %g-ish scores, CRLF, trailing blank
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "foreign.vocab"),
      "<unk>\t0\r\n▁the\t-2.5\r\nx\t-3\r\n\r\n".getBytes("UTF-8"))
    val f = VocabArtifact.readUnigramTsv(spark, s"$dir/foreign.vocab")
      .orderBy("id").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(f.toSeq === Seq(("<unk>", 0L), ("▁the", 2500000L), ("x", 3000000L)))
    // malformed: no tab / non-numeric score — loud, line-numbered
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.vocab"),
      "<unk>\t0\nnotab\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      VocabArtifact.readUnigramTsv(spark, s"$dir/bad.vocab") }
    assert(e1.getMessage.contains("line 2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad2.vocab"),
      "<unk>\tzero\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      VocabArtifact.readUnigramTsv(spark, s"$dir/bad2.vocab") }
    assert(e2.getMessage.contains("not a number"))
    // a piece containing a TAB is unrepresentable — the writer refuses
    val tabby = Seq(("a\tb", 3L, 1L, 100000L))
      .toDF("piece", "n_chars", "cnt", "nll_micro")
    val e3 = intercept[IllegalArgumentException] {
      VocabArtifact.writeUnigramTsv(tabby, s"$dir/tabby.vocab") }
    assert(e3.getMessage.contains("TAB"))
  }

  test("BPE artifact: vocab.json + merges.txt byte-pin, import replays to the exact post-merge table") {
    import spark.implicits._
    val corpus = Seq((1L, "low low low lower lowest newer newest new"))
      .toDF("doc_id", "text")
    val wv = Bpe.wordVocab(corpus, "text").localCheckpoint(true)
    val (merges, finalSyms) = Bpe.learnMerges(wv, k = 4)
    assert(merges.length === 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    val manifest = VocabArtifact.writeBpeFiles(wv, merges, dir).collect()
    assert(manifest.length === 2)

    // merges.txt byte-pin: header + one "lhs rhs" line per rank
    val mt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "merges.txt")), "UTF-8")
    val expectedMt = "#version: 0.2\n" +
      merges.map(m => s"${m.left} ${m.right}\n").mkString
    assert(mt === expectedMt)

    // vocab.json: alphabet ids 0.. sorted, then merge products in rank order
    val vocabIds = VocabArtifact.readBpeVocab(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val alphabet = "lowerstn".toSeq.map(_.toString).distinct.sorted
    alphabet.zipWithIndex.foreach { case (a, i) =>
      assert(vocabIds(a) === i.toLong, s"alphabet '$a'")
    }
    merges.zipWithIndex.foreach { case (m, i) =>
      assert(vocabIds(m.left + m.right) === (alphabet.length + i).toLong)
    }

    // import + replay reproduces the trained post-merge position table
    val back = VocabArtifact.readBpeMerges(spark, dir)
      .orderBy("mrank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(back.toSeq === merges.map(m => (m.left, m.right)))
    val replayed = Bpe.applyMerges(wv, back.toSeq)
    def tbl(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "freq", "i", "s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    assert(tbl(replayed) === tbl(finalSyms))

    // a mangled merges line fails loudly, naming the line
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "merges.txt"),
      "#version: 0.2\nlo w\nbroken_line_without_space\n".getBytes("UTF-8"))
    val ex = intercept[IllegalArgumentException] {
      VocabArtifact.readBpeMerges(spark, dir)
    }
    assert(ex.getMessage.contains("line 2"))
  }

  test("BPE tokenizer.json: byte-pin, round trip to the exact tables, foreign pair-form merges, inconsistency loud") {
    import spark.implicits._
    val corpus = Seq((1L, "ab ab ab ac")).toDF("doc_id", "text")
    val wv = Bpe.wordVocab(corpus, "text").localCheckpoint(true)
    val (merges, _) = Bpe.learnMerges(wv, k = 1)
    assert(merges.length === 1 && merges.head.left == "a" &&
      merges.head.right == "b")
    val dir = java.nio.file.Files.createTempDirectory("bpe_json").toString
    val m = VocabArtifact.writeBpeJson(wv, merges, s"$dir/tokenizer.json")
      .collect()
    assert(m.length === 1 && m.head.getAs[Long]("n_pieces") === 4L)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tokenizer.json")), "UTF-8")
    val expected =
      "{\"version\":\"1.0\",\"truncation\":null,\"padding\":null," +
        "\"added_tokens\":[],\"normalizer\":null," +
        "\"pre_tokenizer\":{\"type\":\"WhitespaceSplit\"}," +
        "\"post_processor\":null,\"decoder\":null," +
        "\"model\":{\"type\":\"BPE\",\"dropout\":null,\"unk_token\":null," +
        "\"continuing_subword_prefix\":null,\"end_of_word_suffix\":null," +
        "\"fuse_unk\":false,\"byte_fallback\":false," +
        "\"vocab\":{\"a\":0,\"b\":1,\"c\":2,\"ab\":3},\"merges\":[\"a b\"]}}"
    assert(txt === expected)
    // round trip: tables identical to the artifact table + merge list
    val (v, mg) = VocabArtifact.readBpeJson(spark, s"$dir/tokenizer.json")
    assert(v.orderBy("id").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq ===
      VocabArtifact.bpeArtifactTable(wv, merges).orderBy("id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(mg.collect().map(r => (r.getString(1), r.getString(2))).toSeq ===
      Seq(("a", "b")))
    // foreign file: pair-form merges, reordered fields, whitespace
    val foreign =
      """{ "model": { "merges": [["x", "y"]], "type": "BPE",
        |  "vocab": {"x": 0, "y": 1, "xy": 2} } }""".stripMargin
    val fp = java.nio.file.Paths.get(dir, "foreign.json")
    java.nio.file.Files.write(fp, foreign.getBytes("UTF-8"))
    val (fv, fm) = VocabArtifact.readBpeJson(spark, fp.toString)
    assert(fv.count() === 3 &&
      fm.collect().map(r => (r.getString(1), r.getString(2))).toSeq ===
        Seq(("x", "y")))
    // a merge referencing a missing piece fails loudly
    val bad = """{"model":{"type":"BPE","vocab":{"x":0,"y":1},"merges":["x y"]}}"""
    val bp = java.nio.file.Paths.get(dir, "bad.json")
    java.nio.file.Files.write(bp, bad.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      VocabArtifact.readBpeJson(spark, bp.toString))
    assert(e.getMessage.contains("missing from model.vocab"))
    // a Unigram file refuses through the BPE reader
    VocabArtifact.writeUnigramJson(
      Seq(("a", 1L, 5L, 200000L)).toDF("piece", "n_chars", "cnt", "nll_micro"),
      s"$dir/uni.json")
    val e2 = intercept[IllegalArgumentException](
      VocabArtifact.readBpeJson(spark, s"$dir/uni.json"))
    assert(e2.getMessage.contains("must be BPE"))
  }

  test("control tokens: reserved ids, added_tokens declared, import flags them, serving withholds them, collisions loud") {
    import spark.implicits._
    val vocab = Seq(
      ("a", 1L, 5L, 200000L),
      ("b", 1L, 3L, 1500000L)
    ).toDF("piece", "n_chars", "cnt", "nll_micro")
    val dir = java.nio.file.Files.createTempDirectory("vocab_ctl").toString
    VocabArtifact.writeUnigramJson(vocab, s"$dir/tokenizer.json",
      controls = Seq("<s>", "</s>"))
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tokenizer.json")), "UTF-8")
    // unk + both controls declared special; vocab order unk,<s>,</s>,a,b
    assert(txt.contains("\"added_tokens\":[" +
      "{\"id\":0,\"content\":\"<unk>\",\"single_word\":false,\"lstrip\":false,\"rstrip\":false,\"normalized\":false,\"special\":true}," +
      "{\"id\":1,\"content\":\"<s>\",\"single_word\":false,\"lstrip\":false,\"rstrip\":false,\"normalized\":false,\"special\":true}," +
      "{\"id\":2,\"content\":\"</s>\",\"single_word\":false,\"lstrip\":false,\"rstrip\":false,\"normalized\":false,\"special\":true}]"))
    assert(txt.contains(
      "\"vocab\":[[\"<unk>\",0.0],[\"<s>\",0.0],[\"</s>\",0.0],[\"a\",-0.200000],[\"b\",-1.500000]]"))
    val imported = VocabArtifact.readUnigramJson(spark, s"$dir/tokenizer.json")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(3), r.getBoolean(4)))
    assert(imported.toSeq === Seq(
      (0L, "<unk>", true, false), (1L, "<s>", false, true),
      (2L, "</s>", false, true), (3L, "a", false, false),
      (4L, "b", false, false)))
    // serving withholds unk AND controls — only trained pieces remain
    val servable = VocabArtifact.servableVocab(
        VocabArtifact.readUnigramJson(spark, s"$dir/tokenizer.json"))
      .collect().map(_.getString(0)).toSet
    assert(servable === Set("a", "b"))
    // a trained piece colliding with a control fails the export loudly
    val colliding = Seq(("<s>", 3L, 9L, 100000L), ("a", 1L, 5L, 200000L))
      .toDF("piece", "n_chars", "cnt", "nll_micro")
    val ex2 = intercept[IllegalArgumentException] {
      VocabArtifact.writeUnigramJson(colliding, s"$dir/t2.json",
        controls = Seq("<s>"))
    }
    assert(ex2.getMessage.contains("control"))
    // TSV sibling carries the same reserved rows
    VocabArtifact.writeUnigramTsv(vocab, s"$dir/sp.vocab",
      controls = Seq("<s>", "</s>"))
    val tsv = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "sp.vocab")), "UTF-8")
    assert(tsv === "<unk>\t0.0\n<s>\t0.0\n</s>\t0.0\na\t-0.200000\nb\t-1.500000\n")
  }

  test("byte fallback: OOV chars emit UTF-8 byte pieces, covered neighbors keep their pieces, all-OOV words survive") {
    import spark.implicits._
    val vocab = Seq(("ll", 900000L), ("h", 3000000L), ("e", 3000000L),
      ("l", 3100000L), ("o", 3000000L), ("x", 3000000L))
      .toDF("piece", "nll")
    val docs = Seq((1L, "héllo"), (2L, "x你x"), (3L, "你好"))
      .toDF("id", "text")
    val got = Unigram.segment(docs, "id", "text", vocab, maxPieceLen = 3,
        byteFallback = true)
      .orderBy("id", "word_idx", "piece_idx")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    // é = C3 A9; 你 = E4 BD A0; 好 = E5 A5 BD
    assert(got.toSeq === Seq(
      (1L, "h"), (1L, "<0xC3>"), (1L, "<0xA9>"), (1L, "ll"), (1L, "o"),
      // the in-vocab neighbor law: x emits its OWN piece, never absorbed
      (2L, "x"), (2L, "<0xE4>"), (2L, "<0xBD>"), (2L, "<0xA0>"), (2L, "x"),
      // the left-join law: a word NO vocab piece touches still segments
      (3L, "<0xE4>"), (3L, "<0xBD>"), (3L, "<0xA0>"),
      (3L, "<0xE5>"), (3L, "<0xA5>"), (3L, "<0xBD>")))
    // piece_idx renumbers densely inside each word
    val idx = Unigram.segment(docs, "id", "text", vocab, maxPieceLen = 3,
        byteFallback = true)
      .filter(col("id") === 1L).orderBy("piece_idx")
      .collect().map(_.getLong(2))
    assert(idx.toSeq === (0L until 5L))
  }

  test("byte fallback on a full-coverage vocab equals the plain path (behavior-neutral when coverage is total)") {
    import spark.implicits._
    val docs = Seq((1L, "abba cab"), (2L, "bac")).toDF("id", "text")
    val vocab = Unigram.unigramVocab(docs, "id", "text", vocabSize = 4)
    def run(bf: Boolean) =
      Unigram.segment(docs, "id", "text", vocab, byteFallback = bf)
        .orderBy("id", "word_idx", "piece_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    assert(run(bf = true) === run(bf = false))
  }

  test("byte fallback round trip: metaspace segment -> detokenize(byteFallback) recovers the original text") {
    import spark.implicits._
    // vocab covers ascii letters + the metaspace marker, NOT é/ö/CJK
    val letters = ("abcdefghijklmnopqrstuvwxyz" + VocabArtifact.Marker)
      .map(c => (c.toString, 3000000L))
    val vocab = letters.toDF("piece", "nll")
    val docs = Seq((1L, "héllo wörld"), (2L, "café 你好 ok")).toDF("id", "text")
    val seg = Unigram.segment(docs, "id", "text", vocab, maxPieceLen = 3,
      tokens = VocabArtifact.metaspace(), byteFallback = true)
    val back = VocabArtifact.detokenize(seg, byteFallback = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((1L, "héllo wörld"), (2L, "café 你好 ok")))
    // an OOV metaspace marker itself byte-expands and still decodes:
    // drop ▁ from the vocab, same round trip
    val noMarker = letters.filterNot(_._1 == VocabArtifact.Marker)
      .toDF("piece", "nll")
    val seg2 = Unigram.segment(docs, "id", "text", noMarker, maxPieceLen = 3,
      tokens = VocabArtifact.metaspace(), byteFallback = true)
    val back2 = VocabArtifact.detokenize(seg2, byteFallback = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back2.toSeq === Seq((1L, "héllo wörld"), (2L, "café 你好 ok")))
  }

  test("byte-level: Ġ pin, table bijective, encode/decode round trip any script, BPE trains over it, detokenize recovers") {
    import spark.implicits._
    // the table is the published GPT-2 bytes_to_unicode: 256 distinct
    // chars, space lands on Ġ, printables map to themselves
    assert(VocabArtifact.ByteLevelTable.size === 256)
    assert(VocabArtifact.ByteLevelTable.distinct.size === 256)
    assert(VocabArtifact.ByteLevelTable(32) === "Ġ")
    assert(VocabArtifact.ByteLevelTable('a'.toInt) === "a")
    assert(VocabArtifact.ByteLevelTable(0) === "Ā")   // 256 + 0
    val docs = Seq((1L, "the café 你好 emoji 😀 end"))
      .toDF("id", "text")
    val enc = docs.select(posexplode(VocabArtifact.byteLevel()(col("text")))
      .as(Seq("i", "btok"))).collect().map(_.getString(1))
    assert(enc(0) === "Ġthe")
    assert(enc(1) === "ĠcafÃ©")          // é = C3 A9 -> Ã ©
    // round trip through decode recovers every script incl. the emoji
    val rt = docs.select(VocabArtifact.byteLevelDecode(
      VocabArtifact.byteLevelEncode(col("text"))).as("t")).collect()
    assert(rt.head.getString(0) === "the café 你好 emoji 😀 end")
    // BPE trains over byte-level words and its merges decode sanely
    val bv = docs.select(explode(VocabArtifact.byteLevel()(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val (merges, _) = graft.llmops.Bpe.learnMerges(bv, k = 2)
    assert(merges.nonEmpty)
    // detokenizeByteLevel inverts a byte-level segmentation
    val seg = docs.select(col("id"),
        posexplode(VocabArtifact.byteLevel()(col("text")))
          .as(Seq("word_idx", "piece")))
      .withColumn("word_idx", col("word_idx").cast("long"))
      .withColumn("piece_idx", lit(0L))
    val back = VocabArtifact.detokenizeByteLevel(seg).collect()
    assert(back.head.getString(1) === "the café 你好 emoji 😀 end")
  }

  test("byte-fallback artifact: ids unk,controls,bytes,learned; byte_fallback declared; import flags; serving withholds") {
    import spark.implicits._
    val vocab = Seq(("a", 1L, 5L, 200000L), ("b", 1L, 3L, 1500000L))
      .toDF("piece", "n_chars", "cnt", "nll_micro")
    val table = VocabArtifact.unigramArtifactTable(vocab,
      controls = Seq("<s>", "</s>"), byteFallback = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(table.length === 1 + 2 + 256 + 2)
    assert(table(0) === (0L, "<unk>"))
    assert(table(1) === (1L, "<s>") && table(2) === (2L, "</s>"))
    assert(table(3) === (3L, "<0x00>") && table(258) === (258L, "<0xFF>"))
    assert(table(259) === (259L, "a") && table(260) === (260L, "b"))
    val dir = java.nio.file.Files.createTempDirectory("vocab_bf").toString
    VocabArtifact.writeUnigramJson(vocab, s"$dir/tokenizer.json",
      controls = Seq("<s>", "</s>"), byteFallback = true)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tokenizer.json")), "UTF-8")
    assert(txt.contains("\"byte_fallback\":true"))
    assert(txt.contains("[\"<0x00>\",0.0]") && txt.contains("[\"<0xFF>\",0.0]"))
    // byte rows are vocab rows, NOT added_tokens
    assert(!txt.contains("\"content\":\"<0x00>\""))
    val imported = VocabArtifact.readUnigramJson(spark, s"$dir/tokenizer.json")
    val byteRows = imported.filter(col("byte")).count()
    assert(byteRows === 256L)
    val servable = VocabArtifact.servableVocab(imported)
      .collect().map(_.getString(0)).toSet
    assert(servable === Set("a", "b"))
    // without the byte_fallback flag, <0xXX>-shaped pieces stay ordinary
    VocabArtifact.writeUnigramJson(vocab, s"$dir/plain.json")
    val plain = VocabArtifact.readUnigramJson(spark, s"$dir/plain.json")
    assert(plain.filter(col("byte")).count() === 0L)
  }

  test("vocab.txt: byte-pin with specials prelude, round trip serves identically, foreign BERT file, blank line loud") {
    import spark.implicits._
    import graft.llmops.WordPiece
    val docs = Seq((1L, "ab ab ab ba")).toDF("doc_id", "text")
    val wv = WordPiece.wordVocab(docs, "text").localCheckpoint(true)
    val (merges, _) = WordPiece.learnMerges(wv, 1)
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toString
    val m = VocabArtifact.writeWordPieceVocabTxt(wv, merges, s"$dir/vocab.txt")
      .collect().head
    // alphabet {##a, ##b, a, b} sorted + 1 merge product after 5 specials
    assert(m.getAs[Long]("n_pieces") === 10L)
    val bytes = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "vocab.txt")), "UTF-8")
    assert(bytes ===
      "[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\n##a\n##b\na\nb\n" +
        WordPiece.mergedSym(merges.head.left, merges.head.right) + "\n")
    // round trip: line number = id; serving with the imported vocab ≡
    // serving with the native table (specials riding along are inert here)
    val imported = VocabArtifact.readWordPieceVocabTxt(spark, s"$dir/vocab.txt")
    assert(imported.orderBy("id").collect().map(_.getString(1)).take(6).toSeq ===
      Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "##a"))
    val serveDocs = Seq((1L, "ab ba abba xa")).toDF("doc_id", "text")
    def segAll(v: org.apache.spark.sql.DataFrame) =
      WordPiece.segment(serveDocs, "doc_id", "text", v)
        .orderBy("id", "word_idx", "piece_idx")
        .collect().map(_.getAs[String]("piece")).toSeq
    assert(segAll(imported) === segAll(WordPiece.vocabTable(wv, merges)))
    // hand-assembled FOREIGN file (CRLF, no specials — a bare BERT vocab)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "foreign.txt"),
      "he\r\n##llo\r\n##l\r\n##o\r\n".getBytes("UTF-8"))
    val f = VocabArtifact.readWordPieceVocabTxt(spark, s"$dir/foreign.txt")
    val fseg = WordPiece.segment(Seq((1L, "hello")).toDF("doc_id", "text"),
        "doc_id", "text", f)
      .orderBy("piece_idx").collect().map(_.getAs[String]("piece")).toSeq
    assert(fseg === Seq("he", "##llo"))
    // torn/foreign file with an interior blank line — loud
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "torn.txt"),
      "a\n\nb\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      VocabArtifact.readWordPieceVocabTxt(spark, s"$dir/torn.txt") }
    assert(e.getMessage.contains("line 2"))
    // a trained piece colliding with a special — the writer refuses
    val e2 = intercept[IllegalArgumentException] {
      VocabArtifact.writeWordPieceVocabTxt(wv, merges, s"$dir/clash.txt",
        specials = Seq("a")) }
    assert(e2.getMessage.contains("special"))
  }

  test("WordPiece tokenizer.json: byte-pin, round trip serves identically, foreign file + loud matrix") {
    import spark.implicits._
    import graft.llmops.WordPiece
    val docs = Seq((1L, "ab ab ab ba")).toDF("doc_id", "text")
    val wv = WordPiece.wordVocab(docs, "text").localCheckpoint(true)
    val (merges, _) = WordPiece.learnMerges(wv, 1)
    val dir = java.nio.file.Files.createTempDirectory("wp_json").toString
    val m = VocabArtifact.writeWordPieceJson(wv, merges, s"$dir/t.json")
      .collect().head
    assert(m.getAs[Long]("n_pieces") === 10L)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "t.json")), "UTF-8")
    assert(text.contains("\"model\":{\"type\":\"WordPiece\",\"unk_token\":\"[UNK]\""))
    assert(text.contains("\"continuing_subword_prefix\":\"##\""))
    assert(text.contains("\"max_input_chars_per_word\":32"))
    assert(text.contains("\"vocab\":{\"[PAD]\":0,\"[UNK]\":1,\"[CLS]\":2," +
      "\"[SEP]\":3,\"[MASK]\":4,\"##a\":5,\"##b\":6,\"a\":7,\"b\":8,\"ba\":9}"))
    assert(text.contains("\"content\":\"[MASK]\"") &&
      text.contains("\"special\":true"))
    // round trip: imported vocab serves segment identically to native
    val (imported, unk, maxChars) =
      VocabArtifact.readWordPieceJson(spark, s"$dir/t.json")
    assert(unk === "[UNK]" && maxChars === 32)
    val serveDocs = Seq((1L, "ab ba abba xa")).toDF("doc_id", "text")
    def segAll(v: org.apache.spark.sql.DataFrame) =
      WordPiece.segment(serveDocs, "doc_id", "text", v, maxWordLen = maxChars)
        .orderBy("id", "word_idx", "piece_idx")
        .collect().map(_.getAs[String]("piece")).toSeq
    assert(segAll(imported) === segAll(WordPiece.vocabTable(wv, merges)))
    // a FOREIGN hand-written file (field order shuffled, whitespace)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.json"),
      """{ "model": { "vocab": {"he": 0, "##llo": 1},
        "max_input_chars_per_word": 100,
        "continuing_subword_prefix": "##",
        "unk_token": "he", "type": "WordPiece" } }""".getBytes("UTF-8"))
    val (fv, funk, fmax) = VocabArtifact.readWordPieceJson(spark, s"$dir/f.json")
    assert(funk === "he" && fmax === 100 && fv.count() === 2L)
    // loud matrix: wrong type, foreign prefix, missing unk
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b1.json"),
      """{"model":{"type":"BPE","vocab":{}}}""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      VocabArtifact.readWordPieceJson(spark, s"$dir/b1.json"))
      .getMessage.contains("WordPiece"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b2.json"),
      ("""{"model":{"type":"WordPiece","unk_token":"[UNK]","continuing_subword_prefix":"++",""" +
        """"max_input_chars_per_word":5,"vocab":{"[UNK]":0}}}""").getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      VocabArtifact.readWordPieceJson(spark, s"$dir/b2.json"))
      .getMessage.contains("##"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b3.json"),
      ("""{"model":{"type":"WordPiece","unk_token":"[UNK]","continuing_subword_prefix":"##",""" +
        """"max_input_chars_per_word":5,"vocab":{"x":0}}}""").getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      VocabArtifact.readWordPieceJson(spark, s"$dir/b3.json"))
      .getMessage.contains("not in model.vocab"))
    // writer refuses specials without the unk token
    assert(intercept[IllegalArgumentException](
      VocabArtifact.writeWordPieceJson(wv, merges, s"$dir/nounk.json",
        specials = Seq("[PAD]"))).getMessage.contains("unk"))
  }
}
