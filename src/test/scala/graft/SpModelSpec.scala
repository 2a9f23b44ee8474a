package graft

import graft.llmops.{SpModel, Unigram, VocabArtifact}
import org.apache.spark.sql.functions._

/** SentencePiece ModelProto: byte-pinned wire form, write→read round
  * trip with all piece types, a hand-assembled FOREIGN file with
  * trainer_spec/normalizer_spec and unknown fields (all skipped), the
  * float32 precision statement, and export→import→segment ≡ native.
  */
class SpModelSpec extends SparkTestBase {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/sp.model"

  private def hexBytes(hx: String): Array[Byte] =
    hx.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("byte-pin: tags, varint lengths, float32 LE scores, omitted NORMAL type") {
    import spark.implicits._
    val vocab = Seq(("ab", 5L, 1500000L), ("c", 3L, 500000L))
      .toDF("piece", "cnt", "nll_micro")
    val path = tmp("sp_pin")
    val m = SpModel.writeSpModel(vocab, path, controls = Seq("<s>")).collect().head
    assert(m.getAs[Long]("n_pieces") === 4L)
    val got = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val expected = hexBytes(
      // <unk>, score 0.0f, type UNKNOWN=2
      "0a0e 0a05 3c756e6b3e 15 00000000 18 02" +
        // <s>, score 0.0f, type CONTROL=3
        "0a0c 0a03 3c733e 15 00000000 18 03" +
        // ab, score -1.5f (bits bfc00000, LE), type omitted (NORMAL)
        "0a09 0a02 6162 15 0000c0bf" +
        // c, score -0.5f (bits bf000000, LE)
        "0a08 0a01 63 15 000000bf")
    assert(got.toSeq === expected.toSeq)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(expected)
      .map("%02x".format(_)).mkString
    assert(m.getAs[String]("content_md5") === md5)
  }

  test("round trip: ids, pieces, micro scores and all three flags survive") {
    import spark.implicits._
    val vocab = Seq(("he", 9L, 2302585L), ("llo", 4L, 3218876L),
        ("x", 1L, 12500000L))
      .toDF("piece", "cnt", "nll_micro")
    val path = tmp("sp_rt")
    SpModel.writeSpModel(vocab, path, controls = Seq("<s>", "</s>"),
      byteFallback = true)
    val back = SpModel.readSpModel(spark, path).orderBy("id").collect()
    assert(back.length === 1 + 2 + 256 + 3)
    assert(back(0).getAs[String]("piece") === "<unk>" &&
      back(0).getAs[Boolean]("unk"))
    assert(back(1).getAs[String]("piece") === "<s>" &&
      back(1).getAs[Boolean]("control"))
    assert(back(2).getAs[String]("piece") === "</s>" &&
      back(2).getAs[Boolean]("control"))
    assert(back(3).getAs[String]("piece") === "<0x00>" &&
      back(3).getAs[Boolean]("byte"))
    assert(back(258).getAs[String]("piece") === "<0xFF>" &&
      back(258).getAs[Boolean]("byte"))
    // trained pieces at cnt-desc rank, nll through the float32 walk
    val trained = back.drop(259)
    assert(trained.map(_.getAs[String]("piece")).toSeq === Seq("he", "llo", "x"))
    def f32(nll: Long): Long = math.round((-((-nll).toDouble / 1e6).toFloat).toDouble * 1e6)
    assert(trained.map(_.getAs[Long]("nll_micro")).toSeq ===
      Seq(f32(2302585L), f32(3218876L), f32(12500000L)))
    // |score| < 16 → the walk is exact
    assert(trained.map(_.getAs[Long]("nll_micro")).toSeq ===
      Seq(2302585L, 3218876L, 12500000L))
    assert(trained.forall(r => !r.getAs[Boolean]("unk") &&
      !r.getAs[Boolean]("control") && !r.getAs[Boolean]("byte")))
  }

  test("FOREIGN file: trainer_spec/normalizer_spec and unknown fields skip; " +
      "USER_DEFINED maps to control") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(xs: Int*): Unit = xs.foreach(bos.write)
    // trainer_spec (field 2, length-delimited): junk submessage
    w(0x12, 0x04, 0x08, 0x01, 0x20, 0x28)
    // one piece: "<unk>" score 0 type UNKNOWN + an unknown fixed64 field
    w(0x0a, 0x17, 0x0a, 0x05); bos.write("<unk>".getBytes("UTF-8"))
    w(0x15, 0, 0, 0, 0, 0x18, 0x02)
    w(0x39, 1, 2, 3, 4, 5, 6, 7, 8) // field 7 wire type 1 inside the piece
    // a USER_DEFINED piece "<sep>" score -1.0f
    w(0x0a, 0x0e, 0x0a, 0x05); bos.write("<sep>".getBytes("UTF-8"))
    w(0x15, 0x00, 0x00, 0x80, 0xbf, 0x18, 0x04)
    // a normal piece "ko" score -0.25f (bits be800000), type omitted
    w(0x0a, 0x09, 0x0a, 0x02); bos.write("ko".getBytes("UTF-8"))
    w(0x15, 0x00, 0x00, 0x80, 0xbe)
    // normalizer_spec (field 3): junk
    w(0x1a, 0x02, 0x08, 0x00)
    val path = tmp("sp_foreign")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bos.toByteArray)
    val back = SpModel.readSpModel(spark, path).orderBy("id").collect()
    assert(back.length === 3)
    assert(back(0).getAs[String]("piece") === "<unk>" && back(0).getAs[Boolean]("unk"))
    assert(back(1).getAs[String]("piece") === "<sep>" &&
      back(1).getAs[Boolean]("control")) // USER_DEFINED withheld from DP
    assert(back(2).getAs[String]("piece") === "ko" &&
      back(2).getAs[Long]("nll_micro") === 250000L)
    // structural corruption is loud: torn varint
    val torn = tmp("sp_torn")
    java.nio.file.Files.write(java.nio.file.Paths.get(torn),
      Array[Byte](0x0a.toByte, 0x80.toByte))
    val e = intercept[IllegalArgumentException] { SpModel.readSpModel(spark, torn) }
    assert(e.getMessage.contains("torn"))
  }

  test("export→import→segment ≡ native (the artifact-equivalence law)") {
    import spark.implicits._
    val docs = Seq((0L, "hello hello world"), (1L, "help low worlds"),
        (2L, "hollow wells hello"))
      .toDF("doc_id", "text")
    val vocab = Unigram.unigramVocab(docs, "doc_id", "text",
      vocabSize = 30, rounds = 1, maxPieceLen = 3, maxWordLen = 12)
      .localCheckpoint(true)
    val path = tmp("sp_seg")
    SpModel.writeSpModel(vocab, path)
    val served = VocabArtifact.servableVocab(SpModel.readSpModel(spark, path))
    val viaArtifact = Unigram.segment(docs, "doc_id", "text", served,
        maxPieceLen = 3, maxWordLen = 12)
      .orderBy("id", "word_idx").collect()
    val native = Unigram.segment(docs, "doc_id", "text", vocab,
        maxPieceLen = 3, maxWordLen = 12)
      .orderBy("id", "word_idx").collect()
    assert(viaArtifact.map(_.toString).toSeq === native.map(_.toString).toSeq)
    assert(native.nonEmpty)
  }
}
