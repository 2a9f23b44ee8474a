package graft

import java.nio.file.{Files, Paths}

import graft.ingest.Pdf
import org.apache.spark.sql.functions._

/** PDF extractable-subset reader: write→read round trip (Flate and raw),
  * foreign hand-assembled bytes with the full literal-string escape set,
  * TJ kerning arrays and hex strings, and the quarantine matrix.
  */
class PdfSpec extends SparkTestBase {

  test("write→read round trip: one page per row, Flate streams, unicode sanitized, manifest counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain latin text with accents: café né ü"),
      (2L, "parens (nested (deep)) and back\\slash survive"),
      (3L, "multi\nline\ntext keeps its lines"),
      (4L, "unicode 機械学習 becomes question marks"),
      (5L, "")
    ).toDF("id", "text")
    val dir = Files.createTempDirectory("pdf_rt").toString
    val manifest = Pdf.write(
      docs.select(Pdf.latin1Sanitize(col("text")).as("t")), "t", dir, shards = 2)
    assert(manifest.agg(sum("n_pages")).head().getLong(0) === 5L)
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === Set("part-00000.pdf", "part-00001.pdf"))

    val back = Pdf.read(spark, dir).localCheckpoint(true)
    assert(back.where(!col("ok")).isEmpty)
    val got = back.select("text").collect().map(_.getString(0)).toSet
    val want = docs.select(Pdf.latin1Sanitize(col("text")))
      .collect().map(_.getString(0)).toSet
    assert(got === want)
    assert(got.exists(_.contains("café")), "Latin-1 accents survive")
    assert(got.exists(_.contains("unicode ???? becomes")), "CJK sanitizes to ?")
    assert(got.exists(_ == "multi\nline\ntext keeps its lines"))

    // raw (uncompressed) streams round-trip the same way
    val rawDir = Files.createTempDirectory("pdf_raw").toString
    Pdf.write(docs.filter(col("id") <= 2)
      .select(Pdf.latin1Sanitize(col("text")).as("t")), "t", rawDir,
      shards = 1, flate = false)
    val rawBack = Pdf.read(spark, rawDir)
    assert(rawBack.where(!col("ok")).isEmpty)
    assert(rawBack.count() === 2L)
  }

  test("foreign PDF parses: octal/named escapes, nested parens, hex strings, TJ kerning arrays") {
    // hand-assembled: one uncompressed content stream exercising the
    // string syntax a real generator emits.
    val content = "BT /F1 10 Tf 72 700 Td " +
      "[(Ker) -120 (ning)] TJ " +                      // TJ: parts concatenate
      "0 -12 Td (oct\\101l and tab\\011end) Tj " +     // \101 = 'A', \011 = tab
      "0 -12 Td (nested (paren) pair) Tj " +
      "0 -12 Td <48657821> Tj " +                      // hex "Hex!"
      "0 -12 Td (split \\\nline) Tj " +                // continuation joins
      "ET"
    val pdf = "%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF\n"
    val dir = Files.createTempDirectory("pdf_foreign").toString
    Files.write(Paths.get(dir, "foreign.pdf"),
      pdf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val rows = Pdf.read(spark, dir).collect()
    assert(rows.length === 1 && rows.head.getAs[Boolean]("ok"))
    assert(rows.head.getAs[String]("text") ===
      "Kerning\noctAl and tab\tend\nnested (paren) pair\nHex!\nsplit line")
    assert(rows.head.getAs[Long]("n_text_ops") === 5L)
  }

  test("foreign realism: indirect /Length, inline dicts in BT, filter detection isolated per object") {
    // indirect length ("/Length 8 0 R") must NOT parse as length 8 —
    // the endstream-scan fallback reads the whole stream; an inline
    // marked-content dict inside BT must not open a hex string; and a
    // raw stream within 1024 chars of a Flate object must not inherit
    // its /Filter.
    val flateBody = {
      val d = new java.util.zip.Deflater()
      d.setInput("BT (compressed text here) Tj ET".getBytes("ISO-8859-1"))
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
      d.end(); out.toByteArray
    }
    val rawContent = "BT /P << /MCID 0 >> BDC (visible words) Tj EMC ET"
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj\n<< /Length 8 0 R /Filter /FlateDecode >>\nstream\n")
    bos.write(flateBody)
    w("\nendstream\nendobj\n")
    w(s"2 0 obj\n<< /Length ${rawContent.length} >>\nstream\n")
    w(rawContent)
    w("\nendstream\nendobj\n8 0 obj\n" + flateBody.length + "\nendobj\n%%EOF\n")
    val dir = Files.createTempDirectory("pdf_realism").toString
    Files.write(Paths.get(dir, "real.pdf"), bos.toByteArray)
    val rows = Pdf.read(spark, dir).orderBy("stream_idx").collect()
    assert(rows.length === 2, rows.mkString("; "))
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows(0).getAs[String]("text") === "compressed text here")
    assert(rows(1).getAs[String]("text") === "visible words")
  }

  test("Flate data CONTAINING the literal 'endstream' bytes survives the no-/Length fallback scan") {
    // stored (level-0) deflate blocks carry the payload verbatim, so a
    // payload containing "endstream" plants those nine bytes inside the
    // compressed stream; with only an indirect /Length the extent falls
    // back to scanning — a first-match cut would truncate the stream
    // (quarantine) AND resume inside its tail (a bogus extra row). The
    // inflate-validated forward walk must recover the full stream and
    // the following object must still parse as exactly one row.
    val payload = "BT (before endstream after) Tj ET"
    val flateBody = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.NO_COMPRESSION)
      d.setInput(payload.getBytes("ISO-8859-1"))
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
      d.end(); out.toByteArray
    }
    assert(new String(flateBody, "ISO-8859-1").contains("endstream"),
      "fixture premise: stored deflate block carries the marker verbatim")
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj\n<< /Length 9 0 R /Filter /FlateDecode >>\nstream\n")
    bos.write(flateBody)
    w("\nendstream\nendobj\n")
    w("2 0 obj\n<< /Length 24 >>\nstream\nBT (second object) Tj ET\nendstream\nendobj\n")
    w("9 0 obj\n" + flateBody.length + "\nendobj\n%%EOF\n")
    val dir = Files.createTempDirectory("pdf_embedded_marker").toString
    Files.write(Paths.get(dir, "emb.pdf"), bos.toByteArray)
    val rows = Pdf.read(spark, dir).orderBy("stream_idx").collect()
    assert(rows.length === 2, rows.mkString("; "))
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows(0).getAs[String]("text") === "before endstream after")
    assert(rows(1).getAs[String]("text") === "second object")
  }

  test("quarantine matrix: corrupt flate, unsupported filter, non-PDF, torn stream — one ok=false row each") {
    import spark.implicits._
    def freshWrite(tag: String): String = {
      val dir = Files.createTempDirectory(s"pdf_q_$tag").toString
      Pdf.write(Seq("some latin text here").toDF("t"), "t", dir, shards = 1)
      dir
    }
    // corrupt flate: flip a byte inside the compressed stream
    val d1 = freshWrite("flate")
    val f1 = Paths.get(d1, "part-00000.pdf")
    val b1 = Files.readAllBytes(f1)
    val at = new String(b1, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("stream\n") + 10
    b1(at) = (b1(at) ^ 0x5a).toByte
    Files.write(f1, b1)
    val r1 = Pdf.read(spark, d1).collect()
    assert(r1.length === 1 && !r1.head.getAs[Boolean]("ok"))

    // unsupported filter
    val d2 = Files.createTempDirectory("pdf_q_filter").toString
    Files.write(Paths.get(d2, "img.pdf"),
      ("%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /DCTDecode >>\n" +
        "stream\nabcd\nendstream\nendobj\n%%EOF\n").getBytes("ISO-8859-1"))
    val r2 = Pdf.read(spark, d2).collect()
    assert(r2.length === 1 && !r2.head.getAs[Boolean]("ok"))

    // not a PDF at all
    val d3 = Files.createTempDirectory("pdf_q_notpdf").toString
    Files.write(Paths.get(d3, "junk.pdf"), "hello world".getBytes("UTF-8"))
    val r3 = Pdf.read(spark, d3).collect()
    assert(r3.length === 1 && !r3.head.getAs[Boolean]("ok"))

    // torn: stream never ends
    val d4 = Files.createTempDirectory("pdf_q_torn").toString
    Files.write(Paths.get(d4, "torn.pdf"),
      "%PDF-1.4\n1 0 obj\n<< /Length 999 >>\nstream\nBT (x) Tj"
        .getBytes("ISO-8859-1"))
    val r4 = Pdf.read(spark, d4).collect()
    assert(r4.length === 1 && !r4.head.getAs[Boolean]("ok"))

    // an intact file next to a corrupt one still parses whole
    val d5 = freshWrite("mixed")
    Files.write(Paths.get(d5, "junk.pdf"), "nope".getBytes("UTF-8"))
    val r5 = Pdf.read(spark, d5).localCheckpoint(true)
    assert(r5.where(!col("ok")).count() === 1L)
    assert(r5.where(col("ok")).count() === 1L)
  }
}
