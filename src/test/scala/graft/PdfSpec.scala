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

  private def cidPdf(content: String, cmaps: String*): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    sb.append(s"4 0 obj << /Length ${content.length} >>\nstream\n")
      .append(content).append("\nendstream\nendobj\n")
    cmaps.zipWithIndex.foreach { case (c, i) =>
      sb.append(s"${5 + i} 0 obj << /Length ${c.length} >>\nstream\n")
        .append(c).append("\nendstream\nendobj\n")
    }
    sb.append("%%EOF\n").toString
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  test("CID/Type0 text via /ToUnicode: bfchar, both bfrange forms, " +
      "CMap-after-content (two-pass), unmapped -> U+FFFD, merge rule") {
    // codes: 002D (bfchar em dash), 0030..0032 (incrementing bfrange ->
    // Greek), 0041/0042 (array bfrange), 0FFF (unmapped)
    val content = "BT /F1 12 Tf <002D003000310032004100420FFF> Tj ET"
    val cmap =
      "/CIDInit /ProcSet findresource begin\n" +
        "begincodespacerange <0000> <FFFF> endcodespacerange\n" +
        "1 beginbfchar <002D> <2014> endbfchar\n" +
        "2 beginbfrange\n<0030> <0039> <0394>\n" +
        "<0041> <0042> [<00C4> <00D6>]\nendbfrange\nend"
    val rows = Pdf.parseBytes("cid.pdf", cidPdf(content, cmap)).toList
    assert(rows.length === 1 && rows.head.ok)
    assert(rows.head.text === "—ΔΕΖÄÖ�")
    // a second CMap mapping 002D differently must NOT win (first wins);
    // its new code 0050 merges in
    val cmap2 = "1 beginbfchar <002D> <0021> endbfchar\n" +
      "1 beginbfrange <0050> <0050> <0416> endbfrange"
    val rows2 = Pdf.parseBytes("cid2.pdf",
      cidPdf("BT <002D0050> Tj ET", cmap, cmap2)).toList
    assert(rows2.head.text === "—Ж")
    // 1-byte codespacerange: codes are single bytes
    val cmap1b =
      "begincodespacerange <00> <FF> endcodespacerange\n" +
        "1 beginbfchar <41> <0042> endbfchar"
    val rows3 = Pdf.parseBytes("cid3.pdf",
      cidPdf("BT <4141> Tj ET", cmap1b)).toList
    assert(rows3.head.text === "BB")
    // multi-char destination (ligature expansion)
    val cmapLig = "1 beginbfchar <0001> <00660066006C> endbfchar"
    val rows4 = Pdf.parseBytes("cid4.pdf",
      cidPdf("BT <0001> Tj ET", cmapLig)).toList
    assert(rows4.head.text === "ffl")
    // literal strings keep the Latin-1 simple-font reading (stated)
    val rows5 = Pdf.parseBytes("cid5.pdf",
      cidPdf("BT (abc) Tj ET", cmap)).toList
    assert(rows5.head.text === "abc")
    // a file with NO CMap keeps the old hex-as-bytes reading
    val rows6 = Pdf.parseBytes("plain.pdf",
      cidPdf("BT <48657821> Tj ET")).toList
    assert(rows6.head.text === "Hex!")
  }
}
