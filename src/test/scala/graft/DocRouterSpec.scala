package graft

import graft.ingest.DocRouter
import org.scalatest.funsuite.AnyFunSuite

class DocRouterSpec extends AnyFunSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def pdf(content: String): Array[Byte] =
    ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")

  test("routing: pdf, docx, epub, other-zip, subtitles, plain text, " +
      "binary — each by its bytes") {
    val p = DocRouter.extract(pdf("BT /F1 12 Tf 72 720 Td (hello pdf) Tj ET"))
    assert(p.kind === "pdf")
    assert(p.text === Some("hello pdf"))

    val docx = zip("word/document.xml" ->
      ("<?xml version=\"1.0\"?><w:document xmlns:w=\"x\"><w:body>" +
        "<w:p><w:r><w:t>hello docx</w:t></w:r></w:p></w:body></w:document>"))
    assert(DocRouter.extract(docx) === DocRouter.Extracted("docx",
      Some("hello docx")))

    val epub = zip(
      "META-INF/container.xml" ->
        """<container><rootfiles><rootfile full-path="c.opf"/></rootfiles></container>""",
      "c.opf" ->
        """<package><manifest><item id="c" href="x.xhtml"/></manifest><spine><itemref idref="c"/></spine></package>""",
      "x.xhtml" -> "<html><body><p>hello epub</p></body></html>")
    assert(DocRouter.extract(epub) === DocRouter.Extracted("epub",
      Some("hello epub\n")))

    assert(DocRouter.extract(zip("data/readme.txt" -> "archive")) ===
      DocRouter.Extracted("zip", None))

    val srt = "1\n00:00:01,000 --> 00:00:02,000\nsub line\n"
    assert(DocRouter.extract(srt.getBytes("UTF-8")) ===
      DocRouter.Extracted("subtitles", Some("sub line")))

    assert(DocRouter.extract("just prose".getBytes("UTF-8")) ===
      DocRouter.Extracted("text", Some("just prose")))

    // HTML is NAMED html with the raw markup kept (extraction is the
    // html stage's job) — doctype form, bare <html>, leading space/BOM
    val page = "<html><body>hi</body></html>"
    assert(DocRouter.extract(page.getBytes("UTF-8")) ===
      DocRouter.Extracted("html", Some(page)))
    val doctype = "\n  <!DOCTYPE HTML><html></html>"
    assert(DocRouter.extract(doctype.getBytes("UTF-8")).kind === "html")
    assert(DocRouter.extract(("\uFEFF" + page).getBytes("UTF-8")).kind
      === "html")
    // a prose mention of html mid-text stays text
    assert(DocRouter.extract("see <html> tags".getBytes("UTF-8")).kind
      === "text")

    // invalid UTF-8 (a PNG magic byte) routes none, never empty text
    assert(DocRouter.extract(Array(0x89.toByte, 0x50, 0x4E)) ===
      DocRouter.Extracted("none", None))
    assert(DocRouter.extract(Array.emptyByteArray) ===
      DocRouter.Extracted("text", Some("")))
  }

  private def gz(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(payload); out.close()
    bos.toByteArray
  }

  test("gzip transport wrapper: inner kind reports, one level only, " +
      "torn members degrade to the wrapper kind") {
    assert(DocRouter.extract(gz("wrapped prose".getBytes("UTF-8"))) ===
      DocRouter.Extracted("text", Some("wrapped prose")))
    val docx = zip("word/document.xml" ->
      "<w:document xmlns:w=\"x\"><w:body><w:p><w:r><w:t>gz docx</w:t></w:r></w:p></w:body></w:document>")
    assert(DocRouter.extract(gz(docx)) ===
      DocRouter.Extracted("docx", Some("gz docx")))
    // a doubly-wrapped member stops at one level — the wrapper reports
    assert(DocRouter.extract(gz(gz("deep".getBytes("UTF-8")))) ===
      DocRouter.Extracted("gzip", None))
    // gzip magic with a torn deflate stream: the wrapper, no text
    val torn = gz("some content that is long enough".getBytes("UTF-8"))
      .take(8)
    assert(DocRouter.extract(torn) === DocRouter.Extracted("gzip", None))
  }

  test("a docx that is ALSO nearly an epub routes by the document part " +
      "first; utf-8 text containing a timing-looking line but no block " +
      "structure still parses as subtitles only when a cue exists") {
    val both = zip(
      "word/document.xml" -> "<w:document><w:body><w:p><w:r><w:t>w</w:t></w:r></w:p></w:body></w:document>",
      "META-INF/container.xml" -> "<container/>")
    assert(DocRouter.extract(both).kind === "docx")
    // prose mentioning an arrow but with no timing line stays text
    val prose = "see section 2 --> then go on\nmore prose"
    assert(DocRouter.extract(prose.getBytes("UTF-8")).kind === "text")
  }
}
