package graft

import graft.ingest.Docx
import org.scalatest.funsuite.AnyFunSuite

class DocxSpec extends AnyFunSuite {

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

  private def doc(body: String): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "word/document.xml" ->
      ("<?xml version=\"1.0\"?><w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        s"<w:body>$body</w:body></w:document>"))

  test("multi-run paragraphs concatenate; tab/br/cr map to TAB and " +
      "newline; instrText field codes are excluded") {
    val bytes = doc(
      "<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>" +
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t><w:cr/><w:t>d</w:t></w:r></w:p>" +
        "<w:p><w:r><w:instrText>PAGEREF x</w:instrText></w:r><w:r><w:t>visible</w:t></w:r></w:p>")
    assert(Docx.paragraphs(bytes) ===
      Seq("Hello world", "a\tb\nc\nd", "visible"))
    assert(Docx.text(bytes) === "Hello world\na\tb\nc\nd\nvisible")
  }

  test("table-cell paragraphs surface as ordinary paragraphs in " +
      "document order") {
    val bytes = doc(
      "<w:p><w:r><w:t>before</w:t></w:r></w:p>" +
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell A</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:p><w:r><w:t>cell B</w:t></w:r></w:p></w:tc></w:tr></w:tbl>" +
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>")
    assert(Docx.paragraphs(bytes) ===
      Seq("before", "cell A", "cell B", "after"))
  }

  test("a text-box paragraph NESTED in a host paragraph folds into the " +
      "host line — host text before and after is never dropped") {
    val bytes = doc(
      "<w:p><w:r><w:t>host start</w:t></w:r>" +
        "<w:r><w:pict><w:txbxContent><w:p><w:r><w:t>boxed</w:t></w:r></w:p>" +
        "</w:txbxContent></w:pict></w:r>" +
        "<w:r><w:t> host end</w:t></w:r></w:p>")
    assert(Docx.paragraphs(bytes) === Seq("host start\nboxed host end"))
  }

  test("degrade contract: not a zip, no document part, and an empty " +
      "paragraph all behave") {
    assert(Docx.paragraphs("just plain text".getBytes("UTF-8")) === Seq.empty)
    assert(Docx.paragraphs(zip("word/other.xml" -> "<a/>")) === Seq.empty)
    assert(Docx.paragraphs(Array.emptyByteArray) === Seq.empty)
    assert(Docx.paragraphs(doc("<w:p></w:p>")) === Seq(""))
  }
}
