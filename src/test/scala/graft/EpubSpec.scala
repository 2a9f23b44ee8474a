package graft

import graft.ingest.Epub
import org.scalatest.funsuite.AnyFunSuite

class EpubSpec extends AnyFunSuite {

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

  private val container =
    """<?xml version="1.0"?><container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
      |<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>
      |</container>""".stripMargin

  private def opf(spine: Seq[String], manifest: Seq[(String, String)]): String =
    """<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf">""" +
      "<manifest>" +
      manifest.map { case (id, href) =>
        s"""<item id="$id" href="$href" media-type="application/xhtml+xml"/>"""
      }.mkString + "</manifest><spine>" +
      spine.map(id => s"""<itemref idref="$id"/>""").mkString +
      "</spine></package>"

  private def xhtml(body: String): String =
    s"""<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml"><head><title>t</title></head><body>$body</body></html>"""

  test("spine order wins over zip entry order; hrefs resolve relative " +
      "to the OPF directory; block elements and br emit newlines") {
    val book = zip(
      "mimetype" -> "application/epub+zip",
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(Seq("c2", "c1"),
        Seq("c1" -> "ch1.xhtml", "c2" -> "ch2.xhtml")),
      "OEBPS/ch1.xhtml" -> xhtml("<p>one A</p><p>one B&amp;C</p>"),
      "OEBPS/ch2.xhtml" -> xhtml("<h1>Title</h1><p>line<br/>break</p>"))
    assert(Epub.chapters(book).map(_._1) === Seq("ch2.xhtml", "ch1.xhtml"))
    assert(Epub.text(book) ===
      "Title\nline\nbreak\n" + "one A\none B&C\n")
  }

  test("script/style subtrees are excluded (head is, too, via the " +
      "first test's title never surfacing)") {
    val book = zip(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(Seq("c"), Seq("c" -> "x.xhtml")),
      "OEBPS/x.xhtml" ->
        """<html><body><p>keep</p><script>drop();</script><style>p{}</style><p>also keep</p></body></html>""")
    assert(Epub.text(book) === "keep\nalso keep\n")
  }

  test("degrade contract: missing container, dangling spine idref, " +
      "missing chapter entry, non-zip payload") {
    assert(Epub.chapters("not a zip at all".getBytes("UTF-8")) === Seq.empty)
    assert(Epub.chapters(zip("a.txt" -> "no container")) === Seq.empty)
    val dangling = zip(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(Seq("ghost", "c"), Seq("c" -> "x.xhtml")),
      "OEBPS/x.xhtml" -> xhtml("<p>real</p>"))
    assert(Epub.chapters(dangling).map(_._2) === Seq("real\n"))
    val missing = zip(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(Seq("c", "d"),
        Seq("c" -> "x.xhtml", "d" -> "gone.xhtml")),
      "OEBPS/x.xhtml" -> xhtml("<p>here</p>"))
    assert(Epub.chapters(missing).map(_._2) === Seq("here\n"))
  }

  test("an OPF at the zip root (no directory) resolves hrefs bare") {
    val book = zip(
      "META-INF/container.xml" -> container.replace("OEBPS/content.opf",
        "content.opf"),
      "content.opf" -> opf(Seq("c"), Seq("c" -> "only.xhtml")),
      "only.xhtml" -> xhtml("<p>root book</p>"))
    assert(Epub.text(book) === "root book\n")
  }
}
