package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Dependency-free `.docx` (OOXML WordprocessingML) TEXT extractor —
  * the document sibling of [[Xlsx]] (same container: a zip of XML
  * parts, `java.util.zip` + StAX are in the JDK) and a major
  * real-world class of a web/document training corpus: reports,
  * theses, and office documents crawl as `.docx` far more often than
  * as clean HTML.
  *
  * Extraction contract, stated:
  *   - text comes from `word/document.xml` only (headers, footers,
  *     footnotes and comments live in other parts — out of scope, the
  *     main-body reading every converter defaults to);
  *   - one output line per paragraph (`w:p`), run text (`w:t`)
  *     concatenated in document order, `w:tab` → TAB, `w:br`/`w:cr` →
  *     newline WITHIN the paragraph;
  *   - table cell paragraphs surface as ordinary paragraphs in
  *     document order (the flat-text reading);
  *   - field instruction text (`w:instrText`) and phonetic/ruby guides
  *     are excluded — they are markup, not content;
  *   - degrade contract: a payload that is not a zip, has no
  *     `word/document.xml`, or whose XML is torn yields the paragraphs
  *     parsed so far (possibly none) — never a crash (the media-walk
  *     discipline).
  *
  * Scale position: one document parses in one bounded pass wherever
  * the bytes already are (executor-side via `mapPartitions` for crawl
  * payloads — the [[Pdf.parseBytes]] route); XXE is hardened off the
  * same way as [[Xlsx]].
  */
object Docx {

  // One configured factory per thread: XMLInputFactory.newInstance()
  // walks the synchronized ServiceLoader/system-property lookup on every
  // call — at 32 concurrent tasks that lock serialized the whole parse
  // stage (measured: 67 s task time vs 12 s cpu on q_x_epub_text at
  // sf0.1). Factories are not thread-safe to SHARE, so ThreadLocal, not
  // a global (guide: initialise heavyweight state once per task).
  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  private def newFactory: XMLInputFactory = {
    val f = factories.get()
    f
  }

  /** Paragraphs of the main document body, in document order. */
  def paragraphs(payload: Array[Byte]): Seq[String] = {
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(payload))
      try {
        var entry = zin.getNextEntry
        while (entry != null && entry.getName != "word/document.xml")
          entry = zin.getNextEntry
        if (entry == null) return Seq.empty
        parseDocumentXml(zin)
      } finally zin.close()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** The whole extractable text: paragraphs joined with newlines. */
  def text(payload: Array[Byte]): String =
    paragraphs(payload).mkString("\n")

  private def parseDocumentXml(in: java.io.InputStream): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    // w:p can NEST (a drawing text box holds paragraphs inside a host
    // paragraph's run) — a depth counter folds nested paragraphs into
    // the host line with a newline, so host text is never dropped
    var pDepth = 0
    var inT = false
    var skipDepth = 0
    val r = newFactory.createXMLStreamReader(in)
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "p" if skipDepth == 0 =>
            pDepth += 1
            if (pDepth == 1) sb.clear() else sb.append('\n')
          case "t" if pDepth > 0 && skipDepth == 0 => inT = true
          case "tab" if pDepth > 0 && skipDepth == 0 => sb.append('\t')
          case "br" | "cr" if pDepth > 0 && skipDepth == 0 =>
            sb.append('\n')
          case "instrText" | "rPh" | "phoneticPr" => skipDepth += 1
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inT && skipDepth == 0 =>
          sb.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "instrText" | "rPh" | "phoneticPr" =>
            skipDepth = math.max(0, skipDepth - 1)
          case "p" if pDepth > 0 =>
            if (pDepth == 1) out += sb.toString
            pDepth -= 1
          case _ =>
        }
        case _ =>
      }
      out.toSeq
    } catch {
      // torn XML: the parsed prefix, the degrade contract
      case scala.util.control.NonFatal(_) => out.toSeq
    } finally r.close()
  }
}
