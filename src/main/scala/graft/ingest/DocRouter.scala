package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.util.zip.ZipInputStream

/** The DOCUMENT front door — the text-side sibling of the media front
  * door's magic-byte routing: ONE executor-side dispatch from a crawl
  * payload's BYTES to the extractor its container says, so a mixed
  * 100 TB crawl turns pdf/docx/epub/subtitle/plain payloads into
  * trainable text in a single `mapPartitions` pass (detection trusts
  * the bytes, never a caller-supplied label — the detectKind stance).
  *
  * Routing rules, stated:
  *   - `%PDF-` → [[Pdf.parseBytes]]; the ok text streams join by
  *     newline, kind `pdf` (a file with zero ok streams keeps the kind
  *     with empty text — the quarantine stays observable upstream);
  *   - `PK` (zip) → probe the ENTRY NAMES only:
  *     `word/document.xml` → [[Docx]] (kind `docx`),
  *     `META-INF/container.xml` → [[Epub]] (kind `epub`), any other
  *     zip reads kind `zip` with NO text — an archive is not a
  *     document;
  *   - strictly-valid UTF-8 → [[Subtitles.parse]] first: one or more
  *     cues → kind `subtitles`, cue texts joined by newline (callers
  *     who need the time coordinates use Subtitles directly); zero
  *     cues → kind `text`, the payload verbatim;
  *   - anything else → kind `none`, NO text — the honest no-extractor
  *     class (media and unknown binaries must stay distinguishable
  *     from genuinely empty documents, the only-a-parsed-header
  *     discipline transplanted to text).
  */
object DocRouter {

  final case class Extracted(kind: String, text: Option[String])

  private def utf8(payload: Array[Byte]): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(payload)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  private def zipEntryNames(payload: Array[Byte]): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    val zin = new ZipInputStream(new ByteArrayInputStream(payload))
    try {
      var e = zin.getNextEntry
      while (e != null) { out += e.getName; e = zin.getNextEntry }
    } catch { case scala.util.control.NonFatal(_) => }
    finally zin.close()
    out.toSet
  }

  def extract(payload: Array[Byte]): Extracted = {
    def starts(m: Array[Byte]): Boolean =
      payload.length >= m.length &&
        java.util.Arrays.equals(payload, 0, m.length, m, 0, m.length)
    try {
      if (starts("%PDF-".getBytes("ISO-8859-1"))) {
        val text = Pdf.parseBytes("payload", payload)
          .filter(_.ok).map(_.text).mkString("\n")
        Extracted("pdf", Some(text))
      } else if (starts(Array[Byte](0x50, 0x4B, 0x03, 0x04))) {
        val names = zipEntryNames(payload)
        if (names.contains("word/document.xml"))
          Extracted("docx", Some(Docx.text(payload)))
        else if (names.contains("META-INF/container.xml"))
          Extracted("epub", Some(Epub.text(payload)))
        else Extracted("zip", None)
      } else utf8(payload) match {
        case Some(s) =>
          val cues = Subtitles.parse(s)
          if (cues.nonEmpty)
            Extracted("subtitles", Some(cues.map(_.text).mkString("\n")))
          else Extracted("text", Some(s))
        case None => Extracted("none", None)
      }
    } catch {
      case scala.util.control.NonFatal(_) => Extracted("none", None)
    }
  }
}
