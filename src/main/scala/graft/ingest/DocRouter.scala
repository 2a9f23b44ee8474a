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
  *   - strictly-valid UTF-8: an HTML document (a leading
  *     `<!doctype html`/`<html` after optional BOM/whitespace,
  *     case-insensitive) reads kind `html` with the RAW markup as its
  *     text — extraction is the html stage's job
  *     (`TextAnalysis.extractMainContent`), and naming the kind is
  *     what routes it there instead of letting markup masquerade as
  *     prose; otherwise [[Subtitles.parse]] first: one or more cues →
  *     kind `subtitles`, cue texts joined by newline (callers who
  *     need the time coordinates use Subtitles directly); zero cues →
  *     kind `text`, the payload verbatim;
  *   - `1F 8B` (gzip, the crawl transport wrapper) → inflate ONE
  *     member level under a decompression-bomb cap
  *     ([[MaxInflateBytes]]) and re-route the inflated bytes — the
  *     transport encoding is invisible, the inner kind reports (a
  *     `.txt.gz` reads `text`); an over-cap, torn, or doubly-wrapped
  *     member reads kind `gzip` with NO text, stated;
  *   - anything else → kind `none`, NO text — the honest no-extractor
  *     class (media and unknown binaries must stay distinguishable
  *     from genuinely empty documents, the only-a-parsed-header
  *     discipline transplanted to text).
  */
object DocRouter {

  final case class Extracted(kind: String, text: Option[String])

  /** One inflated member may expand to at most this many bytes — the
    * decompression-bomb bound (gzip's 1032:1 max ratio makes a 64 KiB
    * payload inflatable to ~64 MiB; past the cap the router reports
    * the wrapper honestly instead of buffering an attacker's zeros).
    */
  val MaxInflateBytes: Int = 64 << 20

  private def gunzip(payload: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new ByteArrayInputStream(payload))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0 && out.size <= MaxInflateBytes) {
          out.write(buf, 0, n); n = in.read(buf)
        }
        if (out.size > MaxInflateBytes) None else Some(out.toByteArray)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

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

  def extract(payload: Array[Byte]): Extracted = extract(payload, 0)

  private def extract(payload: Array[Byte], depth: Int): Extracted = {
    def starts(m: Array[Byte]): Boolean =
      payload.length >= m.length &&
        java.util.Arrays.equals(payload, 0, m.length, m, 0, m.length)
    try {
      if (starts(Array[Byte](0x1F, 0x8B.toByte))) {
        if (depth > 0) Extracted("gzip", None) // one wrapper level only
        else gunzip(payload) match {
          case Some(inner) => extract(inner, depth + 1)
          case None => Extracted("gzip", None)
        }
      } else if (starts("%PDF-".getBytes("ISO-8859-1"))) {
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
          val head = s.dropWhile(c => c == '\uFEFF' || c.isWhitespace)
            .take(14).toLowerCase
          if (head.startsWith("<!doctype html") || head.startsWith("<html"))
            Extracted("html", Some(s))
          else {
            val cues = Subtitles.parse(s)
            if (cues.nonEmpty)
              Extracted("subtitles", Some(cues.map(_.text).mkString("\n")))
            else Extracted("text", Some(s))
          }
        case None => Extracted("none", None)
      }
    } catch {
      case scala.util.control.NonFatal(_) => Extracted("none", None)
    }
  }
}
