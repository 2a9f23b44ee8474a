package graft.ingest

import scala.collection.mutable

/** Dependency-free SRT / WebVTT subtitle-cue parser — the video-paired
  * TEXT modality of a multimodal training corpus (captions are the
  * alignment layer between crawl video/audio and trainable text, and a
  * 100 TB crawl carries them as `.srt`/`.vtt` files and as WARC
  * payloads). Parses a document into timed cues
  * `(cue_index, start_micros, end_micros, text)` so caption text can
  * ride every downstream text operator (dedup, quality, language ID)
  * while KEEPING its time coordinates for audio/video alignment.
  *
  * Dialect handling, stated:
  *   - WebVTT is recognized by its `WEBVTT` first line (an optional
  *     UTF-8 BOM is stripped); `NOTE`/`STYLE`/`REGION` blocks are
  *     skipped; a cue may carry an identifier line above its timing
  *     line; cue settings after the end timestamp (`align:…`) are
  *     ignored; hours are optional (`MM:SS.mmm`); the decimal
  *     separator is a dot.
  *   - SRT blocks carry a numeric counter line above the timing line;
  *     the decimal separator is a comma (a dot is tolerated — real
  *     files mix them); hours are required by spec but tolerated
  *     absent.
  *   - `cue_index` is the 1-based ORDINAL of the parsed cue, NOT the
  *     SRT counter line — renumbered/merged files are common, and the
  *     ordinal is the coordinate downstream joins can trust.
  *   - Degrade contract (the media-walk discipline): a block whose
  *     first or second line is not a parseable timing line is SKIPPED
  *     whole — never a crash, never a fabricated cue; a timing line
  *     deeper than position two means a malformed block (skipped).
  *     Cue payload text is kept verbatim (VTT voice/class tags
  *     included — tag scrubbing is the HTML-extraction stage's job,
  *     not the parser's); multi-line payloads join with `\n`.
  *   - The fraction field reads as a decimal fraction: 1–3 digits,
  *     right-padded (`.5` = 500 ms), the lexical-decimal semantic.
  *
  * Scale position: one document parses in one pass on the executor —
  * the per-row work rides `mapPartitions` inside the declared codec
  * boundary (the Xlsx/Pdf stance), and the row explosion happens
  * executor-side, never on the driver.
  */
object Subtitles {

  final case class Cue(cue_index: Long, start_micros: Long,
      end_micros: Long, text: String)

  private val Timing =
    ("""^(?:(\d+):)?(\d{1,2}):(\d{1,2})[.,](\d{1,3})""" +
      """\s*-->\s*(?:(\d+):)?(\d{1,2}):(\d{1,2})[.,](\d{1,3})(?:\s.*)?$""").r

  private def micros(h: String, m: String, s: String, frac: String): Long = {
    val hh = if (h == null) 0L else h.toLong
    val ms = frac.padTo(3, '0').toLong
    ((hh * 3600L + m.toLong * 60L + s.toLong) * 1000L + ms) * 1000L
  }

  /** Parse one subtitle document (SRT or WebVTT, auto-detected) into
    * its cues. Never throws on malformed input — unparseable blocks
    * are skipped by the degrade contract above.
    */
  def parse(raw: String): Seq[Cue] = {
    val text = if (raw.startsWith("\uFEFF")) raw.substring(1) else raw
    val lines = text.split("\r\n|\n|\r", -1)
    val isVtt = lines.headOption.exists(_.startsWith("WEBVTT"))
    val out = mutable.ArrayBuffer.empty[Cue]
    var i = if (isVtt) 1 else 0
    var idx = 0L
    while (i < lines.length) {
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val start = i
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        val block = lines.slice(start, i)
        val head = block.head.trim
        val isMeta = isVtt && (head.startsWith("NOTE") ||
          head == "STYLE" || head == "REGION")
        if (!isMeta) {
          val tIdx = block.take(2).indexWhere(l =>
            Timing.findFirstIn(l.trim).isDefined)
          if (tIdx >= 0) block(tIdx).trim match {
            case Timing(h1, m1, s1, f1, h2, m2, s2, f2) =>
              idx += 1
              out += Cue(idx, micros(h1, m1, s1, f1),
                micros(h2, m2, s2, f2),
                block.drop(tIdx + 1).mkString("\n"))
            case _ =>
          }
        }
      }
    }
    out.toSeq
  }
}
