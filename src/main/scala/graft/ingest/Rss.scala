package graft.ingest

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Dependency-free RSS 2.0 enclosure parser — the audio/video crawl's
  * DISCOVERY feed (the sitemap sibling for podcasts and vodcasts: the
  * enclosure URL, byte size and declared duration are the frontier's
  * fetch-or-skip signals, available before fetching a single media
  * byte).
  *
  * Parsing rules, stated:
  *   - one row per `<enclosure>` inside an `<item>`: the item's
  *     `<title>`, the enclosure `url`/`type`/`length` attributes
  *     (length must be all digits or it reads absent — feeds lie),
  *     and the item's `<itunes:duration>` read by LOCAL NAME
  *     (namespace-prefix-agnostic, the sitemap r15 lesson) in any of
  *     its three wire forms — `HH:MM:SS`, `MM:SS`, or bare seconds —
  *     to the integer micro grid, lexically;
  *   - Atom feeds parse through the SAME walk: an `<entry>` is an
  *     item, and a `<link rel="enclosure" href=… type=… length=…>`
  *     is an enclosure (any other `rel` — alternate, self — never
  *     binds); podcast Atom feeds carry `itunes:duration` too and it
  *     reads identically;
  *   - items without enclosures yield nothing (article feeds);
  *     enclosures without a url are dropped;
  *   - XXE hardened off; a torn document yields the rows parsed so
  *     far — the degrade contract.
  */
object Rss {

  final case class Enclosure(item_title: Option[String], url: String,
      mime: Option[String], length_bytes: Option[Long],
      duration_micros: Option[Long])

  /** `"1:02:03"` / `"12:34"` / `"45"` → micros, lexically. */
  private[graft] def durationMicros(s: String): Option[Long] = {
    val parts = s.trim.split(":", -1).toSeq
    if (parts.isEmpty || parts.length > 3 ||
        parts.exists(p => p.isEmpty || !p.forall(_.isDigit))) None
    else Some(parts.foldLeft(0L)((a, p) => a * 60L + p.toLong) * 1000000L)
  }

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

  def enclosures(bytes: Array[Byte]): Seq[Enclosure] = {
    val out = mutable.ArrayBuffer.empty[Enclosure]
    try {
      val r = newFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      try {
        var inItem = false
        var title: Option[String] = None
        var dur: Option[Long] = None
        var pending = mutable.ArrayBuffer.empty[(String, Option[String], Option[Long])]
        var capture: String = null
        val sb = new StringBuilder
        while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            def attr(name: String): Option[String] =
              (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == name)
                .map(r.getAttributeValue)
            r.getLocalName match {
              case "item" | "entry" =>
                inItem = true; title = None; dur = None
                pending = mutable.ArrayBuffer.empty
              case "enclosure" if inItem =>
                attr("url").foreach { u =>
                  pending += ((u, attr("type"),
                    attr("length").filter(v => v.nonEmpty &&
                      v.forall(_.isDigit)).map(_.toLong)))
                }
              case "link" if inItem &&
                  attr("rel").contains("enclosure") =>
                attr("href").foreach { u =>
                  pending += ((u, attr("type"),
                    attr("length").filter(v => v.nonEmpty &&
                      v.forall(_.isDigit)).map(_.toLong)))
                }
              case "title" | "duration" if inItem =>
                capture = r.getLocalName; sb.clear()
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if capture != null =>
            sb.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "title" if capture == "title" =>
              if (title.isEmpty) title = Some(sb.toString)
              capture = null
            case "duration" if capture == "duration" =>
              dur = durationMicros(sb.toString); capture = null
            case "item" | "entry" =>
              pending.foreach { case (u, t, len) =>
                out += Enclosure(title, u, t, len, dur)
              }
              inItem = false
            case _ =>
          }
          case _ =>
        }
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => } // parsed prefix
    out.toSeq
  }
}
