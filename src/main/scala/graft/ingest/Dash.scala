package graft.ingest

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Dependency-free DASH MPD manifest parser — the XML sibling of
  * [[Hls]] (the two cover essentially all adaptive web streaming):
  * an MPD carries the presentation duration and the representation
  * ladder (bandwidth/resolution/codecs) that a video crawl gates on
  * without fetching a single media segment.
  *
  * Parsing rules, stated:
  *   - `mediaPresentationDuration` (and `Period@duration` as the
  *     fallback when the MPD-level attribute is absent) is an
  *     ISO-8601 duration read LEXICALLY on the integer micro grid:
  *     `PT<h>H<m>M<s[.frac]>S` with every component optional, the
  *     fraction right-padded to six digits — no floating point
  *     touches the value (the [[Hls.secondsToMicros]] discipline);
  *     days (`P<n>D`) are accepted; larger calendar units (months,
  *     years — ill-defined spans) reject;
  *   - every `Representation` element reports `(bandwidth, width,
  *     height, codecs)` — width/height/codecs absent-able (audio
  *     representations carry none);
  *   - XXE hardened off like every XML reader in the engine; a torn
  *     document yields the representations parsed so far and whatever
  *     duration was already seen — the degrade contract.
  */
object Dash {

  final case class Mpd(duration_micros: Option[Long],
      representations: Seq[Representation])

  final case class Representation(bandwidth_bps: Long,
      width: Option[Long], height: Option[Long], codecs: Option[String])

  /** `"PT1H2M3.5S"` → micros; None on anything not a clean duration. */
  private[graft] def iso8601Micros(s: String): Option[Long] = {
    val m = """^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)(?:\.(\d{1,6}))?S)?)?$""".r
    s.trim match {
      case m(d, h, mi, sec, frac) =>
        if (d == null && h == null && mi == null && sec == null) None
        else {
          def l(x: String): Long = if (x == null) 0L else x.toLong
          val fracMicros =
            if (frac == null) 0L
            else frac.padTo(6, '0').foldLeft(0L)((a, c) => a * 10L + (c - '0'))
          Some((((l(d) * 24L + l(h)) * 60L + l(mi)) * 60L + l(sec)) *
            1000000L + fracMicros)
        }
      case _ => None
    }
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

  def parse(bytes: Array[Byte]): Mpd = {
    var dur: Option[Long] = None
    var periodDur: Option[Long] = None
    val reps = mutable.ArrayBuffer.empty[Representation]
    try {
      val r = newFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT) {
            def attr(name: String): Option[String] =
              (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == name)
                .map(r.getAttributeValue)
            r.getLocalName match {
              case "MPD" =>
                dur = attr("mediaPresentationDuration")
                  .flatMap(iso8601Micros)
              case "Period" if periodDur.isEmpty =>
                periodDur = attr("duration").flatMap(iso8601Micros)
              case "Representation" =>
                attr("bandwidth").filter(_.forall(_.isDigit))
                  .filter(_.nonEmpty).foreach { b =>
                    reps += Representation(b.toLong,
                      attr("width").map(_.toLong),
                      attr("height").map(_.toLong),
                      attr("codecs"))
                  }
              case _ =>
            }
          }
        }
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => } // parsed prefix
    Mpd(dur.orElse(periodDur), reps.toSeq)
  }
}
