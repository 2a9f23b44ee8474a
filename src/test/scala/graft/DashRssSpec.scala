package graft

import graft.ingest.{Dash, Rss}
import org.scalatest.funsuite.AnyFunSuite

class DashRssSpec extends AnyFunSuite {

  test("iso8601Micros: lexical micro grid, optional components, day " +
      "support, over-precision and calendar units reject") {
    assert(Dash.iso8601Micros("PT1H2M3.5S") === Some(3723500000L))
    assert(Dash.iso8601Micros("PT0.000001S") === Some(1L))
    assert(Dash.iso8601Micros("PT5M") === Some(300000000L))
    assert(Dash.iso8601Micros("P1DT1S") === Some(86401000000L))
    assert(Dash.iso8601Micros("PT30S") === Some(30000000L))
    assert(Dash.iso8601Micros("PT1.2345678S") === None) // 7 frac digits
    assert(Dash.iso8601Micros("P1M") === None)          // calendar month
    assert(Dash.iso8601Micros("PT") === None)
    assert(Dash.iso8601Micros("99") === None)
  }

  test("MPD parse: presentation duration, Period fallback, mixed " +
      "video/audio representation ladder, degrade lanes") {
    val mpd =
      """<?xml version="1.0"?>
        |<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" mediaPresentationDuration="PT1M30.25S">
        |<Period><AdaptationSet mimeType="video/mp4">
        |<Representation id="v1" bandwidth="1500000" width="1280" height="720" codecs="avc1.64001f"/>
        |<Representation id="v2" bandwidth="4000000" width="1920" height="1080" codecs="avc1.640028"/>
        |</AdaptationSet><AdaptationSet mimeType="audio/mp4">
        |<Representation id="a1" bandwidth="128000" codecs="mp4a.40.2"/>
        |</AdaptationSet></Period></MPD>""".stripMargin.getBytes("UTF-8")
    val got = Dash.parse(mpd)
    assert(got.duration_micros === Some(90250000L))
    assert(got.representations === Seq(
      Dash.Representation(1500000L, Some(1280L), Some(720L), Some("avc1.64001f")),
      Dash.Representation(4000000L, Some(1920L), Some(1080L), Some("avc1.640028")),
      Dash.Representation(128000L, None, None, Some("mp4a.40.2"))))
    // Period duration is the fallback when the MPD attribute is absent
    val fallback = """<MPD><Period duration="PT45S"><Representation bandwidth="1"/></Period></MPD>"""
      .getBytes("UTF-8")
    assert(Dash.parse(fallback).duration_micros === Some(45000000L))
    // junk bytes: no duration, no representations, no crash
    assert(Dash.parse("not xml".getBytes("UTF-8")) === Dash.Mpd(None, Seq.empty))
  }

  test("RSS enclosures: per-item rows, three duration wire forms, " +
      "lying length dropped, channel title never leaks") {
    val feed =
      """<?xml version="1.0"?>
        |<rss version="2.0" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">
        |<channel><title>The Feed Title</title>
        |<item><title>Episode One</title>
        |<enclosure url="https://p.example/e1.mp3" type="audio/mpeg" length="12345"/>
        |<itunes:duration>1:02:03</itunes:duration></item>
        |<item><title>Article only, no media</title></item>
        |<item><title>Episode Two</title>
        |<enclosure url="https://p.example/e2.mp3" type="audio/mpeg" length="not-a-number"/>
        |<itunes:duration>45</itunes:duration></item>
        |<item><enclosure url="https://p.example/e3.mp4" type="video/mp4"/>
        |<itunes:duration>12:34</itunes:duration></item>
        |</channel></rss>""".stripMargin.getBytes("UTF-8")
    assert(Rss.enclosures(feed) === Seq(
      Rss.Enclosure(Some("Episode One"), "https://p.example/e1.mp3",
        Some("audio/mpeg"), Some(12345L), Some(3723000000L)),
      Rss.Enclosure(Some("Episode Two"), "https://p.example/e2.mp3",
        Some("audio/mpeg"), None, Some(45000000L)),
      Rss.Enclosure(None, "https://p.example/e3.mp4",
        Some("video/mp4"), None, Some(754000000L))))
    assert(Rss.enclosures("junk".getBytes("UTF-8")) === Seq.empty)
  }

  test("Atom dialect: entry + rel=enclosure link rows identically; " +
      "alternate/self links never bind") {
    val atom =
      """<?xml version="1.0"?>
        |<feed xmlns="http://www.w3.org/2005/Atom" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">
        |<title>feed title stays out</title>
        |<entry><title>Atom Ep</title>
        |<link rel="alternate" href="https://p.example/page"/>
        |<link rel="enclosure" href="https://p.example/a1.mp3" type="audio/mpeg" length="777"/>
        |<link rel="self" href="https://p.example/self"/>
        |<itunes:duration>2:05</itunes:duration></entry>
        |<entry><title>No media entry</title>
        |<link rel="alternate" href="https://p.example/other"/></entry>
        |</feed>""".stripMargin.getBytes("UTF-8")
    assert(Rss.enclosures(atom) === Seq(
      Rss.Enclosure(Some("Atom Ep"), "https://p.example/a1.mp3",
        Some("audio/mpeg"), Some(777L), Some(125000000L))))
  }

  test("rss durationMicros wire forms and rejects") {
    assert(Rss.durationMicros("45") === Some(45000000L))
    assert(Rss.durationMicros("12:34") === Some(754000000L))
    assert(Rss.durationMicros("1:02:03") === Some(3723000000L))
    assert(Rss.durationMicros("1:2:3:4") === None)
    assert(Rss.durationMicros("twelve") === None)
    assert(Rss.durationMicros("") === None)
  }
}
