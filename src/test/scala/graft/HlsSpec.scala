package graft

import graft.ingest.Hls
import org.scalatest.funsuite.AnyFunSuite

class HlsSpec extends AnyFunSuite {

  test("media playlist: EXTINF sums exactly on the micro grid, " +
      "target duration, ENDLIST, lexical fraction handling") {
    val pl = """#EXTM3U
      |#EXT-X-VERSION:3
      |#EXT-X-TARGETDURATION:10
      |#EXTINF:9.009,
      |seg0.ts
      |#EXTINF:9.5,segment title
      |seg1.ts
      |#EXTINF:4,
      |seg2.ts
      |#EXT-X-ENDLIST
      |""".stripMargin
    assert(Hls.parseMediaPlaylist(pl) === Some(Hls.MediaPlaylist(
      3L, 9009000L + 9500000L + 4000000L, Some(10000000L), ended = true)))
    // live edge: no ENDLIST
    val live = "#EXTM3U\n#EXTINF:2.0,\na.ts\n"
    assert(Hls.parseMediaPlaylist(live).get.ended === false)
    // not a playlist
    assert(Hls.parseMediaPlaylist("just text").isEmpty)
    assert(Hls.parseMediaPlaylist("").isEmpty)
  }

  test("secondsToMicros is lexical: no float, right-padded fraction, " +
      "over-precision and junk rejected") {
    assert(Hls.secondsToMicros("12.5") === Some(12500000L))
    assert(Hls.secondsToMicros("0.000001") === Some(1L))
    assert(Hls.secondsToMicros("7") === Some(7000000L))
    assert(Hls.secondsToMicros("9.0000001") === None) // > 6 digits
    assert(Hls.secondsToMicros("abc") === None)
    assert(Hls.secondsToMicros(".5") === None)
  }

  test("master playlist: variant ladder with quoted CODECS commas, " +
      "comment lines before the URI, missing-URI drop") {
    val m = """#EXTM3U
      |#EXT-X-STREAM-INF:BANDWIDTH=1280000,RESOLUTION=640x360,CODECS="avc1.64001f,mp4a.40.2"
      |low/index.m3u8
      |#EXT-X-STREAM-INF:BANDWIDTH=5000000,RESOLUTION=1920x1080
      |
      |# a stray comment
      |high/index.m3u8
      |#EXT-X-STREAM-INF:BANDWIDTH=99000
      |""".stripMargin
    assert(Hls.parseMasterVariants(m) === Seq(
      Hls.Variant(1280000L, Some(640L), Some(360L), "low/index.m3u8"),
      Hls.Variant(5000000L, Some(1920L), Some(1080L), "high/index.m3u8")))
    assert(Hls.parseMasterVariants("nope").isEmpty)
  }
}
