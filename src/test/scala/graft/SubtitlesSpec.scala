package graft

import graft.ingest.Subtitles
import graft.ingest.Subtitles.Cue
import org.scalatest.funsuite.AnyFunSuite

class SubtitlesSpec extends AnyFunSuite {

  test("SRT: counter lines, comma millis, multi-line text, ordinal " +
      "contract ignores renumbered counters") {
    val srt =
      """7
        |00:00:01,500 --> 00:00:03,000
        |first line
        |second line
        |
        |99
        |01:02:03,250 --> 01:02:04,000
        |later cue
        |""".stripMargin
    assert(Subtitles.parse(srt) === Seq(
      Cue(1L, 1500000L, 3000000L, "first line\nsecond line"),
      Cue(2L, (3723L * 1000L + 250L) * 1000L, 3724000000L, "later cue")))
  }

  test("WebVTT: BOM + header, NOTE/STYLE blocks skipped, cue ids, " +
      "settings after timing, hours optional, dot millis") {
    val vtt = "\uFEFF" + "WEBVTT - with a label\n\n" +
      "NOTE\nthis block is commentary\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "intro-cue\n00:05.000 --> 00:07.500 align:start position:10%\n" +
      "hello <i>world</i>\n\n" +
      "01:00:00.000 --> 01:00:02.000\nan hour in\n"
    assert(Subtitles.parse(vtt) === Seq(
      Cue(1L, 5000000L, 7500000L, "hello <i>world</i>"),
      Cue(2L, 3600000000L, 3602000000L, "an hour in")))
  }

  test("degrade contract: broken timing skips the WHOLE block and " +
      "shifts ordinals; timing deeper than line two never binds") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:02,000
        |ok one
        |
        |2
        |not a timing line
        |orphan text
        |
        |3
        |00:00:05,000 --> 00:00:06,000
        |ok two
        |
        |junk
        |more junk
        |00:00:09,000 --> 00:00:10,000
        |timing too deep
        |""".stripMargin
    val cues = Subtitles.parse(srt)
    assert(cues.map(_.text) === Seq("ok one", "ok two"))
    assert(cues.map(_.cue_index) === Seq(1L, 2L))
  }

  test("fraction reads as a decimal fraction (right-padded) and CRLF " +
      "line endings parse; empty input parses empty") {
    val srt = "1\r\n00:00:01,5 --> 00:00:02,25\r\nshort frac\r\n"
    assert(Subtitles.parse(srt) ===
      Seq(Cue(1L, 1500000L, 2250000L, "short frac")))
    assert(Subtitles.parse("") === Seq.empty)
    assert(Subtitles.parse("WEBVTT\n") === Seq.empty)
  }

  test("a VTT cue with no id line (timing first) and an SRT-style dot " +
      "separator both parse — real files mix dialects") {
    val vtt = "WEBVTT\n\n00:01.000 --> 00:02.000\nbare cue\n"
    assert(Subtitles.parse(vtt) ===
      Seq(Cue(1L, 1000000L, 2000000L, "bare cue")))
    val srtDot = "1\n00:00:01.000 --> 00:00:02.000\ndot srt\n"
    assert(Subtitles.parse(srtDot).head.start_micros === 1000000L)
  }
}
