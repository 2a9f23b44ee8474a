package graft.ingest

import scala.collection.mutable

/** Dependency-free HLS (`.m3u8`) playlist parser — the headers-only
  * duration story extended to STREAMED video: crawl video
  * increasingly ships as HLS, where the media files are thousands of
  * anonymous `.ts`/`.m4s` segments and the only place the stream's
  * duration, segment count and variant ladder exist is the playlist
  * TEXT. Parsing it gives a video size gate (too short / too long /
  * too low-res) without fetching a single media segment — the
  * `videoDims` stance at the container-of-containers level.
  *
  * Parsing rules, stated:
  *   - a playlist must open with `#EXTM3U` (after an optional BOM) —
  *     anything else parses to None/empty;
  *   - media playlists: `#EXTINF:<duration>,` durations SUM exactly on
  *     the integer micro grid — the decimal field is read LEXICALLY
  *     (integer part · 10⁶ + fraction right-padded to six digits), no
  *     floating point touches the value (the DuckDB-replay
  *     discipline); `#EXT-X-TARGETDURATION` reports in micros;
  *     `#EXT-X-ENDLIST` marks a VOD (its absence a live edge);
  *   - master playlists: each `#EXT-X-STREAM-INF` line binds to the
  *     next non-comment line (its URI); `BANDWIDTH` and
  *     `RESOLUTION=<w>x<h>` are read by anchored regexes, so quoted
  *     attribute values with embedded commas (CODECS) cannot confuse
  *     the field split;
  *   - unknown tags are skipped (forward-compatible by spec); a
  *     `#EXT-X-STREAM-INF` with no following URI line is dropped.
  */
object Hls {

  final case class MediaPlaylist(n_segments: Long, duration_micros: Long,
      target_duration_micros: Option[Long], ended: Boolean)

  final case class Variant(bandwidth_bps: Long, width: Option[Long],
      height: Option[Long], uri: String)

  /** `"12.5"` → 12_500_000L — lexical decimal-seconds to micros. */
  private[graft] def secondsToMicros(s: String): Option[Long] = {
    val t = s.trim
    val dot = t.indexOf('.')
    val (ip, fp) = if (dot < 0) (t, "") else (t.take(dot), t.drop(dot + 1))
    if (ip.isEmpty || !ip.forall(_.isDigit) || !fp.forall(_.isDigit) ||
        fp.length > 6) None
    else Some(ip.toLong * 1000000L + fp.padTo(6, '0').foldLeft(0L)(
      (a, c) => a * 10L + (c - '0')))
  }

  private def lines(text: String): Array[String] = {
    val t = if (text.startsWith("\uFEFF")) text.substring(1) else text
    t.split("\r\n|\n|\r", -1)
  }

  def parseMediaPlaylist(text: String): Option[MediaPlaylist] = {
    val ls = lines(text)
    if (!ls.headOption.exists(_.trim == "#EXTM3U")) return None
    var n = 0L
    var total = 0L
    var target: Option[Long] = None
    var ended = false
    ls.iterator.map(_.trim).foreach { l =>
      if (l.startsWith("#EXTINF:")) {
        val v = l.stripPrefix("#EXTINF:").takeWhile(_ != ',')
        secondsToMicros(v).foreach { m => n += 1; total += m }
      } else if (l.startsWith("#EXT-X-TARGETDURATION:")) {
        target = secondsToMicros(l.stripPrefix("#EXT-X-TARGETDURATION:"))
      } else if (l == "#EXT-X-ENDLIST") ended = true
    }
    Some(MediaPlaylist(n, total, target, ended))
  }

  private val Bandwidth = """(?:^|[,:])BANDWIDTH=(\d+)""".r
  private val Resolution = """(?:^|[,:])RESOLUTION=(\d+)x(\d+)""".r

  def parseMasterVariants(text: String): Seq[Variant] = {
    val ls = lines(text)
    if (!ls.headOption.exists(_.trim == "#EXTM3U")) return Seq.empty
    val out = mutable.ArrayBuffer.empty[Variant]
    var i = 0
    while (i < ls.length) {
      val l = ls(i).trim
      if (l.startsWith("#EXT-X-STREAM-INF:")) {
        val bw = Bandwidth.findFirstMatchIn(l).map(_.group(1).toLong)
        val res = Resolution.findFirstMatchIn(l)
          .map(m => (m.group(1).toLong, m.group(2).toLong))
        // the URI is the next non-comment, non-blank line
        var j = i + 1
        while (j < ls.length &&
            (ls(j).trim.isEmpty || ls(j).trim.startsWith("#"))) j += 1
        if (j < ls.length) bw.foreach { b =>
          out += Variant(b, res.map(_._1), res.map(_._2), ls(j).trim)
        }
        i = j
      }
      i += 1
    }
    out.toSeq
  }
}
