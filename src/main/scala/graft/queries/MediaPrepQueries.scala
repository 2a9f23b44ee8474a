package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import graft.llmops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media front-door operators added in round 13: magic-byte kind
  * detection (the trust-the-bytes router) and the decode-coverage
  * gauge that makes the stubbed-format mix observable. The detection
  * query is a TRUE replay — both engines walk the same constructed
  * byte prefixes (Spark on binary, DuckDB on the hex image of the same
  * bytes) through the same ordered rule CASE; the coverage query
  * plants payloads whose decodability is known by construction and
  * requires the engine's REAL decoders to hit exactly the planted mix.
  */
object MediaPrepQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  /** (kind, magic) in detection order — mirrors
    * [[Multimodal.detectKindCol]]'s rule table for the oracle CASE.
    * r14 adds the ISO-BMFF `ftyp` plants (real brands + a bogus brand
    * for the bare-container fallback), flac, and both mp3 front doors
    * (ID3v2 tag and a bare MPEG frame sync).
    */
  private val Magics: Seq[(String, Array[Byte])] = Seq(
    "png" -> Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "gif" -> "GIF89a".getBytes("ISO-8859-1"),
    "pdf" -> "%PDF-".getBytes("ISO-8859-1"),
    "gzip" -> Array(0x1F, 0x8B).map(_.toByte),
    "zstd" -> Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte),
    "zip" -> Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte),
    "tiff" -> Array(0x49, 0x49, 0x2A, 0x00).map(_.toByte),
    "warc" -> "WARC/1.1\r\n".getBytes("ISO-8859-1"),
    "webp" -> riffMagic("WEBP"),
    "wav" -> riffMagic("WAVE"),
    "avi" -> riffMagic("AVI "),
    "riff" -> riffMagic("JUNK"),
    // r15: the IFF (FORM) container — AIFF/AIFC audio and the bare form
    "aiff" -> ("FORM".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
      "AIFF".getBytes("ISO-8859-1")),
    "iff" -> ("FORM".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
      "BLAH".getBytes("ISO-8859-1")),
    "mp4" -> ftypMagic("isom"),
    "avif" -> ftypMagic("avif"),
    "heic" -> ftypMagic("mif1"),
    "mov" -> ftypMagic("qt  "),
    "m4a" -> ftypMagic("M4A "),
    "isobmff" -> ftypMagic("zzzz"),
    // r15: a CMAF/fMP4 media segment — first box styp (no ftyp)
    "mp4seg" -> (Array[Byte](0, 0, 0, 16) ++
      "stypmsdh".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0)),
    "flac" -> "fLaC".getBytes("ISO-8859-1"),
    "mp3" -> ("ID3".getBytes("ISO-8859-1") ++ Array[Byte](4, 0, 0)),
    "mp3sync" -> Array(0xFF, 0xFB).map(_.toByte),
    // r15: ADTS AAC — layer bits 00 where Layer III spells 01
    "aac" -> Array(0xFF, 0xF1).map(_.toByte),
    "ico" -> Array(0x00, 0x00, 0x01, 0x00).map(_.toByte),
    "xml" -> "<?xml version=\"1.0\"?>".getBytes("ISO-8859-1"),
    "svg" -> "<svg xmlns=".getBytes("ISO-8859-1"),
    // r15: the EBML family — DocType in the bounded window routes
    // webm/mkv, a DocType-less header reads the bare container
    "webm" -> (Array(0x1A, 0x45, 0xDF, 0xA3, 0x9F, 0x42, 0x82, 0x84)
      .map(_.toByte) ++ "webm".getBytes("ISO-8859-1")),
    "mkv" -> (Array(0x1A, 0x45, 0xDF, 0xA3, 0xA3, 0x42, 0x82, 0x88)
      .map(_.toByte) ++ "matroska".getBytes("ISO-8859-1")),
    "ebml" -> Array(0x1A, 0x45, 0xDF, 0xA3, 0x84, 0x42, 0x86, 0x81, 0x01)
      .map(_.toByte),
    "ogg" -> ("OggS".getBytes("ISO-8859-1") ++ Array[Byte](0, 2)),
    // r15: MPEG-TS — three aligned sync bytes on the 188-byte grid
    "mpegts" -> Array.tabulate(377)(i =>
      if (i % 188 == 0) 0x47.toByte else 0x11.toByte),
    "unknown" -> Array.empty[Byte])

  /** The [[Multimodal]] ftyp brand table, mirrored for the oracle CASE
    * (rule-for-rule, order included — the TRUE-replay requirement).
    */
  private val FtypBrands: Seq[(String, String)] = Seq(
    "avif" -> "avif", "avis" -> "avif",
    "heic" -> "heic", "heix" -> "heic", "mif1" -> "heic", "msf1" -> "heic",
    "isom" -> "mp4", "iso2" -> "mp4", "iso4" -> "mp4", "iso5" -> "mp4",
    "iso6" -> "mp4", "mp41" -> "mp4", "mp42" -> "mp4", "dash" -> "mp4",
    "qt  " -> "mov", "M4A " -> "m4a")

  /** A minimal ftyp box prefix: BE32 size 16, "ftyp", the major brand,
    * zero minor version.
    */
  private def ftypMagic(brand: String): Array[Byte] =
    Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("ISO-8859-1") ++
      brand.getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0)

  /** RIFF container prefix with a zeroed size field — spelled as explicit
    * zero BYTES (not embedded NUL literals) so this source file stays
    * text to git/grep/review tooling.
    */
  private def riffMagic(tag: String): Array[Byte] =
    "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
      tag.getBytes("ISO-8859-1")

  private def hexOf(b: Array[Byte]): String =
    b.map("%02X".format(_)).mkString

  private def be(v: Long, len: Int): Array[Byte] =
    (0 until len).map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray

  /** An EBML element: raw id bytes (marker kept) + 1-byte size + body. */
  private def ebmlEl(id: Array[Byte], body: Array[Byte]): Array[Byte] = {
    require(body.length < 127)
    id ++ Array((0x80 | body.length).toByte) ++ body
  }

  /** A minimal WebM: EBML header (DocType webm) + Segment(Info(
    * TimecodeScale 10⁶ ns + float64 Duration) + Tracks(Video w×h)).
    */
  private def webmBytes(durUnits: Double, w: Long, h: Long): Array[Byte] = {
    val header = ebmlEl(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte),
      ebmlEl(Array(0x42, 0x82).map(_.toByte), "webm".getBytes("ISO-8859-1")))
    val info = ebmlEl(Array(0x15, 0x49, 0xA9, 0x66).map(_.toByte),
      ebmlEl(Array(0x2A, 0xD7, 0xB1).map(_.toByte), be(1000000L, 4)) ++
        ebmlEl(Array(0x44, 0x89).map(_.toByte),
          be(java.lang.Double.doubleToLongBits(durUnits), 8)))
    val video = ebmlEl(Array(0xE0.toByte),
      ebmlEl(Array(0xB0.toByte), be(w, 2)) ++
        ebmlEl(Array(0xBA.toByte), be(h, 2)))
    val tracks = ebmlEl(Array(0x16, 0x54, 0xAE, 0x6B).map(_.toByte),
      ebmlEl(Array(0xAE.toByte), video))
    header ++ ebmlEl(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte),
      info ++ tracks)
  }

  /** Canonical 16-bit mono PCM WAV (the TinyWav shape, parameterized). */
  private def wavBytes(samples: Array[Int], rate: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def le16(v: Int): Unit =
      (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write("RIFF".getBytes("ISO-8859-1")); le32(36 + 2 * samples.length)
    bos.write("WAVE".getBytes("ISO-8859-1"))
    bos.write("fmt ".getBytes("ISO-8859-1")); le32(16)
    le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    bos.write("data".getBytes("ISO-8859-1")); le32(2 * samples.length)
    samples.foreach(le16)
    bos.toByteArray
  }

  /** One Ogg page: OggS capture, version 0, the given header type and
    * granule position, zero CRC (the walk doesn't verify — transport
    * integrity is the reader quarantine's job), 255-chunked lacing.
    */
  private def oggPage(granule: Long, seq: Long, packet: Array[Byte],
      headerType: Int): Array[Byte] = {
    def le(v: Long, len: Int): Array[Byte] =
      (0 until len).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val full = packet.length / 255
    val segs = (Seq.fill(full)(255) :+ packet.length % 255)
      .map(_.toByte).toArray
    "OggS".getBytes("ISO-8859-1") ++ Array[Byte](0, headerType.toByte) ++
      le(granule, 8) ++ le(1L, 4) ++ le(seq, 4) ++ le(0L, 4) ++
      Array(segs.length.toByte) ++ segs ++ packet
  }

  /** Minimal Ogg/Opus: BOS page with an OpusHead identification packet,
    * then an EOS data page whose granule = preSkip + nSamples (the
    * 48 kHz grid).
    */
  private def opusOgg(ch: Long, preSkip: Long, nSamples: Long): Array[Byte] = {
    def le(v: Long, len: Int): Array[Byte] =
      (0 until len).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val head = "OpusHead".getBytes("ISO-8859-1") ++ Array[Byte](1, ch.toByte) ++
      le(preSkip, 2) ++ le(48000L, 4) ++ le(0L, 2) ++ Array[Byte](0)
    oggPage(0L, 0L, head, 2) ++
      oggPage(preSkip + nSamples, 1L, Array[Byte](0x42, 0x42), 4)
  }

  /** Minimal Ogg/Vorbis: BOS page with the type-1 identification
    * header, then an EOS page whose granule = nSamples at `rate`.
    */
  private def vorbisOgg(rate: Long, ch: Long, nSamples: Long): Array[Byte] = {
    def le(v: Long, len: Int): Array[Byte] =
      (0 until len).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val head = Array[Byte](1) ++ "vorbis".getBytes("ISO-8859-1") ++
      le(0L, 4) ++ Array(ch.toByte) ++ le(rate, 4) ++
      le(0L, 4) ++ le(0L, 4) ++ le(0L, 4) ++ Array[Byte](0x66.toByte, 1)
    oggPage(0L, 0L, head, 2) ++
      oggPage(nSamples, 1L, Array[Byte](0x17), 4)
  }

  private def mp4Box(typ: String, body: Array[Byte]): Array[Byte] =
    be(8L + body.length, 4) ++ typ.getBytes("ISO-8859-1") ++ body

  /** Minimal m4a: ftyp M4A + moov(trak(mdia(hdlr soun + mdhd v0 +
    * minf/stbl/stsd mp4a entry with the channelcount field))).
    */
  private def m4aBytes(rate: Long, nSamples: Long, ch: Long): Array[Byte] = {
    val hdlr = mp4Box("hdlr", be(0L, 4) ++ be(0L, 4) ++
      "soun".getBytes("ISO-8859-1") ++ new Array[Byte](12))
    val mdhd = mp4Box("mdhd", be(0L, 4) ++ new Array[Byte](8) ++
      be(rate, 4) ++ be(nSamples, 4) ++ be(0L, 4))
    val entry = be(36L, 4) ++ "mp4a".getBytes("ISO-8859-1") ++
      new Array[Byte](16) ++ be(ch, 2) ++ be(16L, 2) ++ new Array[Byte](8)
    val stsd = mp4Box("stsd", be(0L, 4) ++ be(1L, 4) ++ entry)
    ftypMagic("M4A ") ++ mp4Box("moov", mp4Box("trak",
      mp4Box("mdia", hdlr ++ mdhd ++ mp4Box("minf", mp4Box("stbl", stsd)))))
  }

  /** A CBR-shaped ADTS AAC stream: `frames` frames of `7 + pad` bytes
    * each — MPEG-4 ID, no CRC, the given frequency index / channel
    * configuration / raw-data-block count, buffer-fullness bits all
    * ones (the VBR sentinel real encoders stamp).
    */
  private def aacBytes(sfi: Int, cfg: Int, rdb: Int, frames: Int,
      pad: Int): Array[Byte] = {
    val flen = 7 + pad
    val frame = Array[Byte](
      0xFF.toByte, 0xF1.toByte,
      ((1 << 6) | (sfi << 2) | (cfg >> 2)).toByte,
      (((cfg & 3) << 6) | (flen >> 11)).toByte,
      ((flen >> 3) & 0xff).toByte,
      (((flen & 7) << 5) | 0x1f).toByte,
      (0xfc | rdb).toByte) ++ new Array[Byte](pad)
    Array.fill(frames)(frame).flatten
  }

  /** A minimal AIFF: FORM/AIFF + COMM with the sample rate as a
    * NORMALIZED 80-bit extended float built by integer shifts.
    */
  private def aiffBytes(rate: Long, frames: Long, ch: Long): Array[Byte] = {
    val nlz = java.lang.Long.numberOfLeadingZeros(rate)
    val mant = rate << nlz
    val exp = (16383 + 63 - nlz).toLong
    val comm = be(ch, 2) ++ be(frames, 4) ++ be(16L, 2) ++
      be(exp, 2) ++ be(mant >>> 32, 4) ++ be(mant & 0xffffffffL, 4)
    val body = "AIFF".getBytes("ISO-8859-1") ++
      "COMM".getBytes("ISO-8859-1") ++ be(comm.length.toLong, 4) ++ comm
    "FORM".getBytes("ISO-8859-1") ++ be(body.length.toLong, 4) ++ body
  }

  /** A minimal mp4: ftyp + moov(mvhd v0 + trak(tkhd + mdia/minf/stbl)). */
  private def mp4Bytes(timescale: Long, duration: Long, w: Long, h: Long,
      stbl: Array[Byte]): Array[Byte] = {
    val mvhd = mp4Box("mvhd", be(0L, 4) ++ new Array[Byte](8) ++
      be(timescale, 4) ++ be(duration, 4) ++ new Array[Byte](80))
    val tkhd = mp4Box("tkhd", be(0L, 4) ++ new Array[Byte](72) ++
      be(w << 16, 4) ++ be(h << 16, 4))
    val mdia = mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stbl)))
    ftypMagic("isom") ++
      mp4Box("moov", mvhd ++ mp4Box("trak", tkhd ++ mdia))
  }

  /** A pinned 3x2 single-color (ARGB 0xff123456) lossless WebP — the
    * [[graft.llmops.Webp]] simple-prefix-code fixture as one constant,
    * decoded FOR REAL by the coverage query.
    */
  private val TinyWebp: Array[Byte] =
    ("5249464618000000574542505650384c0c0000002f02400000284d256ad5ff00"
      .grouped(2).map(Integer.parseInt(_, 16).toByte)).toArray

  /** A pinned lossy-WebP header (VP8 chunk): detected as webp, decodes
    * to None — the honest-stub class the gauge must report.
    */
  private val LossyWebp: Array[Byte] = {
    val body = "RIFF????WEBPVP8 ????????".getBytes("ISO-8859-1")
    body
  }

  /** A pinned minimal RIFF/WAVE: PCM format 1, mono, 8 kHz, 16-bit,
    * four samples — decodes for real through
    * [[Multimodal.decodeWav]].
    */
  private val TinyWav: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def le16(v: Int): Unit = (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write("RIFF".getBytes("ISO-8859-1")); le32(4 + 24 + 16)
    bos.write("WAVE".getBytes("ISO-8859-1"))
    bos.write("fmt ".getBytes("ISO-8859-1")); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    bos.write("data".getBytes("ISO-8859-1")); le32(8)
    Seq(1000, -1000, 2000, -2000).foreach(le16)
    bos.toByteArray
  }

  /** The [[TinyWav]] recording re-containered as AIFF (mono, 8 kHz,
    * 16-bit BE, the same four samples) — decodes for real through
    * `decodeAiffFeatures`, and its envelope must equal TinyWav's.
    */
  private val TinyAiff: Array[Byte] = {
    val samples = Array(1000, -1000, 2000, -2000)
    val nlz = java.lang.Long.numberOfLeadingZeros(8000L)
    val mant = 8000L << nlz
    val comm = be(1L, 2) ++ be(samples.length.toLong, 4) ++ be(16L, 2) ++
      be((16383 + 63 - nlz).toLong, 2) ++ be(mant >>> 32, 4) ++
      be(mant & 0xffffffffL, 4)
    val ssnd = be(0L, 4) ++ be(0L, 4) ++
      samples.flatMap(v => be(v.toLong & 0xffffL, 2))
    val body = "AIFF".getBytes("ISO-8859-1") ++
      "COMM".getBytes("ISO-8859-1") ++ be(comm.length.toLong, 4) ++ comm ++
      "SSND".getBytes("ISO-8859-1") ++ be(ssnd.length.toLong, 4) ++ ssnd
    "FORM".getBytes("ISO-8859-1") ++ be(body.length.toLong, 4) ++ body
  }

  def queries: Seq[OracleQuery] = Seq(

    // Magic-byte kind detection as a TRUE byte-walk replay: each doc
    // carries one of the planted prefixes (real magics incl. the r14
    // ftyp/flac/mp3 family, a bogus-tag RIFF, a bogus-brand ftyp, and no
    // prefix at all) ahead of its text bytes; BOTH engines run the same
    // ordered rule CASE over the same constructed bytes — so a text that
    // happens to start with "BM" (or carry "ftyp" at offset 4)
    // classifies identically in both, the adversarial case a
    // planted-expectation oracle would miss. Counts and id-sums per
    // kind pin the result.
    q("q_x_detect_kind", {
      val nPlants = Magics.length
      val riffHex = hexOf("RIFF".getBytes("ISO-8859-1"))
      val ftypHex = hexOf("ftyp".getBytes("ISO-8859-1"))
      def tagCase(tag: String, kind: String): String =
        s"WHEN substr(hx, 17, 8) = '${hexOf(tag.getBytes("ISO-8859-1"))}' THEN '$kind'"
      val brandCases = FtypBrands.map { case (brand, kind) =>
        tagCase(brand, kind)
      }.mkString(" ")
      val ruleCases = Seq(
        "png" -> "89504E470D0A1A0A", "jpeg" -> "FFD8FF", "gif" -> "47494638",
        "pdf" -> "255044462D", "gzip" -> "1F8B", "zstd" -> "28B52FFD",
        "zip" -> "504B0304", "tiff" -> "49492A00", "tiff2" -> "4D4D002A",
        "warc" -> "574152432F", "bmp" -> "424D",
        "flac" -> "664C6143", "mp3" -> "494433", "ogg" -> "4F676753",
        "ico" -> "00000100", "xml" -> "3C3F786D6C", "svg" -> "3C737667")
        .map { case (k, h) =>
          val kind = if (k == "tiff2") "tiff" else k
          s"WHEN substr(hx, 1, ${h.length}) = '$h' THEN '$kind'"
        }.mkString(" ")
      // the EBML DocType rule: a byte-ALIGNED occurrence of the full
      // DocType element within the first 64 bytes — the `(?:..)*`
      // anchor forces even hex offsets, replaying Spark's binary
      // `contains` exactly (the marker byte 0x82/0x88 cannot occur in
      // the ASCII text tail, so both engines agree on every row)
      val ebmlCase =
        "WHEN substr(hx, 1, 8) = '1A45DFA3' THEN (CASE " +
          "WHEN regexp_matches(substr(hx, 1, 128), '^(?:..)*4282847765626D') THEN 'webm' " +
          "WHEN regexp_matches(substr(hx, 1, 128), '^(?:..)*4282886D6174726F736B61') THEN 'mkv' " +
          "ELSE 'ebml' END) "
      val plantCases = Magics.zipWithIndex.map { case ((_, m), i) =>
        s"WHEN doc_id % $nPlants = $i THEN '${hexOf(m)}'"
      }.mkString(" ")
      s"WITH src AS (SELECT doc_id, (CASE $plantCases END) || hex(encode(text)) AS hx FROM documents), " +
        "k AS (SELECT doc_id, CASE " +
        s"WHEN substr(hx, 1, 8) = '$riffHex' THEN (CASE " +
        s"${tagCase("WEBP", "webp")} ${tagCase("WAVE", "wav")} ${tagCase("AVI ", "avi")} " +
        "ELSE 'riff' END) " +
        s"WHEN substr(hx, 1, 8) = '${hexOf("FORM".getBytes("ISO-8859-1"))}' THEN (CASE " +
        s"${tagCase("AIFF", "aiff")} ${tagCase("AIFC", "aiff")} " +
        "ELSE 'iff' END) " +
        s"WHEN substr(hx, 9, 8) = '$ftypHex' THEN (CASE " +
        s"$brandCases ELSE 'isobmff' END) " +
        "WHEN substr(hx, 9, 8) IN ('73747970', '73696478', '6D6F6F66') THEN 'mp4seg' " +
        ebmlCase +
        s"$ruleCases " +
        "WHEN length(hx) >= 754 AND substr(hx, 1, 2) = '47' " +
        "AND substr(hx, 377, 2) = '47' AND substr(hx, 753, 2) = '47' THEN 'mpegts' " +
        "WHEN substr(hx, 1, 2) = 'FF' AND substr(hx, 3, 2) IN ('F0', 'F1', 'F8', 'F9') THEN 'aac' " +
        "WHEN substr(hx, 1, 2) = 'FF' AND substr(hx, 3, 1) IN ('E', 'F') THEN 'mp3' " +
        "ELSE 'unknown' END AS kind FROM src) " +
        "SELECT kind, CAST(count(*) AS BIGINT) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum " +
        "FROM k GROUP BY kind ORDER BY kind"
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val nPlants = Magics.length
      val plant = Magics.zipWithIndex.foldRight(lit(Array.empty[Byte])) {
        case (((_, m), i), e) =>
          when(col("doc_id") % nPlants === i, lit(m)).otherwise(e)
      }
      docs.select(col("doc_id"),
          concat(plant, col("text").cast("binary")).as("payload"))
        .select(col("doc_id"),
          Multimodal.detectKindCol(col("payload")).as("kind"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("kind")
    },

    // Decode-coverage gauge over a planted mix whose decodability is
    // known by construction: real PNG bytes (ImageIO), the pinned VP8L
    // webp (the engine's own dependency-free decoder), a lossy-VP8
    // header (detected webp, honestly stubbed), a real PCM WAV, an AVIF
    // and an MP4 ftyp header (the r14 ISO-BMFF kinds — detected under
    // their own names, honestly stubbed), and plain text. The engine
    // must actually DECODE to hit the expected per-kind
    // (n, n_decoded, stub_ppm) rows the oracle derives from the
    // planting arithmetic.
    q("q_x_decode_coverage",
      "WITH src AS (SELECT CASE doc_id % 14 WHEN 0 THEN 'png' WHEN 1 THEN 'webp' " +
        "WHEN 2 THEN 'webp' WHEN 3 THEN 'wav' WHEN 4 THEN 'avif' " +
        "WHEN 5 THEN 'mp4' WHEN 7 THEN 'webm' WHEN 8 THEN 'ogg' " +
        "WHEN 9 THEN 'aiff' WHEN 10 THEN 'aac' WHEN 11 THEN 'm4a' " +
        "WHEN 12 THEN 'mpegts' WHEN 13 THEN 'mp4seg' " +
        "ELSE 'unknown' END AS kind, " +
        "CASE doc_id % 14 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 3 THEN 1 WHEN 9 THEN 1 ELSE 0 END AS dec " +
        "FROM documents) " +
        "SELECT kind, CAST(count(*) AS BIGINT) AS n, CAST(sum(dec) AS BIGINT) AS n_decoded, " +
        "CAST(count(*) - sum(dec) AS BIGINT) AS n_stubbed, " +
        "CAST(((count(*) - sum(dec)) * 1000000) // count(*) AS BIGINT) AS stub_ppm " +
        "FROM src GROUP BY kind ORDER BY kind") { (s, d) =>
      val im = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 2).foreach(x => (0 until 2).foreach(y => im.setRGB(x, y, 0x123456)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      val png = bos.toByteArray
      // r15: the EBML/Ogg front door — the gauge must NAME webm/ogg
      // (observably stubbed), not bury them in unknown; likewise the
      // aiff (REAL decode) / aac / m4a lanes added with the audio walks
      val tinyWebm = Array(0x1A, 0x45, 0xDF, 0xA3, 0x9F, 0x42, 0x82, 0x84)
        .map(_.toByte) ++ "webm".getBytes("ISO-8859-1")
      val tinyOgg = "OggS".getBytes("ISO-8859-1") ++ Array[Byte](0, 2, 0, 0)
      val payload = when(col("doc_id") % 14 === 0, lit(png))
        .when(col("doc_id") % 14 === 1, lit(TinyWebp))
        .when(col("doc_id") % 14 === 2, lit(LossyWebp))
        .when(col("doc_id") % 14 === 3, lit(TinyWav))
        .when(col("doc_id") % 14 === 4, lit(ftypMagic("avif")))
        .when(col("doc_id") % 14 === 5, lit(ftypMagic("mp42")))
        .when(col("doc_id") % 14 === 7, lit(tinyWebm))
        .when(col("doc_id") % 14 === 8, lit(tinyOgg))
        .when(col("doc_id") % 14 === 9, lit(TinyAiff))
        .when(col("doc_id") % 14 === 10, lit(aacBytes(4, 2, 0, 1, 1)))
        .when(col("doc_id") % 14 === 11, lit(ftypMagic("M4A ")))
        .when(col("doc_id") % 14 === 12, lit(Magics.toMap.apply("mpegts")))
        .when(col("doc_id") % 14 === 13, lit(Magics.toMap.apply("mp4seg")))
        // 0x00 prefix (the q_x_image_dims guard): a text that happens to
        // start with a magic must not re-route the planted-unknown lane
        .otherwise(concat(unhex(lit("00")), col("text").cast("binary")))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.decodeCoverage(media).orderBy("kind")
    },

    // The media data card (r15): per (source, detected kind), payload
    // counts/bytes, the real-decode-vs-stub split, and the
    // MediaMixBench-law near-dup recall projection (decodable share in
    // bps) — the same 14-lane planted mix as the coverage gauge, crossed
    // with a source column coprime to the lane modulus so every source
    // holds every kind. The oracle derives every column incl. the byte
    // sums from the planting arithmetic.
    q("q_x_media_data_card", {
      val pngLen = {
        val im = new java.awt.image.BufferedImage(2, 2,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until 2).foreach(x => (0 until 2).foreach(y =>
          im.setRGB(x, y, 0x123456)))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        bos.size()
      }
      val lens = Map(0 -> pngLen, 1 -> 32, 2 -> 24, 3 -> 52,
        4 -> 16, 5 -> 16, 7 -> 12, 8 -> 8,
        9 -> TinyAiff.length, 10 -> 8, 11 -> 16,
        12 -> 377, 13 -> 16)
      val lenCase = lens.map { case (l, n) => s"WHEN $l THEN $n" }
        .mkString(" ")
      "WITH src AS (SELECT 's' || (doc_id % 2) AS source, " +
        "CASE doc_id % 14 WHEN 0 THEN 'png' WHEN 1 THEN 'webp' " +
        "WHEN 2 THEN 'webp' WHEN 3 THEN 'wav' WHEN 4 THEN 'avif' " +
        "WHEN 5 THEN 'mp4' WHEN 7 THEN 'webm' WHEN 8 THEN 'ogg' " +
        "WHEN 9 THEN 'aiff' WHEN 10 THEN 'aac' WHEN 11 THEN 'm4a' " +
        "WHEN 12 THEN 'mpegts' WHEN 13 THEN 'mp4seg' " +
        "ELSE 'unknown' END AS kind, " +
        s"CASE doc_id % 14 $lenCase " +
        "ELSE 1 + octet_length(encode(text)) END AS len, " +
        "CASE doc_id % 14 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 3 THEN 1 WHEN 9 THEN 1 ELSE 0 END AS dec " +
        "FROM documents) " +
        "SELECT source, kind, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(len) AS BIGINT) AS n_bytes, " +
        "CAST(sum(dec) AS BIGINT) AS n_decoded, " +
        "CAST(count(*) - sum(dec) AS BIGINT) AS n_stubbed, " +
        "CAST(((count(*) - sum(dec)) * 1000000) // count(*) AS BIGINT) AS stub_ppm, " +
        "CAST((sum(dec) * 10000) // count(*) AS BIGINT) AS pair_recall_projection_bps " +
        "FROM src GROUP BY source, kind ORDER BY source, kind"
    }) { (s, d) =>
      val im = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 2).foreach(x => (0 until 2).foreach(y => im.setRGB(x, y, 0x123456)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      val png = bos.toByteArray
      val tinyWebm = Array(0x1A, 0x45, 0xDF, 0xA3, 0x9F, 0x42, 0x82, 0x84)
        .map(_.toByte) ++ "webm".getBytes("ISO-8859-1")
      val tinyOgg = "OggS".getBytes("ISO-8859-1") ++ Array[Byte](0, 2, 0, 0)
      val payload = when(col("doc_id") % 14 === 0, lit(png))
        .when(col("doc_id") % 14 === 1, lit(TinyWebp))
        .when(col("doc_id") % 14 === 2, lit(LossyWebp))
        .when(col("doc_id") % 14 === 3, lit(TinyWav))
        .when(col("doc_id") % 14 === 4, lit(ftypMagic("avif")))
        .when(col("doc_id") % 14 === 5, lit(ftypMagic("mp42")))
        .when(col("doc_id") % 14 === 7, lit(tinyWebm))
        .when(col("doc_id") % 14 === 8, lit(tinyOgg))
        .when(col("doc_id") % 14 === 9, lit(TinyAiff))
        .when(col("doc_id") % 14 === 10, lit(aacBytes(4, 2, 0, 1, 1)))
        .when(col("doc_id") % 14 === 11, lit(ftypMagic("M4A ")))
        .when(col("doc_id") % 14 === 12, lit(Magics.toMap.apply("mpegts")))
        .when(col("doc_id") % 14 === 13, lit(Magics.toMap.apply("mp4seg")))
        .otherwise(concat(unhex(lit("00")), col("text").cast("binary")))
      val media = Tables.documents(s, d)
        .select(concat(lit("s"), (col("doc_id") % 2).cast("string"))
          .as("source"), payload.as("payload"))
      Multimodal.mediaDataCard(media, "source").orderBy("source", "kind")
    },

    // Scan-side image dimensions without decode: PNG/GIF/BMP/TIFF
    // headers CONSTRUCTED from doc_id arithmetic (BE IHDR fields, LE
    // logical-screen fields, LE BITMAPINFOHEADER fields incl. the
    // signed top-down height, and r14's first-IFD TIFF in BOTH byte
    // orders — a SHORT-typed width entry and a LONG-typed height
    // entry, exercising the type-dependent value read), parsed back by
    // the pure-codegen imageDimsCol — construction is lpad/hex/unhex
    // arithmetic, the parse is substring/conv arithmetic, so a
    // parse-offset bug breaks the identity the oracle states (and the
    // spec separately pins the parse against real ImageIO-encoded
    // files). Text rows read null.
    q("q_x_image_dims",
      "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 7 = 6 THEN NULL " +
        "WHEN doc_id % 7 = 5 THEN (CASE WHEN doc_id % 256 = 0 THEN 256 ELSE doc_id % 256 END) " +
        "ELSE doc_id % 500 + 1 END AS BIGINT) AS w, " +
        "CAST(CASE WHEN doc_id % 7 = 6 THEN NULL " +
        "WHEN doc_id % 7 = 5 THEN (CASE WHEN doc_id % 251 = 0 THEN 256 ELSE doc_id % 251 END) " +
        "ELSE doc_id % 333 + 1 END AS BIGINT) AS h " +
        "FROM documents ORDER BY doc_id") { (s, d) =>
      val w = col("doc_id") % 500 + 1
      val h = col("doc_id") % 333 + 1
      def beHex(v: org.apache.spark.sql.Column, bytes: Int) =
        lpad(hex(v), 2 * bytes, "0")
      def leHex(v: org.apache.spark.sql.Column, bytes: Int) = {
        val be = beHex(v, bytes)
        concat((0 until bytes).map(i =>
          substring(be, 2 * bytes - 2 * i - 1, 2)): _*)
      }
      def strHex(t: String) =
        lit(t.getBytes("ISO-8859-1").map("%02X".format(_)).mkString)
      val pngHex = concat(lit("89504E470D0A1A0A"), lit("0000000D"),
        strHex("IHDR"), beHex(w, 4), beHex(h, 4), lit("08060000"))
      val gifHex = concat(strHex("GIF89a"), leHex(w, 2), leHex(h, 2),
        lit("F70000"))
      // BMP: signed height — even doc_ids store −h (top-down rows)
      val bmpStoredH = when(col("doc_id") % 2 === 0,
        lit(4294967296L) - h).otherwise(h)
      val bmpHex = concat(strHex("BM"), lit("00000000"), lit("00000000"),
        lit("36000000"), leHex(lit(40L), 4), leHex(w, 4),
        leHex(bmpStoredH, 4), lit("0100"))
      // TIFF first IFD at offset 8, two entries: ImageWidth (256) as a
      // SHORT (value left-justified in the 4-byte field), ImageLength
      // (257) as a LONG — both byte orders
      val tiffLeHex = concat(lit("49492A00"), leHex(lit(8L), 4),
        leHex(lit(2L), 2),
        leHex(lit(256L), 2), leHex(lit(3L), 2), leHex(lit(1L), 4),
        leHex(w, 2), lit("0000"),
        leHex(lit(257L), 2), leHex(lit(4L), 2), leHex(lit(1L), 4),
        leHex(h, 4),
        lit("00000000"))
      val tiffBeHex = concat(lit("4D4D002A"), beHex(lit(8L), 4),
        beHex(lit(2L), 2),
        beHex(lit(256L), 2), beHex(lit(3L), 2), beHex(lit(1L), 4),
        beHex(w, 2), lit("0000"),
        beHex(lit(257L), 2), beHex(lit(4L), 2), beHex(lit(1L), 4),
        beHex(h, 4),
        lit("00000000"))
      // ICO: single dimension BYTES with the 0-means-256 rule — planted
      // as raw mod-256/mod-251 bytes so the zero edge is exercised
      val icoHex = concat(lit("00000100"), lit("0100"),
        lpad(hex(col("doc_id") % 256), 2, "0"),
        lpad(hex(col("doc_id") % 251), 2, "0"), lit("0" * 12))
      // text rows get a 0x00 prefix so a text that happens to start
      // with a magic can't turn the planted-null row into a parse
      val payload = when(col("doc_id") % 7 === 0, unhex(pngHex))
        .when(col("doc_id") % 7 === 1, unhex(gifHex))
        .when(col("doc_id") % 7 === 2, unhex(bmpHex))
        .when(col("doc_id") % 7 === 3, unhex(tiffLeHex))
        .when(col("doc_id") % 7 === 4, unhex(tiffBeHex))
        .when(col("doc_id") % 7 === 5, unhex(icoHex))
        .otherwise(concat(unhex(lit("00")), col("text").cast("binary")))
      // payload materializes as its OWN projection before the parse:
      // feeding the construction tree straight into imageDimsCol would
      // substitute it into every one of the parser's ~150 byte reads
      // (CollapseProject keeps a multiply-referenced non-cheap alias)
      Tables.documents(s, d)
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"),
          Multimodal.imageDimsCol(col("payload")).as("d"))
        .select(col("doc_id"), col("d.w").as("w"), col("d.h").as("h"))
        .orderBy("doc_id")
    },

    // Scan-side AUDIO stream parameters without decode (the r14
    // imageDims sibling): FLAC STREAMINFO and canonical-WAV headers
    // constructed from doc_id arithmetic (the FLAC rate/channels/
    // samples bit-packing built as one BIGINT and hex-serialized; the
    // WAV fmt/data chunks as LE fields plus a real zero-filled data
    // section sized by the header), parsed back by the pure-codegen
    // audioDimsCol. Truncated-FLAC and 0x00-guarded text rows read
    // null. The identity the oracle states covers rate, channels,
    // per-channel sample count and the exact integer duration division.
    q("q_x_audio_dims",
      "WITH p AS (SELECT doc_id, doc_id % 4 AS lane, " +
        "8000 + doc_id % 40000 AS frate, doc_id % 8 + 1 AS fch, " +
        "doc_id % 100000 + 1 AS fns, " +
        "8000 + doc_id % 8000 AS wrate, doc_id % 2 + 1 AS wch, " +
        "doc_id % 50 + 1 AS wnf FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE lane WHEN 0 THEN frate WHEN 1 THEN wrate END AS BIGINT) AS sample_rate, " +
        "CAST(CASE lane WHEN 0 THEN fch WHEN 1 THEN wch END AS BIGINT) AS channels, " +
        "CAST(CASE lane WHEN 0 THEN fns WHEN 1 THEN wnf END AS BIGINT) AS n_samples, " +
        "CAST(CASE lane WHEN 0 THEN (fns * 1000000) // frate " +
        "WHEN 1 THEN (wnf * 1000000) // wrate END AS BIGINT) AS duration_micros " +
        "FROM p ORDER BY doc_id") { (s, d) =>
      def beHex(v: org.apache.spark.sql.Column, bytes: Int) =
        lpad(hex(v), 2 * bytes, "0")
      def leHex(v: org.apache.spark.sql.Column, bytes: Int) = {
        val be = beHex(v, bytes)
        concat((0 until bytes).map(i =>
          substring(be, 2 * bytes - 2 * i - 1, 2)): _*)
      }
      def strHex(t: String) =
        lit(t.getBytes("ISO-8859-1").map("%02X".format(_)).mkString)
      val lane = col("doc_id") % 4
      // FLAC: rate<<44 | (ch-1)<<41 | (bps-1=15)<<36 | n_samples, as
      // one positive BIGINT (rate < 2^19 keeps the top bit clear)
      val fRate = col("doc_id") % 40000 + 8000
      val fCh = col("doc_id") % 8 + 1
      val fNs = col("doc_id") % 100000 + 1
      val packed = fRate * lit(17592186044416L) +
        (fCh - 1) * lit(2199023255552L) + lit(15L * 68719476736L) + fNs
      val flacHex = concat(strHex("fLaC"), lit("00000022"),
        lit("10001000"), lit("000000000000"),
        beHex(packed, 8), lit("0" * 32))
      // canonical WAV: PCM 16-bit, data chunk sized by the header and
      // filled with zero samples so the chunk-fit guard holds
      val wRate = col("doc_id") % 8000 + 8000
      val wCh = col("doc_id") % 2 + 1
      val wNf = col("doc_id") % 50 + 1
      val wDataLen = wNf * 2 * wCh
      val wavHex = concat(strHex("RIFF"), leHex(wDataLen + 36, 4),
        strHex("WAVE"), strHex("fmt "), lit("10000000"), lit("0100"),
        leHex(wCh, 2), leHex(wRate, 4), leHex(wRate * wCh * 2, 4),
        leHex(wCh * 2, 2), lit("1000"),
        strHex("data"), leHex(wDataLen, 4),
        call_function("repeat", lit("00"), wDataLen.cast("int")))
      val payload = when(lane === 0, unhex(flacHex))
        .when(lane === 1, unhex(wavHex))
        .when(lane === 2,
          concat(unhex(lit("00")), col("text").cast("binary")))
        .otherwise(call_function("substring", unhex(flacHex), lit(1), lit(30)))
      Tables.documents(s, d)
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"),
          Multimodal.audioDimsCol(col("payload")).as("a"))
        .select(col("doc_id"), col("a.sample_rate").as("sample_rate"),
          col("a.channels").as("channels"),
          col("a.n_samples").as("n_samples"),
          col("a.duration_micros").as("duration_micros"))
        .orderBy("doc_id")
    },

    // Scan-side VIDEO stream parameters without demux (the r14
    // audio/image siblings, completing the size-gate matrix):
    // canonical-layout AVI headers constructed from doc_id arithmetic
    // (LIST hdrl + AVIMAINHEADER LE fields), parsed back by the
    // pure-codegen videoDimsCol incl. the µs×frames exact duration
    // product and the overflow sanity guards. Torn-AVI and
    // 0x00-guarded text rows read null; the guard lane (µs > 10⁹)
    // must ALSO read null in both engines.
    q("q_x_video_dims",
      "WITH p AS (SELECT doc_id, doc_id % 4 AS lane, " +
        "doc_id % 100000 + 1 AS us, doc_id % 10000 + 1 AS fr, " +
        "doc_id % 1920 + 1 AS w, doc_id % 1080 + 1 AS h FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE lane WHEN 0 THEN w END AS BIGINT) AS width, " +
        "CAST(CASE lane WHEN 0 THEN h END AS BIGINT) AS height, " +
        "CAST(CASE lane WHEN 0 THEN fr END AS BIGINT) AS n_frames, " +
        "CAST(CASE lane WHEN 0 THEN us * fr END AS BIGINT) AS duration_micros " +
        "FROM p ORDER BY doc_id") { (s, d) =>
      def beHex(v: org.apache.spark.sql.Column, bytes: Int) =
        lpad(hex(v), 2 * bytes, "0")
      def leHex(v: org.apache.spark.sql.Column, bytes: Int) = {
        val be = beHex(v, bytes)
        concat((0 until bytes).map(i =>
          substring(be, 2 * bytes - 2 * i - 1, 2)): _*)
      }
      def strHex(t: String) =
        lit(t.getBytes("ISO-8859-1").map("%02X".format(_)).mkString)
      val lane = col("doc_id") % 4
      val us = col("doc_id") % 100000 + 1
      val fr = col("doc_id") % 10000 + 1
      val w = col("doc_id") % 1920 + 1
      val h = col("doc_id") % 1080 + 1
      def aviHex(usC: org.apache.spark.sql.Column) = concat(strHex("RIFF"),
        leHex(lit(80L), 4), strHex("AVI "), strHex("LIST"),
        leHex(lit(68L), 4), strHex("hdrl"), strHex("avih"),
        leHex(lit(56L), 4),
        leHex(usC, 4), lit("0" * 24), leHex(fr, 4), lit("0" * 24),
        leHex(w, 4), leHex(h, 4), lit("0" * 32))
      val payload = when(lane === 0, unhex(aviHex(us)))
        // the overflow guard lane: µs-per-frame 2·10⁹ > the 10⁹ cap
        .when(lane === 1, unhex(aviHex(lit(2000000000L))))
        .when(lane === 2,
          concat(unhex(lit("00")), col("text").cast("binary")))
        .otherwise(call_function("substring", unhex(aviHex(us)),
          lit(1), lit(40)))
      Tables.documents(s, d)
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"),
          Multimodal.videoDimsCol(col("payload")).as("v"))
        .select(col("doc_id"), col("v.width").as("width"),
          col("v.height").as("height"), col("v.n_frames").as("n_frames"),
          col("v.duration_micros").as("duration_micros"))
        .orderBy("doc_id")
    },

    // The JVM-walk half of the video front door (the r15 EBML/WebM +
    // mp4-sample-table additions): payloads CONSTRUCTED from doc_id
    // arithmetic inside mapPartitions (WebM with a float64 Duration in
    // default-TimecodeScale units; mp4 with an stsz count; a
    // fragmented-style mp4 whose mvhd carries the 0xFFFFFFFF unknown
    // sentinel and whose frames come from the stts sum; junk; ogg),
    // walked back by videoDims. The oracle derives every field from
    // the same planting arithmetic — incl. the duration-UNKNOWN rule
    // (mvhd 0/all-ones must read NULL, never a 0 the gate would drop).
    q("q_x_video_meta",
      "WITH p AS (SELECT doc_id, doc_id % 5 AS lane, " +
        "doc_id % 100000 + 1 AS wdur, doc_id % 1920 + 1 AS w, " +
        "doc_id % 1080 + 1 AS h, doc_id % 90000 + 1 AS ts, " +
        "doc_id % 1000000 AS mdur, doc_id % 5000 + 1 AS f1, " +
        "doc_id % 100 + 1 AS fa, doc_id % 50 + 1 AS fb FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN lane <= 2 THEN w END AS BIGINT) AS width, " +
        "CAST(CASE WHEN lane <= 2 THEN h END AS BIGINT) AS height, " +
        "CAST(CASE WHEN lane = 1 THEN f1 WHEN lane = 2 THEN fa + fb END AS BIGINT) AS n_frames, " +
        "CAST(CASE WHEN lane = 0 THEN wdur * 1000 " +
        "WHEN lane = 1 AND mdur > 0 THEN (mdur * 1000000) // ts END AS BIGINT) AS duration_micros " +
        "FROM p ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val payload: Array[Byte] = (id % 5) match {
              case 0 => webmBytes((id % 100000 + 1).toDouble,
                id % 1920 + 1, id % 1080 + 1)
              case 1 => mp4Bytes(id % 90000 + 1, id % 1000000,
                id % 1920 + 1, id % 1080 + 1,
                mp4Box("stsz", be(0L, 4) ++ be(0L, 4) ++ be(id % 5000 + 1, 4)))
              case 2 => mp4Bytes(id % 90000 + 1, 0xffffffffL,
                id % 1920 + 1, id % 1080 + 1,
                mp4Box("stts", be(0L, 4) ++ be(2L, 4) ++
                  be(id % 100 + 1, 4) ++ be(100L, 4) ++
                  be(id % 50 + 1, 4) ++ be(200L, 4)))
              case 3 => "no container here".getBytes("ISO-8859-1")
              case _ => "OggS".getBytes("ISO-8859-1") ++ Array[Byte](0, 2)
            }
            val m = Multimodal.videoDims(payload)
            (id, m.map(_.width), m.map(_.height), m.flatMap(_.n_frames),
              m.flatMap(_.duration_micros))
          }
        }.toDF("doc_id", "width", "height", "n_frames", "duration_micros")
        .orderBy("doc_id")
    },

    // The r15 FLAC decode's parity law as an oracle: per doc_id, the
    // SAME square-wave samples are written as a canonical WAV and as a
    // real FLAC (verbatim frames), and the engine must (a) decode the
    // FLAC to exactly the planted sample count and (b) produce the
    // IDENTICAL 64-bit envelope signature from both containers —
    // lossless re-encoding is perceptually invisible. The oracle
    // derives the count from the planting arithmetic and pins parity
    // true on every row; a decoder bug (wrong samples, wrong
    // normalization, torn-frame misparse) breaks one or both.
    q("q_x_flac_envelope",
      "SELECT doc_id, CAST(2048 + doc_id % 512 AS BIGINT) AS n_samples, " +
        "true AS parity FROM documents ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      // spreadScan: the whole FLAC encode+parse runs inside this map —
      // a single-row-group scan would pin it to one core (3.1 s single
      // task at sf0.1; guide §2.5).
      graft.llmops.Corpus.spreadScan(
          Tables.documents(s, d).select(col("doc_id"))).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val n = (2048 + id % 512).toInt
            val flip = (64 + id % 32).toInt
            val a = (id % 8000 + 1000).toInt
            val samples = Array.tabulate(n)(i =>
              if ((i / flip) % 2 == 0) a else -(a / 3))
            val wav = wavBytes(samples, 8000)
            val flac = graft.llmops.Flac.encodeVerbatim(samples,
              channels = 1, rate = 8000, bits = 16)
            val hw = Multimodal.audioEnvelopeHash(wav)
            val hf = Multimodal.audioEnvelopeHash(flac)
            val nSamp = Multimodal.flacMonoSamples(flac)
              .map(_.length.toLong).getOrElse(-1L)
            (id, nSamp, hw.isDefined && hw == hf)
          }
        }.toDF("doc_id", "n_samples", "parity").orderBy("doc_id")
    },

    // The JVM-walk half of the AUDIO front door (r15 — the Ogg meta
    // walk plus the first oracle over the mp3 frame hop): Opus (48 kHz
    // granule grid minus pre-skip), Vorbis (granule at the declared
    // rate), CBR mp3 (k frames x 1152 samples at 44100), m4a (mdhd
    // timescale/duration), ADTS AAC (k frames x 1024x(rdb+1) samples
    // across four table rates), AIFF (COMM with the 80-bit extended
    // rate built by integer shifts), and junk — payloads constructed
    // from doc_id arithmetic inside mapPartitions,
    // walked back by audioDims; the oracle derives every field incl.
    // the exact integer duration divisions from the same arithmetic.
    q("q_x_audio_meta",
      "WITH p AS (SELECT doc_id, doc_id % 7 AS lane, " +
        "doc_id % 8 + 1 AS och, doc_id % 1000 AS opre, " +
        "doc_id % 500000 + 1 AS ons, " +
        "8000 + doc_id % 40000 AS vrate, doc_id % 2 + 1 AS vch, " +
        "doc_id % 500000 + 1 AS vns, " +
        "(doc_id % 20 + 1) * 1152 AS mns, " +
        "8000 + doc_id % 40000 AS arate, doc_id % 2 + 1 AS ach, " +
        "doc_id % 900000 + 1 AS ans, " +
        "CASE doc_id % 4 WHEN 0 THEN 48000 WHEN 1 THEN 44100 WHEN 2 THEN 16000 ELSE 8000 END AS crate, " +
        "CASE WHEN doc_id % 7 + 1 = 7 THEN 8 ELSE doc_id % 7 + 1 END AS cch, " +
        "(doc_id % 25 + 1) * 1024 * (doc_id % 3 + 1) AS cns, " +
        "4000 + doc_id % 60000 AS irate, doc_id % 6 + 1 AS ich, " +
        "doc_id % 700000 + 1 AS ifr " +
        "FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE lane WHEN 0 THEN 48000 WHEN 1 THEN vrate WHEN 2 THEN 44100 WHEN 3 THEN arate WHEN 4 THEN crate WHEN 5 THEN irate END AS BIGINT) AS sample_rate, " +
        "CAST(CASE lane WHEN 0 THEN och WHEN 1 THEN vch WHEN 2 THEN 2 WHEN 3 THEN ach WHEN 4 THEN cch WHEN 5 THEN ich END AS BIGINT) AS channels, " +
        "CAST(CASE lane WHEN 0 THEN ons WHEN 1 THEN vns WHEN 2 THEN mns WHEN 3 THEN ans WHEN 4 THEN cns WHEN 5 THEN ifr END AS BIGINT) AS n_samples, " +
        "CAST(CASE lane WHEN 0 THEN (ons * 1000000) // 48000 " +
        "WHEN 1 THEN (vns * 1000000) // vrate " +
        "WHEN 2 THEN (mns * 1000000) // 44100 " +
        "WHEN 3 THEN (ans * 1000000) // arate " +
        "WHEN 4 THEN (cns * 1000000) // crate " +
        "WHEN 5 THEN (ifr * 1000000) // irate END AS BIGINT) AS duration_micros " +
        "FROM p ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val payload: Array[Byte] = (id % 7) match {
              case 0 => opusOgg(id % 8 + 1, id % 1000, id % 500000 + 1)
              case 1 => vorbisOgg(8000 + id % 40000, id % 2 + 1,
                id % 500000 + 1)
              case 2 =>
                // CBR MPEG1 Layer III: 44100 Hz, 128 kbps, stereo ->
                // 417-byte frames of 1152 samples each
                val k = (id % 20 + 1).toInt
                val frame = Array[Byte](0xFF.toByte, 0xFB.toByte,
                  0x90.toByte, 0x00) ++ new Array[Byte](413)
                Array.fill(k)(frame).flatten
              case 3 => m4aBytes(8000 + id % 40000, id % 900000 + 1,
                id % 2 + 1)
              case 4 =>
                val sfi = (id % 4) match {
                  case 0 => 3; case 1 => 4; case 2 => 8; case _ => 11
                }
                aacBytes(sfi, (id % 7 + 1).toInt, (id % 3).toInt,
                  (id % 25 + 1).toInt, (id % 9).toInt)
              case 5 => aiffBytes(4000 + id % 60000, id % 700000 + 1,
                id % 6 + 1)
              case _ => "no audio here".getBytes("ISO-8859-1")
            }
            val m = Multimodal.audioDims(payload)
            (id, m.map(_.sample_rate), m.map(_.channels),
              m.map(_.n_samples), m.map(_.duration_micros))
          }
        }.toDF("doc_id", "sample_rate", "channels", "n_samples",
          "duration_micros")
        .orderBy("doc_id")
    },

    // The scan-side media SIZE GATE composed end to end: payloads whose
    // constructed headers prove them out of range (pixels for images
    // and video, duration for audio and video) drop BEFORE any decode;
    // unknown kinds and torn headers pass through as 'no_header' (the
    // stated only-a-parsed-header-can-drop policy). Both engines replay
    // the dims arithmetic AND the rule ORDER (axis cap, too many, too
    // few, too short, too long) value-exact across six planted lanes.
    q("q_x_media_size_gate",
      "WITH p AS (SELECT doc_id, doc_id % 6 AS lane, " +
        "(doc_id % 2000 + 1) * (doc_id % 1500 + 1) AS ipix, " +
        "((doc_id % 400000) * 1000000) // (8000 + doc_id % 8000) AS fdur, " +
        "(doc_id % 300 + 1) * (doc_id % 200 + 1) AS vpix, " +
        "(doc_id % 50000 + 1) * (doc_id % 2000 + 1) AS vdur FROM documents), " +
        "r AS (SELECT doc_id, " +
        "CASE lane WHEN 0 THEN 'png' WHEN 1 THEN 'flac' WHEN 2 THEN 'avi' " +
        "WHEN 3 THEN 'png' WHEN 4 THEN 'unknown' ELSE 'flac' END AS kind, " +
        "CASE lane " +
        "WHEN 0 THEN (CASE WHEN ipix > 1000000 THEN 'too_many_pixels' " +
        "WHEN ipix < 10000 THEN 'too_few_pixels' ELSE 'ok' END) " +
        "WHEN 1 THEN (CASE WHEN fdur < 1000000 THEN 'too_short' " +
        "WHEN fdur > 30000000 THEN 'too_long' ELSE 'ok' END) " +
        "WHEN 2 THEN (CASE WHEN vpix > 1000000 THEN 'too_many_pixels' " +
        "WHEN vpix < 10000 THEN 'too_few_pixels' " +
        "WHEN vdur < 1000000 THEN 'too_short' " +
        "WHEN vdur > 30000000 THEN 'too_long' ELSE 'ok' END) " +
        "WHEN 3 THEN 'too_many_pixels' " +
        "ELSE 'no_header' END AS reason FROM p) " +
        "SELECT doc_id, kind, reason, reason IN ('ok', 'no_header') AS keep " +
        "FROM r ORDER BY doc_id") { (s, d) =>
      def beHex(v: org.apache.spark.sql.Column, bytes: Int) =
        lpad(hex(v), 2 * bytes, "0")
      def leHex(v: org.apache.spark.sql.Column, bytes: Int) = {
        val be = beHex(v, bytes)
        concat((0 until bytes).map(i =>
          substring(be, 2 * bytes - 2 * i - 1, 2)): _*)
      }
      def strHex(t: String) =
        lit(t.getBytes("ISO-8859-1").map("%02X".format(_)).mkString)
      val lane = col("doc_id") % 6
      def pngHex(w: org.apache.spark.sql.Column,
          h: org.apache.spark.sql.Column) =
        concat(lit("89504E470D0A1A0A"), lit("0000000D"), strHex("IHDR"),
          beHex(w, 4), beHex(h, 4), lit("08060000"))
      val fRate = col("doc_id") % 8000 + 8000
      val fNs = col("doc_id") % 400000
      val packed = fRate * lit(17592186044416L) + lit(15L * 68719476736L) + fNs
      val flacHex = concat(strHex("fLaC"), lit("00000022"), lit("10001000"),
        lit("000000000000"), beHex(packed, 8), lit("0" * 32))
      val aviHex = concat(strHex("RIFF"), leHex(lit(80L), 4), strHex("AVI "),
        strHex("LIST"), leHex(lit(68L), 4), strHex("hdrl"), strHex("avih"),
        leHex(lit(56L), 4), leHex(col("doc_id") % 50000 + 1, 4),
        lit("0" * 24), leHex(col("doc_id") % 2000 + 1, 4), lit("0" * 24),
        leHex(col("doc_id") % 300 + 1, 4), leHex(col("doc_id") % 200 + 1, 4),
        lit("0" * 32))
      val payload = when(lane === 0,
        unhex(pngHex(col("doc_id") % 2000 + 1, col("doc_id") % 1500 + 1)))
        .when(lane === 1, unhex(flacHex))
        .when(lane === 2, unhex(aviHex))
        // an axis >= 2^20 is definitionally too large — the cap lane
        .when(lane === 3,
          unhex(pngHex(lit(1048576L) + col("doc_id") % 100, lit(10L))))
        .when(lane === 4,
          concat(unhex(lit("00")), col("text").cast("binary")))
        .otherwise(call_function("substring", unhex(flacHex), lit(1), lit(30)))
      Multimodal.sizeGate(
          Tables.documents(s, d)
            .select(col("doc_id"), payload.as("payload")),
          minPixels = 10000L, maxPixels = 1000000L,
          minDurationMicros = 1000000L, maxDurationMicros = 30000000L)
        .select(col("doc_id"), col("kind"), col("reason"), col("keep"))
        .orderBy("doc_id")
    },

    // SRT/WebVTT subtitle cues (r15): per doc a subtitle file is
    // CONSTRUCTED from doc_id arithmetic — SRT with renumbered counter
    // lines on even docs, WebVTT (BOM + NOTE block + cue-id lines +
    // settings + hours-optional timestamps) on odd — and parsed back
    // executor-side into (ordinal, start/end micros, text) rows; one
    // planted broken timing line per doc_id%10==7 doc must SKIP its
    // whole block and shift the ordinals. The oracle derives every
    // field (incl. the skip and the ordinal shift) from the same
    // arithmetic, so a timestamp-parse or block-walk bug breaks the
    // identity.
    q("q_x_subtitle_cues",
      "WITH p AS (SELECT doc_id, doc_id % 5 + 1 AS k, " +
        "doc_id % 10 = 7 AS broken, doc_id % 3600000 AS base " +
        "FROM documents), " +
        "c AS (SELECT doc_id, broken, base, " +
        "unnest(generate_series(1, k)) AS i FROM p) " +
        "SELECT doc_id, " +
        "CAST(i - CASE WHEN broken AND i > 2 THEN 1 ELSE 0 END AS BIGINT) AS cue_index, " +
        "CAST((base + (i-1)*2000) * 1000 AS BIGINT) AS start_micros, " +
        "CAST((base + (i-1)*2000 + 1500) * 1000 AS BIGINT) AS end_micros, " +
        "'cue ' || i || ' of doc ' || doc_id || chr(10) || 'line two ' || i AS text " +
        "FROM c WHERE NOT (broken AND i = 2) " +
        "ORDER BY doc_id, cue_index") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val k = (id % 5 + 1).toInt
            val broken = id % 10 == 7
            val base = id % 3600000
            def ts(ms: Long, sep: Char, forceH: Boolean): String = {
              val h = ms / 3600000; val m = ms / 60000 % 60
              val sec = ms / 1000 % 60; val f = ms % 1000
              if (h > 0 || forceH) f"$h%02d:$m%02d:$sec%02d$sep$f%03d"
              else f"$m%02d:$sec%02d$sep$f%03d"
            }
            val doc = if (id % 2 == 0) {
              (1 to k).map { i =>
                val st = base + (i - 1) * 2000L; val en = st + 1500L
                val timing =
                  if (broken && i == 2) "not a timing line"
                  else s"${ts(st, ',', forceH = true)} --> " +
                    ts(en, ',', forceH = true)
                // counter lines deliberately renumbered: the ordinal
                // contract must ignore them
                s"${i + 10}\n$timing\ncue $i of doc $id\nline two $i"
              }.mkString("\n\n")
            } else {
              val cues = (1 to k).map { i =>
                val st = base + (i - 1) * 2000L; val en = st + 1500L
                val timing =
                  if (broken && i == 2) "not a timing line"
                  else s"${ts(st, '.', forceH = st >= 3600000L)} --> " +
                    ts(en, '.', forceH = en >= 3600000L) + " align:start"
                (if (i % 2 == 0) s"cue-id-$i\n" else "") +
                  s"$timing\ncue $i of doc $id\nline two $i"
              }.mkString("\n\n")
              "\uFEFF" + "WEBVTT\n\nNOTE a comment block\nstill the note\n\n" +
                cues
            }
            graft.ingest.Subtitles.parse(doc).map(c =>
              (id, c.cue_index, c.start_micros, c.end_micros, c.text))
          }
        }.toDF("doc_id", "cue_index", "start_micros", "end_micros", "text")
        .orderBy("doc_id", "cue_index")
    },

    // CMAF/fMP4 segment durations (r15 — the tsMeta sibling): per doc
    // a styp+sidx(+moof) segment whose reference list sums
    // doc_id%8+1 subsegments of doc_id%50000+1 units each at a
    // doc_id-derived timescale — the oracle replays the exact
    // sum*1e6//timescale division; every fifth doc is moof-only
    // (low-latency form, no sidx) and must read NULL.
    q("q_x_mp4seg_duration",
      "WITH p AS (SELECT doc_id, doc_id % 8 + 1 AS k, " +
        "doc_id % 50000 + 1 AS u, 1000 + doc_id % 90000 AS ts " +
        "FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "ELSE (k * u * 1000000) // ts END AS BIGINT) AS duration_micros " +
        "FROM p ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val k = (id % 8 + 1).toInt
            val u = id % 50000 + 1
            val ts = 1000 + id % 90000
            val v = (id % 2).toInt
            val styp = be(16L, 4) ++ "stypmsdh".getBytes("ISO-8859-1") ++
              be(0L, 4)
            val moof = mp4Box("moof", mp4Box("mfhd", be(0L, 4) ++ be(1L, 4)))
            val payload: Array[Byte] =
              if (id % 5 == 4) styp ++ moof
              else {
                val refs = Array.fill(k)(
                  be(0L, 4) ++ be(u, 4) ++ be(0x90000000L, 4)).flatten
                val body = be(v.toLong << 24, 4) ++ be(1L, 4) ++ be(ts, 4) ++
                  (if (v == 0) be(0L, 4) ++ be(0L, 4)
                   else be(0L, 8) ++ be(0L, 8)) ++
                  be(0L, 2) ++ be(k.toLong, 2) ++ refs
                styp ++ mp4Box("sidx", body) ++ moof
              }
            (id, Multimodal.mp4SegDuration(payload))
          }
        }.toDF("doc_id", "duration_micros")
        .orderBy("doc_id")
    },

    // JPEG EXIF orientation (r15): per doc a JPEG whose APP1/TIFF
    // carries the 1-8 orientation tag behind a padding entry, in a
    // byte order alternating LE/BE by doc_id — the oracle derives the
    // tag value from the arithmetic; every fifth doc carries no APP1
    // and reads NULL (the spec-default-1 class, the caller's to
    // apply).
    q("q_x_exif_orientation",
      "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "ELSE doc_id % 8 + 1 END AS BIGINT) AS orientation " +
        "FROM documents ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val o = (id % 8 + 1).toInt
            val le = id % 2 == 0
            def w16(v: Int): Array[Byte] =
              if (le) Array((v & 0xff).toByte, (v >> 8).toByte)
              else Array((v >> 8).toByte, (v & 0xff).toByte)
            def w32(v: Long): Array[Byte] =
              if (le) w16((v & 0xffff).toInt) ++ w16((v >> 16).toInt)
              else w16((v >> 16).toInt) ++ w16((v & 0xffff).toInt)
            val order = (if (le) "II" else "MM").getBytes("ISO-8859-1")
            // IFD0: a padding Make entry, then orientation (SHORT,
            // count 1, value in the tag's byte order)
            val e1 = w16(0x010f) ++ w16(2) ++ w32(4L) ++
              "puma".getBytes("ISO-8859-1")
            val e2 = w16(0x0112) ++ w16(3) ++ w32(1L) ++ w16(o) ++ w16(0)
            val tiff = order ++ w16(42) ++ w32(8L) ++ w16(2) ++
              e1 ++ e2 ++ w32(0L)
            val app1body = "Exif".getBytes("ISO-8859-1") ++
              Array[Byte](0, 0) ++ tiff
            val app1 = Array(0xFF.toByte, 0xE1.toByte) ++
              Array((((app1body.length + 2) >> 8) & 0xff).toByte,
                ((app1body.length + 2) & 0xff).toByte) ++ app1body
            val payload: Array[Byte] =
              if (id % 5 == 4)
                Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)
              else Array(0xFF.toByte, 0xD8.toByte) ++ app1 ++
                Array(0xFF.toByte, 0xD9.toByte)
            (id, Multimodal.exifOrientation(payload).map(_.toLong))
          }
        }.toDF("doc_id", "orientation")
        .orderBy("doc_id")
    },

    // DASH MPD manifests (r15 — the XML sibling of the HLS queries):
    // per doc an MPD with an ISO-8601 presentation duration built from
    // doc_id arithmetic (hours/minutes/seconds + a millisecond
    // fraction, read back LEXICALLY on the micro grid) and a
    // doc_id%3+1-deep video ladder plus one audio representation (no
    // width/height) — exploded to rows the oracle derives exactly.
    q("q_x_dash_mpd",
      "WITH p AS (SELECT doc_id, doc_id % 3 + 1 AS v, " +
        "(doc_id % 7200) * 1000000 + (doc_id % 1000) * 1000 AS dur " +
        "FROM documents), " +
        "vid AS (SELECT doc_id, dur, unnest(generate_series(1, v)) AS i FROM p), " +
        "rows_ AS (" +
        "SELECT doc_id, dur, CAST((doc_id % 5000 + i) * 1000 AS BIGINT) AS bandwidth_bps, " +
        "CAST(i * 640 AS BIGINT) AS width, CAST(i * 360 AS BIGINT) AS height, " +
        "'avc1.' || i AS codecs FROM vid " +
        "UNION ALL " +
        "SELECT doc_id, dur, CAST(128000 + doc_id % 100 AS BIGINT), " +
        "NULL, NULL, 'mp4a.40.2' FROM p) " +
        "SELECT doc_id, bandwidth_bps, width, height, codecs, " +
        "CAST(dur AS BIGINT) AS duration_micros " +
        "FROM rows_ ORDER BY doc_id, bandwidth_bps") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val v = (id % 3 + 1).toInt
            val t = id % 7200
            val iso = s"PT${t / 3600}H${t / 60 % 60}M${t % 60}." +
              "%03d".format(id % 1000) + "S"
            val reps = (1 to v).map { i =>
              s"""<Representation id="v$i" bandwidth="${(id % 5000 + i) * 1000}" width="${i * 640}" height="${i * 360}" codecs="avc1.$i"/>"""
            }.mkString
            val mpd =
              s"""<?xml version="1.0"?><MPD xmlns="urn:mpeg:dash:schema:mpd:2011" mediaPresentationDuration="$iso">""" +
                s"""<Period><AdaptationSet mimeType="video/mp4">$reps</AdaptationSet>""" +
                """<AdaptationSet mimeType="audio/mp4">""" +
                s"""<Representation id="a1" bandwidth="${128000 + id % 100}" codecs="mp4a.40.2"/>""" +
                "</AdaptationSet></Period></MPD>"
            val m = graft.ingest.Dash.parse(mpd.getBytes("UTF-8"))
            m.representations.map(x => (id, x.bandwidth_bps, x.width,
              x.height, x.codecs, m.duration_micros))
          }
        }.toDF("doc_id", "bandwidth_bps", "width", "height", "codecs",
          "duration_micros")
        .orderBy("doc_id", "bandwidth_bps")
    },

    // RSS/Atom podcast enclosures (r15 — the audio crawl's discovery
    // feed): per doc a feed of doc_id%4 items (zero-item article
    // feeds yield zero rows), each with an enclosure and its
    // itunes:duration in a ROTATING wire form (bare seconds / MM:SS /
    // HH:MM:SS) that must all read back to the same micro arithmetic;
    // a lying non-numeric length reads absent on every third item.
    // ODD docs write the SAME data as an Atom feed (entry +
    // rel="enclosure" link, with a decoy rel="alternate" link that
    // must never bind) — both dialects converge to identical rows.
    q("q_x_rss_enclosures",
      "WITH p AS (SELECT doc_id, doc_id % 4 AS k FROM documents), " +
        "c AS (SELECT doc_id, unnest(generate_series(1, k)) AS i FROM p WHERE k >= 1) " +
        "SELECT doc_id, 'ep ' || i || ' of doc ' || doc_id AS item_title, " +
        "'https://pod.example/d' || doc_id || '/e' || i || '.mp3' AS url, " +
        "'audio/mpeg' AS mime, " +
        "CAST(CASE WHEN i % 3 = 0 THEN NULL ELSE doc_id % 1000000 + i END AS BIGINT) AS length_bytes, " +
        "CAST((doc_id % 5400 + i) * 1000000 AS BIGINT) AS duration_micros " +
        "FROM c ORDER BY doc_id, url") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val k = (id % 4).toInt
            val items = (1 to k).map { i =>
              val secs = id % 5400 + i
              val durStr = (i % 3) match {
                case 0 => s"$secs"
                case 1 => s"${secs / 60}:" + "%02d".format(secs % 60)
                case _ => s"${secs / 3600}:" + "%02d".format(secs / 60 % 60) +
                  ":" + "%02d".format(secs % 60)
              }
              val len = if (i % 3 == 0) "three quarters of a show"
                else (id % 1000000 + i).toString
              if (id % 2 == 0)
                s"<item><title>ep $i of doc $id</title>" +
                  s"""<enclosure url="https://pod.example/d$id/e$i.mp3" type="audio/mpeg" length="$len"/>""" +
                  s"<itunes:duration>$durStr</itunes:duration></item>"
              else
                s"<entry><title>ep $i of doc $id</title>" +
                  s"""<link rel="alternate" href="https://pod.example/page$i"/>""" +
                  s"""<link rel="enclosure" href="https://pod.example/d$id/e$i.mp3" type="audio/mpeg" length="$len"/>""" +
                  s"<itunes:duration>$durStr</itunes:duration></entry>"
            }.mkString
            val feed =
              if (id % 2 == 0)
                """<?xml version="1.0"?><rss version="2.0" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">""" +
                  s"<channel><title>feed $id</title>$items</channel></rss>"
              else
                """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">""" +
                  s"<title>feed $id</title>$items</feed>"
            graft.ingest.Rss.enclosures(feed.getBytes("UTF-8")).map(e =>
              (id, e.item_title.orNull, e.url, e.mime.orNull,
                e.length_bytes, e.duration_micros))
          }
        }.toDF("doc_id", "item_title", "url", "mime", "length_bytes",
          "duration_micros")
        .orderBy("doc_id", "url")
    },

    // MPEG-TS segment probe (r15 — the HLS segment half): per doc a
    // .ts file of doc_id%30+3 packets whose FIRST and LAST carry PCR
    // timestamps planted so their 27 MHz delta divides back to exactly
    // (doc_id%5000+1)*1000 micros; every fourth doc omits PCRs (live
    // grab) and must read a NULL duration with the packet count
    // intact. The oracle derives both fields from the arithmetic.
    q("q_x_ts_probe",
      "SELECT doc_id, CAST(doc_id % 30 + 3 AS BIGINT) AS n_packets, " +
        "CAST(CASE WHEN doc_id % 4 = 3 THEN NULL " +
        "ELSE (doc_id % 5000 + 1) * 1000 END AS BIGINT) AS duration_micros " +
        "FROM documents ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            def packet(pcr: Option[Long]): Array[Byte] = {
              val p = new Array[Byte](188)
              p(0) = 0x47; p(2) = 0x21
              pcr match {
                case Some(v) =>
                  p(3) = 0x30 // adaptation field + payload
                  p(4) = 7; p(5) = 0x10 // PCR flag
                  val base = v / 300L; val ext = v % 300L
                  p(6) = (base >> 25).toByte
                  p(7) = (base >> 17).toByte
                  p(8) = (base >> 9).toByte
                  p(9) = (base >> 1).toByte
                  p(10) = (((base & 1L) << 7) | 0x7eL | (ext >> 8)).toByte
                  p(11) = (ext & 0xffL).toByte
                case None => p(3) = 0x10
              }
              p
            }
            val k = (id % 30 + 3).toInt
            val withPcr = id % 4 != 3
            val pcr1 = (id % 100000) * 300L
            val pcr2 = pcr1 + (id % 5000 + 1) * 27000L
            val bytes = (0 until k).flatMap { i =>
              if (withPcr && i == 0) packet(Some(pcr1))
              else if (withPcr && i == k - 1) packet(Some(pcr2))
              else packet(None)
            }.toArray
            val m = Multimodal.tsMeta(bytes).get
            (id, m.n_packets, m.duration_micros)
          }
        }.toDF("doc_id", "n_packets", "duration_micros")
        .orderBy("doc_id")
    },

    // HLS media playlists (r15): per doc an m3u8 with doc_id%20+1
    // EXTINF segments of (doc_id%9000+500) ms each (written as decimal
    // seconds, summed back LEXICALLY on the micro grid), a
    // TARGETDURATION, and ENDLIST on every third doc — the oracle
    // derives the exact micro sums; a float anywhere in the parse
    // breaks the identity.
    q("q_x_hls_media",
      "WITH p AS (SELECT doc_id, doc_id % 20 + 1 AS k, " +
        "doc_id % 9000 + 500 AS dms FROM documents) " +
        "SELECT doc_id, CAST(k AS BIGINT) AS n_segments, " +
        "CAST(k * dms * 1000 AS BIGINT) AS duration_micros, " +
        "CAST((dms // 1000 + 1) * 1000000 AS BIGINT) AS target_duration_micros, " +
        "doc_id % 3 = 0 AS ended " +
        "FROM p ORDER BY doc_id") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val k = (id % 20 + 1).toInt
            val dms = id % 9000 + 500
            val inf = s"${dms / 1000}.${"%03d".format(dms % 1000)}"
            val segs = (0 until k).map(i =>
              s"#EXTINF:$inf,\nseg$i.ts").mkString("\n")
            val doc = s"#EXTM3U\n#EXT-X-VERSION:3\n" +
              s"#EXT-X-TARGETDURATION:${dms / 1000 + 1}\n$segs\n" +
              (if (id % 3 == 0) "#EXT-X-ENDLIST\n" else "")
            val m = graft.ingest.Hls.parseMediaPlaylist(doc).get
            (id, m.n_segments, m.duration_micros,
              m.target_duration_micros.getOrElse(-1L), m.ended)
          }
        }.toDF("doc_id", "n_segments", "duration_micros",
          "target_duration_micros", "ended")
        .orderBy("doc_id")
    },

    // HLS master playlists (r15): per doc a variant ladder of
    // doc_id%4+1 STREAM-INF entries — each with a quoted CODECS list
    // whose embedded comma must NOT confuse the attribute read, a
    // comment line between tag and URI on even docs — exploded back to
    // (bandwidth, width, height, uri) rows the oracle derives.
    q("q_x_hls_master",
      "WITH p AS (SELECT doc_id, doc_id % 4 + 1 AS v FROM documents), " +
        "c AS (SELECT doc_id, unnest(generate_series(1, v)) AS i FROM p) " +
        "SELECT doc_id, " +
        "CAST((doc_id % 5000 + i) * 1000 AS BIGINT) AS bandwidth_bps, " +
        "CAST(i * 320 AS BIGINT) AS width, CAST(i * 180 AS BIGINT) AS height, " +
        "'var' || i || '/index.m3u8' AS uri " +
        "FROM c ORDER BY doc_id, bandwidth_bps") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val v = (id % 4 + 1).toInt
            val body = (1 to v).map { i =>
              val gap = if (id % 2 == 0) "\n# ladder comment" else ""
              s"#EXT-X-STREAM-INF:BANDWIDTH=${(id % 5000 + i) * 1000}," +
                s"""RESOLUTION=${i * 320}x${i * 180},CODECS="avc1.64001f,mp4a.40.2"""" +
                s"$gap\nvar$i/index.m3u8"
            }.mkString("\n")
            graft.ingest.Hls.parseMasterVariants(s"#EXTM3U\n$body\n")
              .map(x => (id, x.bandwidth_bps, x.width.getOrElse(-1L),
                x.height.getOrElse(-1L), x.uri))
          }
        }.toDF("doc_id", "bandwidth_bps", "width", "height", "uri")
        .orderBy("doc_id", "bandwidth_bps")
    })
}
