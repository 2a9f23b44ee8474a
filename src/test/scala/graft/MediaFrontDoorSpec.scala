package graft

import graft.llmops.Multimodal
import org.apache.spark.sql.functions._

/** Round-14 media front door: ISO-BMFF (`ftyp`) detection with
  * MP4/AVIF/HEIC/MOV/M4A brand routing, avif/heic dimensions via the
  * `ispe` box walk, TIFF dimensions via the first-IFD walk (JVM and the
  * codegen column), and the scan-side audio headers (WAV/FLAC/MP3
  * sample rate + duration without decode). Fixtures are hand-assembled
  * per the public specs (the WebpSpec discipline) plus real
  * ImageIO-encoded TIFFs for cross-checking the IFD walk.
  */
class MediaFrontDoorSpec extends SparkTestBase {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def be32(v: Long): Array[Byte] =
    b(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)

  private def s(t: String): Array[Byte] = t.getBytes("ISO-8859-1")

  /** A minimal ISO-BMFF file: ftyp box with the given major brand, then
    * any extra boxes appended verbatim.
    */
  private def ftypFile(brand: String, extra: Array[Byte] = Array.empty) = {
    require(brand.length == 4)
    be32(16) ++ s("ftyp") ++ s(brand) ++ be32(0) ++ extra
  }

  /** An ISO-BMFF box: 32-bit size header + type + payload. */
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ s(typ) ++ payload

  /** ispe property box: FullBox (version/flags 0) + BE32 w/h. */
  private def ispe(w: Long, h: Long): Array[Byte] =
    box("ispe", be32(0) ++ be32(w) ++ be32(h))

  test("detectKind + detectKindCol: ftyp brands, flac, mp3 (ID3 and " +
      "bare sync), and the unlisted-brand fallback") {
    import spark.implicits._
    val cases: Seq[(String, Array[Byte])] = Seq(
      "mp4" -> ftypFile("isom"),
      "mp4" -> ftypFile("mp42"),
      "avif" -> ftypFile("avif"),
      "heic" -> ftypFile("heic"),
      "heic" -> ftypFile("mif1"),
      "mov" -> ftypFile("qt  "),
      "m4a" -> ftypFile("M4A "),
      "isobmff" -> ftypFile("zzzz"),
      "flac" -> (s("fLaC") ++ b(0, 0, 0, 34)),
      "mp3" -> (s("ID3") ++ b(4, 0, 0, 0, 0, 0, 0)),
      "mp3" -> b(0xFF, 0xFB, 0x90, 0x00),
      "mp3" -> b(0xFF, 0xE2, 0x10, 0x00),
      // jpeg's FF D8 FF wins over the sync fallback (prefix rules first)
      "jpeg" -> b(0xFF, 0xD8, 0xFF, 0xE0),
      // 0xFF with a clear high bit in byte 2 is NOT a sync
      "unknown" -> b(0xFF, 0x7F, 0x00),
      // a short ftyp (no brand bytes) falls to the bare container
      "isobmff" -> (be32(8) ++ s("ftyp")),
      "ico" -> b(0x00, 0x00, 0x01, 0x00, 0x01, 0x00),
      "xml" -> s("<?xml version=\"1.0\"?><root/>"),
      "svg" -> s("<svg xmlns=\"http://www.w3.org/2000/svg\"/>"),
      // an XML-prologued svg reads xml — the stated prefix-rule scope
      "xml" -> s("<?xml version=\"1.0\"?><svg/>"),
      // r15: EBML family — DocType within the bounded window routes
      // webm/mkv; absent (or out of window) falls to the bare container
      "webm" -> (b(0x1A, 0x45, 0xDF, 0xA3, 0x9F) ++
        b(0x42, 0x82, 0x84) ++ s("webm")),
      "mkv" -> (b(0x1A, 0x45, 0xDF, 0xA3, 0xA3) ++
        b(0x42, 0x82, 0x88) ++ s("matroska")),
      "ebml" -> b(0x1A, 0x45, 0xDF, 0xA3, 0x84, 0x42, 0x86, 0x81, 0x01),
      "ebml" -> (b(0x1A, 0x45, 0xDF, 0xA3, 0xFF) ++
        new Array[Byte](70) ++ b(0x42, 0x82, 0x84) ++ s("webm")),
      // r15: the Ogg page capture pattern — the bare container stance
      "ogg" -> (s("OggS") ++ b(0, 2, 0, 0)))
    cases.zipWithIndex.foreach { case ((want, payload), i) =>
      assert(Multimodal.detectKind(payload) === want, s"case $i (jvm)")
    }
    val rows = cases.zipWithIndex
      .map { case ((want, payload), i) => (i, want, payload) }
      .toDF("i", "want", "payload")
      .select(col("i"), col("want"),
        Multimodal.detectKindCol(col("payload")).as("got"))
      .collect()
    rows.foreach(r =>
      assert(r.getString(2) === r.getString(1), s"case ${r.getInt(0)} (col)"))
  }

  test("ispeDims: avif/heic dims via meta/iprp/ipco, first-ispe rule, " +
      "largesize form, torn boxes reject") {
    val prop = box("iprp", box("ipco", ispe(420, 310)))
    val meta = box("meta", be32(0) ++ prop)
    val avif = ftypFile("avif", meta)
    assert(Multimodal.imageDims(avif) === Some((420, 310)))
    val heic = ftypFile("heic", meta)
    assert(Multimodal.imageDims(heic) === Some((420, 310)))
    // first ispe wins when several are present
    val twoProps = box("iprp", box("ipco", ispe(99, 66) ++ ispe(7, 5)))
    assert(Multimodal.imageDims(
      ftypFile("avif", box("meta", be32(0) ++ twoProps))) === Some((99, 66)))
    // 64-bit largesize header on the meta box
    val inner = be32(0) ++ prop
    val metaLarge = be32(1) ++ s("meta") ++
      (0 until 8).map(i => (((16L + inner.length) >> (8 * (7 - i))) & 0xff).toByte)
        .toArray ++ inner
    assert(Multimodal.imageDims(ftypFile("avif", metaLarge)) === Some((420, 310)))
    // torn: a box whose size overruns the payload ends the walk
    val torn = ftypFile("avif", be32(4096) ++ s("meta") ++ be32(0))
    assert(Multimodal.imageDims(torn) === None)
    // mp4 files without an ispe (no image item) read None
    assert(Multimodal.imageDims(ftypFile("isom", box("moov", Array.empty))) === None)
    assert(Multimodal.imageDims(ftypFile("avif")) === None)
  }

  test("tiffDims: real ImageIO TIFFs in the JVM walk AND the codegen " +
      "column; hand-built BE; truncation rejects") {
    import spark.implicits._
    def encTiff(w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => im.setRGB(x, y, 0x446688)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "tiff", bos),
        "JDK tiff writer missing")
      bos.toByteArray
    }
    val t1 = encTiff(37, 19)
    val t2 = encTiff(301, 5)
    assert(Multimodal.detectKind(t1) === "tiff")
    assert(Multimodal.imageDims(t1) === Some((37, 19)))
    assert(Multimodal.imageDims(t2) === Some((301, 5)))
    // hand-built big-endian: IFD at 8, two entries (256 SHORT, 257 LONG)
    val beTiff = b(0x4D, 0x4D, 0x00, 0x2A) ++ be32(8) ++
      b(0, 2) ++
      b(1, 0, 0, 3, 0, 0, 0, 1, 0, 123, 0, 0) ++ // tag 256 SHORT 123
      b(1, 1, 0, 4, 0, 0, 0, 1) ++ be32(45) ++   // tag 257 LONG 45
      be32(0)
    assert(Multimodal.imageDims(beTiff) === Some((123, 45)))
    // truncation: torn IFD / short header reject, never throw
    assert(Multimodal.imageDims(t1.take(9)) === None)
    assert(Multimodal.imageDims(beTiff.take(20)) === None)
    // ICO: ICONDIR entry bytes, 0 means 256; zero-count rejects
    val ico = b(0, 0, 1, 0, 2, 0, 48, 32) ++ new Array[Byte](12)
    val ico256 = b(0, 0, 1, 0, 1, 0, 0, 0) ++ new Array[Byte](12)
    assert(Multimodal.imageDims(ico) === Some((48, 32)))
    assert(Multimodal.imageDims(ico256) === Some((256, 256)))
    assert(Multimodal.imageDims(b(0, 0, 1, 0, 0, 0, 9, 9)) === None)
    // the codegen column agrees with the JVM walk (incl. the BE file
    // and both ICO edges)
    val rows = Seq(("t1", t1), ("t2", t2), ("be", beTiff),
        ("torn", beTiff.take(20)), ("ico", ico), ("ico256", ico256))
      .toDF("name", "payload")
      .select(col("name"), Multimodal.imageDimsCol(col("payload")).as("d"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.getStruct(1)).map(st => (st.getLong(0), st.getLong(1)))).toMap
    assert(rows("t1") === Some((37L, 19L)))
    assert(rows("t2") === Some((301L, 5L)))
    assert(rows("be") === Some((123L, 45L)))
    assert(rows("torn") === None)
    assert(rows("ico") === Some((48L, 32L)))
    assert(rows("ico256") === Some((256L, 256L)))
  }

  /** One MPEG1 Layer III frame header + zero body: 44100 Hz, 128 kbps,
    * stereo → frame length 144·128000/44100 + pad = 417 (+1) bytes.
    */
  private def mp3Frame(pad: Int, mono: Boolean = false): Array[Byte] = {
    val h2 = 0xFB // MPEG1, Layer III, no CRC
    val h3 = (9 << 4) | (0 << 2) | (pad << 1) // bitrate idx 9=128k, 44100
    val h4 = if (mono) 0xC0 else 0x00
    val len = 144 * 128000 / 44100 + pad
    b(0xFF, h2, h3, h4) ++ new Array[Byte](len - 4)
  }

  test("audioDims: mp3 frame-header walk — exact duration over CBR " +
      "frames, ID3v2 skip, truncated tail keeps the parsed prefix") {
    val three = mp3Frame(0) ++ mp3Frame(1) ++ mp3Frame(0)
    val got = Multimodal.audioDims(three).get
    assert(got.sample_rate === 44100L)
    assert(got.channels === 2L)
    assert(got.n_samples === 3 * 1152L)
    assert(got.duration_micros === 3 * 1152L * 1000000L / 44100L)
    // mono mode bits
    assert(Multimodal.audioDims(mp3Frame(0, mono = true)).get.channels === 1L)
    // ID3v2 tag (syncsafe size 130 = 0x01 0x02) skips to the frames
    val id3 = s("ID3") ++ b(4, 0, 0, 0, 0, 1, 2) ++ new Array[Byte](130) ++
      mp3Frame(0) ++ mp3Frame(0)
    assert(Multimodal.audioDims(id3).get.n_samples === 2 * 1152L)
    // truncated tail: the torn last frame drops, the prefix counts
    val torn = three.dropRight(10)
    assert(Multimodal.audioDims(torn).get.n_samples === 2 * 1152L)
    // desync after one frame stops the walk
    val desync = mp3Frame(0) ++ b(0x00, 0x11, 0x22, 0x33)
    assert(Multimodal.audioDims(desync).get.n_samples === 1152L)
    // an ID3 tag over garbage (no frame follows) is None, not a lie
    assert(Multimodal.audioDims(
      s("ID3") ++ b(4, 0, 0, 0, 0, 0, 1) ++ b(0x42)).isEmpty)
    // MPEG2 (22050 Hz): 576 samples/frame, the /2 rate table
    val m2h3 = (4 << 4) | (0 << 2) // bitrate idx 4 = 32k, sr idx 0
    val m2len = 72 * 32000 / 22050
    val m2 = b(0xFF, 0xF3, m2h3, 0) ++ new Array[Byte](m2len - 4)
    val g2 = Multimodal.audioDims(m2).get
    assert(g2.sample_rate === 22050L)
    assert(g2.n_samples === 576L)
  }

  /** Hand-assembled FLAC: fLaC + STREAMINFO(34) with the bit-packed
    * rate/channels/bps/samples field, zero md5.
    */
  private def flacBytes(rate: Long, ch: Long, ns: Long): Array[Byte] = {
    val packed = (rate << 44) | ((ch - 1) << 41) | (15L << 36) | ns
    s("fLaC") ++ b(0, 0, 0, 34) ++
      b(0x10, 0x00, 0x10, 0x00) ++ new Array[Byte](6) ++
      (0 until 8).map(i => ((packed >> (8 * (7 - i))) & 0xff).toByte).toArray ++
      new Array[Byte](16)
  }

  test("audioDims: flac STREAMINFO and wav headers; audioDimsCol agrees " +
      "with the JVM walk and stays null for mp3/text") {
    import spark.implicits._
    val fl = flacBytes(44100L, 2L, 123456L)
    val got = Multimodal.audioDims(fl).get
    assert(got === Multimodal.AudioMeta(44100L, 2L, 123456L,
      123456L * 1000000L / 44100L))
    // 36-bit sample count exercises the >32-bit path
    val big = Multimodal.audioDims(flacBytes(8000L, 1L, (1L << 35) + 7L)).get
    assert(big.n_samples === (1L << 35) + 7L)
    // canonical WAV (PCM 16-bit mono 8 kHz, 4 frames)
    val bos = new java.io.ByteArrayOutputStream()
    def le32w(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def le16w(v: Int): Unit = (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write(s("RIFF")); le32w(4 + 24 + 16); bos.write(s("WAVE"))
    bos.write(s("fmt ")); le32w(16)
    le16w(1); le16w(1); le32w(8000); le32w(16000); le16w(2); le16w(16)
    bos.write(s("data")); le32w(8)
    Seq(1000, -1000, 2000, -2000).foreach(le16w)
    val wav = bos.toByteArray
    assert(Multimodal.audioDims(wav) ===
      Some(Multimodal.AudioMeta(8000L, 1L, 4L, 4L * 1000000L / 8000L)))
    // truncated flac rejects
    assert(Multimodal.audioDims(fl.take(30)).isEmpty)
    val rows = Seq(("flac", fl), ("wav", wav), ("mp3", mp3Frame(0)),
        ("txt", s("hello there")), ("tornflac", fl.take(30)))
      .toDF("name", "payload")
      .select(col("name"), Multimodal.audioDimsCol(col("payload")).as("d"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getStruct(1)).map(st =>
        (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3)))).toMap
    assert(rows("flac") === Some((44100L, 2L, 123456L,
      123456L * 1000000L / 44100L)))
    assert(rows("wav") === Some((8000L, 1L, 4L, 500L)))
    assert(rows("mp3") === None) // frame walk is JVM-side by design
    assert(rows("txt") === None)
    assert(rows("tornflac") === None)
  }

  /** One Ogg page: zero CRC, 255-chunked lacing. */
  private def oggPage(granule: Long, packet: Array[Byte],
      headerType: Int): Array[Byte] = {
    def le(v: Long, len: Int): Array[Byte] =
      (0 until len).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val segs = (Seq.fill(packet.length / 255)(255) :+ packet.length % 255)
      .map(_.toByte).toArray
    s("OggS") ++ b(0, headerType) ++ le(granule, 8) ++ le(1L, 4) ++
      le(0L, 4) ++ le(0L, 4) ++ Array(segs.length.toByte) ++ segs ++ packet
  }

  private def opusHead(ch: Int, preSkip: Int): Array[Byte] =
    s("OpusHead") ++ b(1, ch, preSkip & 0xff, (preSkip >> 8) & 0xff) ++
      b(0x80, 0xBB, 0, 0) ++ b(0, 0, 0) // 48000 LE input rate, gain, map

  private def vorbisHead(rate: Long, ch: Int): Array[Byte] =
    b(1) ++ s("vorbis") ++ b(0, 0, 0, 0, ch) ++
      (0 until 4).map(i => ((rate >> (8 * i)) & 0xff).toByte).toArray ++
      new Array[Byte](12) ++ b(0x66, 1)

  /** Minimal m4a: ftyp M4A + moov(trak(mdia(hdlr soun + mdhd +
    * minf/stbl/stsd with an mp4a sample entry))).
    */
  private def m4aFile(rate: Long, nSamples: Long, ch: Int,
      v1: Boolean = false, withStsd: Boolean = true): Array[Byte] = {
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ s("soun") ++
      new Array[Byte](12))
    val mdhd =
      if (v1) box("mdhd", b(1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(rate) ++ be32(nSamples >> 32) ++ be32(nSamples & 0xffffffffL) ++
        be32(0))
      else box("mdhd", be32(0) ++ new Array[Byte](8) ++ be32(rate) ++
        be32(nSamples) ++ be32(0))
    val entry = be32(36L) ++ s("mp4a") ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ b(0, ch) ++ b(0, 16) ++ new Array[Byte](8)
    val stsd =
      if (withStsd) box("stsd", be32(0) ++ be32(1) ++ entry)
      else Array.emptyByteArray
    val mdia = box("mdia", hdlr ++ mdhd ++
      box("minf", box("stbl", stsd)))
    be32(16) ++ s("ftyp") ++ s("M4A ") ++ be32(0) ++
      box("moov", box("trak", mdia))
  }

  test("audioDims: m4a moov walk — mdhd timescale/duration, soun " +
      "handler required, stsd channels, v1 form, sentinel -> None") {
    val m4a = m4aFile(44100L, 441000L, 2)
    assert(Multimodal.detectKind(m4a) === "m4a")
    assert(Multimodal.audioDims(m4a) ===
      Some(Multimodal.AudioMeta(44100L, 2L, 441000L, 10000000L)))
    // v1 mdhd (64-bit duration)
    assert(Multimodal.audioDims(m4aFile(48000L, 1L << 33, 1, v1 = true)) ===
      Some(Multimodal.AudioMeta(48000L, 1L, 1L << 33,
        (1L << 33) * 1000000L / 48000L)))
    // absent stsd: the mono-safe floor
    assert(Multimodal.audioDims(
      m4aFile(8000L, 800L, 2, withStsd = false)).get.channels === 1L)
    // duration 0 (fragmented) and the all-ones sentinel read None
    assert(Multimodal.audioDims(m4aFile(44100L, 0L, 2)).isEmpty)
    assert(Multimodal.audioDims(m4aFile(44100L, 0xffffffffL, 2)).isEmpty)
    // a video-handler trak must not bind (soun required)
    val vid = m4aFile(44100L, 441000L, 2)
    val patched = vid.clone()
    val at = new String(patched, "ISO-8859-1").indexOf("soun")
    System.arraycopy("vide".getBytes("ISO-8859-1"), 0, patched, at, 4)
    assert(Multimodal.audioDims(patched).isEmpty)
  }

  /** One ADTS frame: MPEG-4 or MPEG-2 ID, optional CRC header form,
    * `pad` payload bytes, buffer-fullness bits all ones.
    */
  private def aacFrame(sfi: Int, cfg: Int, rdb: Int, pad: Int,
      id2: Boolean = false, crc: Boolean = false): Array[Byte] = {
    val flen = 7 + (if (crc) 2 else 0) + pad
    val b1 = 0xF0 | (if (id2) 8 else 0) | (if (crc) 0 else 1)
    Array[Byte](0xFF.toByte, b1.toByte,
      ((1 << 6) | (sfi << 2) | (cfg >> 2)).toByte,
      (((cfg & 3) << 6) | (flen >> 11)).toByte,
      ((flen >> 3) & 0xff).toByte,
      (((flen & 7) << 5) | 0x1f).toByte,
      (0xfc | rdb).toByte) ++ new Array[Byte]((if (crc) 2 else 0) + pad)
  }

  test("detectKind: ADTS sync (layer 00) routes aac, Layer III sync " +
      "stays mp3 — both classifiers") {
    val cases = Seq(
      Array(0xFF, 0xF1, 0x50).map(_.toByte) -> "aac", // MPEG-4, no CRC
      Array(0xFF, 0xF9, 0x50).map(_.toByte) -> "aac", // MPEG-2, no CRC
      Array(0xFF, 0xF0, 0x50).map(_.toByte) -> "aac", // MPEG-4, CRC
      Array(0xFF, 0xF8, 0x50).map(_.toByte) -> "aac", // MPEG-2, CRC
      Array(0xFF, 0xFB, 0x90).map(_.toByte) -> "mp3", // Layer III
      Array(0xFF, 0xE2, 0x00).map(_.toByte) -> "mp3", // MPEG-2.5 L-III
      Array(0xFF, 0xD8, 0xFF).map(_.toByte) -> "jpeg") // prefix wins
    cases.foreach { case (bytes, want) =>
      assert(Multimodal.detectKind(bytes) === want, bytes.toSeq)
      val got = spark.range(1)
        .select(Multimodal.detectKindCol(lit(bytes)).as("k"))
        .select(col("k")).head.getString(0)
      assert(got === want, s"col: ${bytes.toSeq}")
    }
  }

  test("audioDims: ADTS frame hop — table rate, rdb samples, config " +
      "7 -> 8ch, config 0 floor, CRC/MPEG-2 forms, degrade laws") {
    // one LC frame at 44100, stereo: 1024 samples
    assert(Multimodal.audioDims(aacFrame(4, 2, 0, 5)) ===
      Some(Multimodal.AudioMeta(44100L, 2L, 1024L,
        1024L * 1000000L / 44100L)))
    // three frames, rdb=2 (3 raw data blocks each) at 48 kHz
    val three = (1 to 3).map(i => aacFrame(3, 1, 2, i)).reduce(_ ++ _)
    assert(Multimodal.audioDims(three) ===
      Some(Multimodal.AudioMeta(48000L, 1L, 9216L, 192000L)))
    // channel-config table edges: 7 means 8 channels, 0 means "in a
    // PCE" and degrades to the mono-safe floor
    assert(Multimodal.audioDims(aacFrame(11, 7, 0, 0)).get.channels === 8L)
    assert(Multimodal.audioDims(aacFrame(11, 0, 0, 0)).get.channels === 1L)
    // CRC header form and the MPEG-2 ID hop identically (flen covers
    // the 2 CRC bytes)
    assert(Multimodal.audioDims(aacFrame(8, 2, 0, 4, crc = true)) ===
      Some(Multimodal.AudioMeta(16000L, 2L, 1024L, 64000L)))
    assert(Multimodal.audioDims(aacFrame(8, 2, 0, 4, id2 = true)) ===
      Some(Multimodal.AudioMeta(16000L, 2L, 1024L, 64000L)))
    // torn tail: the second frame's length runs past EOF -> the parsed
    // prefix; a desynced byte after the first frame ends the walk too
    val torn = aacFrame(4, 2, 0, 0) ++ aacFrame(4, 2, 0, 200).take(30)
    assert(Multimodal.audioDims(torn).get.n_samples === 1024L)
    val desync = aacFrame(4, 2, 0, 0) ++ Array[Byte](0x00, 0x11)
    assert(Multimodal.audioDims(desync).get.n_samples === 1024L)
    // reserved frequency index on the FIRST frame: nothing parsed
    assert(Multimodal.audioDims(aacFrame(13, 2, 0, 0)).isEmpty)
    // a bare sync pair shorter than one header: no frame
    assert(Multimodal.audioDims(Array(0xFF, 0xF1).map(_.toByte)).isEmpty)
  }

  /** FORM/AIFF with raw COMM fields (extended-float bytes passed in). */
  private def aiffFile(ch: Int, frames: Long, ext: Array[Byte],
      pre: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val comm = b(0, ch) ++ be32(frames) ++ b(0, 16) ++ ext
    s("FORM") ++ be32(4L + pre.length + 8 + comm.length) ++ s("AIFF") ++
      pre ++ s("COMM") ++ be32(comm.length.toLong) ++ comm
  }

  test("detectKind: FORM routes aiff/iff by form type — both " +
      "classifiers") {
    val aiff = s("FORM") ++ be32(4L) ++ s("AIFF")
    val aifc = s("FORM") ++ be32(4L) ++ s("AIFC")
    val bare = s("FORM") ++ be32(4L) ++ s("8SVX")
    assert(Multimodal.detectKind(aiff) === "aiff")
    assert(Multimodal.detectKind(aifc) === "aiff")
    assert(Multimodal.detectKind(bare) === "iff")
    Seq(aiff -> "aiff", aifc -> "aiff", bare -> "iff").foreach {
      case (bytes, want) =>
        val got = spark.range(1)
          .select(Multimodal.detectKindCol(lit(bytes)).as("k"))
          .head.getString(0)
        assert(got === want, bytes.toSeq)
    }
  }

  test("audioDims: AIFF COMM walk — the hand-pinned 44100 extended " +
      "float, unknown-chunk skip with odd padding, degrade laws") {
    // 44100 = 0x400E AC44... (exp 16398, mantissa 0xAC44 << 48)
    val ext44100 = Array(0x40, 0x0E, 0xAC, 0x44, 0, 0, 0, 0, 0, 0)
      .map(_.toByte)
    assert(Multimodal.audioDims(aiffFile(2, 441000L, ext44100)) ===
      Some(Multimodal.AudioMeta(44100L, 2L, 441000L, 10000000L)))
    // an unknown odd-sized chunk before COMM must skip with padding
    val pre = s("NAME") ++ be32(3L) ++ "abc ".getBytes("ISO-8859-1")
    assert(Multimodal.audioDims(aiffFile(1, 8000L, ext44100, pre))
      .get.sample_rate === 44100L)
    // zero rate, truncated COMM, and an extended overflow read None
    val extZero = new Array[Byte](10)
    assert(Multimodal.audioDims(aiffFile(1, 1L, extZero)).isEmpty)
    val truncated = aiffFile(2, 441000L, ext44100).dropRight(6)
    assert(Multimodal.audioDims(truncated).isEmpty)
    val extHuge = Array(0x7F, 0xFE, 0x80, 0, 0, 0, 0, 0, 0, 0)
      .map(_.toByte)
    assert(Multimodal.audioDims(aiffFile(1, 1L, extHuge)).isEmpty)
  }

  test("audioDims: an ID3v2-tagged ADTS stream routes to the aac hop " +
      "after the tag skip (the prefix rule says mp3, the bytes say aac)") {
    val id3 = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0, 0, 0, 0, 0) // v2.4, no flags, size 0
    val tagged = id3 ++ aacFrame(4, 2, 0, 3)
    assert(Multimodal.detectKind(tagged) === "mp3") // the stated prefix rule
    assert(Multimodal.audioDims(tagged) ===
      Some(Multimodal.AudioMeta(44100L, 2L, 1024L,
        1024L * 1000000L / 44100L)))
  }

  /** A playable AIFF: COMM (16-bit, normalized extended rate) + SSND
    * with the given BE samples after `skip` offset bytes.
    */
  private def aiffPcmFile(rate: Long, ch: Int, samples: Seq[Int],
      skip: Int = 0, bits: Int = 16): Array[Byte] = {
    val nlz = java.lang.Long.numberOfLeadingZeros(rate)
    val ext = b(((16383 + 63 - nlz) >> 8) & 0xff, (16383 + 63 - nlz) & 0xff) ++
      (0 until 8).map(i => (((rate << nlz) >>> (8 * (7 - i))) & 0xff).toByte)
        .toArray
    val comm = b(0, ch) ++ be32((samples.length / ch).toLong) ++
      b(0, bits) ++ ext
    val pcm: Array[Byte] =
      if (bits == 8) samples.map(_.toByte).toArray
      else samples.flatMap(v => Seq(((v >> 8) & 0xff).toByte,
        (v & 0xff).toByte)).toArray
    val ssnd = be32(skip.toLong) ++ be32(0L) ++
      new Array[Byte](skip) ++ pcm
    s("FORM") ++ be32(4L + 8 + comm.length + 8 + ssnd.length) ++ s("AIFF") ++
      s("COMM") ++ be32(comm.length.toLong) ++ comm ++
      s("SSND") ++ be32(ssnd.length.toLong) ++ ssnd
  }

  /** Canonical 16-bit mono PCM WAV — the LE twin of [[aiffPcmFile]]. */
  private def wavFile(samples: Seq[Int], rate: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def le16(v: Int): Unit =
      (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write(s("RIFF")); le32(36 + 2 * samples.length)
    bos.write(s("WAVE")); bos.write(s("fmt ")); le32(16)
    le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    bos.write(s("data")); le32(2 * samples.length)
    samples.foreach(le16)
    bos.toByteArray
  }

  test("AIFF PCM decode: WAV≡AIFF envelope parity, SSND offset skip, " +
      "signed 8-bit samples, coverage flip") {
    val samples = Seq(1000, -1000, 2000, -2000, 300, -300, 80, -80)
    val aiff = aiffPcmFile(8000L, 1, samples)
    val wav = wavFile(samples, 8000) // the LE twin
    val am = Multimodal.aiffMonoSamples(aiff).get
    val wm = Multimodal.wavMonoSamples(wav).get
    assert(am.toSeq === wm.toSeq,
      "the same recording must read identically from both containers")
    assert(Multimodal.audioEnvelopeHash(aiff) ===
      Multimodal.audioEnvelopeHash(wav))
    // SSND offset field skips leading pad bytes
    val padded = aiffPcmFile(8000L, 1, samples, skip = 6)
    assert(Multimodal.aiffMonoSamples(padded).get.toSeq === am.toSeq)
    // 8-bit AIFF is SIGNED (WAV's is unsigned): -64 reads -0.5
    val eight = aiffPcmFile(8000L, 1, Seq(-64, 64), bits = 8)
    assert(Multimodal.aiffMonoSamples(eight).get.toSeq ===
      Seq(-0.5f, 0.5f))
    // the real decoder flips `decoded` for aiff in routedFeatures
    assert(Multimodal.decodeAiffFeatures(aiff).isDefined)
  }

  private def tsPacket(pcr: Option[Long]): Array[Byte] = {
    val p = new Array[Byte](188)
    p(0) = 0x47; p(2) = 0x21
    pcr match {
      case Some(v) =>
        p(3) = 0x30; p(4) = 7; p(5) = 0x10
        val base = v / 300L; val ext = v % 300L
        p(6) = (base >> 25).toByte; p(7) = (base >> 17).toByte
        p(8) = (base >> 9).toByte; p(9) = (base >> 1).toByte
        p(10) = (((base & 1L) << 7) | 0x7eL | (ext >> 8)).toByte
        p(11) = (ext & 0xffL).toByte
      case None => p(3) = 0x10
    }
    p
  }

  test("24-bit PCM (r15): an extensible-format WAV and a 24-bit AIFF " +
      "of the same samples read identically — the studio-export class") {
    // one full-scale-ish and one small sample, mono
    val samples = Seq(0x400000 - 1, -0x400000, 2048, -2048)
    def wav24(ext: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit =
        (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      def le16(v: Int): Unit =
        (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      val fmtSz = if (ext) 40 else 16
      bos.write(s("RIFF")); le32(4 + 8 + fmtSz + 8 + 3 * samples.length)
      bos.write(s("WAVE")); bos.write(s("fmt ")); le32(fmtSz)
      le16(if (ext) 0xFFFE else 1); le16(1); le32(8000); le32(24000)
      le16(3); le16(24)
      if (ext) {
        le16(22); le16(24); le32(4) // cbSize, validBits, channelMask
        le16(1) // SubFormat leading code: PCM
        bos.write(new Array[Byte](14)) // rest of the GUID
      }
      bos.write(s("data")); le32(3 * samples.length)
      samples.foreach(v => (0 until 3).foreach(i =>
        bos.write((v >> (8 * i)) & 0xff)))
      bos.toByteArray
    }
    def aiff24: Array[Byte] = {
      val nlz = java.lang.Long.numberOfLeadingZeros(8000L)
      val ext = b(((16383 + 63 - nlz) >> 8) & 0xff,
        (16383 + 63 - nlz) & 0xff) ++
        (0 until 8).map(i =>
          (((8000L << nlz) >>> (8 * (7 - i))) & 0xff).toByte).toArray
      val comm = b(0, 1) ++ be32(samples.length.toLong) ++ b(0, 24) ++ ext
      val pcm = samples.flatMap(v => Seq(((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
      val ssnd = be32(0L) ++ be32(0L) ++ pcm
      s("FORM") ++ be32(4L + 8 + comm.length + 8 + ssnd.length) ++
        s("AIFF") ++ s("COMM") ++ be32(comm.length.toLong) ++ comm ++
        s("SSND") ++ be32(ssnd.length.toLong) ++ ssnd
    }
    val wm = Multimodal.wavMonoSamples(wav24(ext = false)).get
    val wmx = Multimodal.wavMonoSamples(wav24(ext = true)).get
    val am = Multimodal.aiffMonoSamples(aiff24).get
    assert(wm.toSeq === wmx.toSeq, "plain vs extensible fmt")
    assert(wm.toSeq === am.toSeq, "WAV vs AIFF 24-bit parity")
    assert(math.abs(wm(0) - (0x3fffff / 8388608.0f)) < 1e-7)
    assert(Multimodal.audioEnvelopeHash(wav24(ext = true)) ===
      Multimodal.audioEnvelopeHash(aiff24))
    // a non-PCM extensible SubFormat (IEEE float = 3) still rejects
    val f = wav24(ext = true)
    f(44) = 3 // SubFormat leading code byte: fmt data starts at 20
    assert(Multimodal.wavMonoSamples(f).isEmpty)
  }

  test("mp4seg: styp/sidx/moof-led segments detect in both " +
      "classifiers; sidx reference sums divide exactly; moof-only " +
      "and torn lists degrade") {
    def seg(first: String): Array[Byte] =
      be32(16L) ++ s(first) ++ s("msdh") ++ be32(0L)
    Seq("styp", "sidx", "moof").foreach { b =>
      assert(Multimodal.detectKind(seg(b)) === "mp4seg", b)
      val got = spark.range(1)
        .select(Multimodal.detectKindCol(lit(seg(b))).as("k"))
        .head.getString(0)
      assert(got === "mp4seg", s"col: $b")
    }
    // styp + sidx(v0, timescale 1000, refs 3s + 2s) -> 5 s exactly
    def sidx(ts: Long, durs: Seq[Long]): Array[Byte] = {
      val refs = durs.flatMap(u => be32(0L) ++ be32(u) ++ be32(0L)).toArray
      val body = be32(0L) ++ be32(1L) ++ be32(ts) ++ be32(0L) ++ be32(0L) ++
        b(0, 0) ++ b((durs.length >> 8) & 0xff, durs.length & 0xff) ++ refs
      be32((8L + body.length)) ++ s("sidx") ++ body
    }
    val segment = be32(16L) ++ s("styp") ++ s("msdh") ++ be32(0L)
    assert(Multimodal.mp4SegDuration(
      segment ++ sidx(1000L, Seq(3000L, 2000L))) === Some(5000000L))
    // an odd timescale keeps integer-exactness (floor division)
    assert(Multimodal.mp4SegDuration(
      segment ++ sidx(3L, Seq(1L))) === Some(333333L))
    // moof-only (no sidx) and zero timescale read None
    assert(Multimodal.mp4SegDuration(
      be32(16L) ++ s("moof") ++ s("mfhd") ++ be32(0L)).isEmpty)
    assert(Multimodal.mp4SegDuration(
      segment ++ sidx(0L, Seq(100L))).isEmpty)
    // a torn reference list reads None, never garbage
    val torn = (segment ++ sidx(1000L, Seq(3000L, 2000L))).dropRight(10)
    assert(Multimodal.mp4SegDuration(torn).isEmpty)
  }

  test("exifOrientation: both byte orders behind a padding entry, " +
      "APP1-less and torn files read None, out-of-range rejects") {
    def jpeg(le: Boolean, o: Int): Array[Byte] = {
      def w16(v: Int): Array[Byte] =
        if (le) Array((v & 0xff).toByte, (v >> 8).toByte)
        else Array((v >> 8).toByte, (v & 0xff).toByte)
      def w32(v: Long): Array[Byte] =
        if (le) w16((v & 0xffff).toInt) ++ w16((v >> 16).toInt)
        else w16((v >> 16).toInt) ++ w16((v & 0xffff).toInt)
      val e1 = w16(0x010f) ++ w16(2) ++ w32(4L) ++ s("puma")
      val e2 = w16(0x0112) ++ w16(3) ++ w32(1L) ++ w16(o) ++ w16(0)
      val tiff = (if (le) s("II") else s("MM")) ++ w16(42) ++ w32(8L) ++
        w16(2) ++ e1 ++ e2 ++ w32(0L)
      val body = s("Exif") ++ Array[Byte](0, 0) ++ tiff
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte) ++
        Array((((body.length + 2) >> 8) & 0xff).toByte,
          ((body.length + 2) & 0xff).toByte) ++ body ++
        Array(0xFF.toByte, 0xD9.toByte)
    }
    assert(Multimodal.exifOrientation(jpeg(le = true, 6)) === Some(6))
    assert(Multimodal.exifOrientation(jpeg(le = false, 8)) === Some(8))
    assert(Multimodal.exifOrientation(jpeg(le = true, 9)).isEmpty)
    assert(Multimodal.exifOrientation(
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)).isEmpty)
    assert(Multimodal.exifOrientation(
      jpeg(le = true, 3).dropRight(20)).isEmpty)
    assert(Multimodal.exifOrientation("not a jpeg".getBytes).isEmpty)
  }

  test("mpegts: the 188-grid structural rule in both classifiers; " +
      "GIF prefix and short 'G' text never misroute") {
    val ts = tsPacket(None) ++ tsPacket(None) ++ tsPacket(None)
    assert(Multimodal.detectKind(ts) === "mpegts")
    val got = spark.range(1)
      .select(Multimodal.detectKindCol(lit(ts)).as("k")).head.getString(0)
    assert(got === "mpegts")
    assert(Multimodal.detectKind("G is a letter".getBytes("ISO-8859-1"))
      === "unknown")
    assert(Multimodal.detectKind(
      "GIF89a".getBytes("ISO-8859-1") ++ new Array[Byte](400)) === "gif")
  }

  test("tsMeta: PCR-delta duration on the 27 MHz grid, PCR-less " +
      "segments keep the packet count, desync ends the walk") {
    // 27000 ticks at 27 MHz = exactly 1000 micros
    val withPcr = tsPacket(Some(900000L)) ++ tsPacket(None) ++
      tsPacket(Some(900000L + 27000L))
    assert(Multimodal.tsMeta(withPcr) ===
      Some(Multimodal.TsMeta(3L, Some(1000L))))
    // a PCR with a non-zero 9-bit extension keeps exactness
    val ext = tsPacket(Some(1000L * 300L + 123L)) ++ tsPacket(None) ++
      tsPacket(Some(1000L * 300L + 123L + 54321L))
    assert(Multimodal.tsMeta(ext).get.duration_micros ===
      Some(54321L / 27L))
    // no PCR anywhere: count parses, duration honestly absent
    val bare = tsPacket(None) ++ tsPacket(None) ++ tsPacket(None)
    assert(Multimodal.tsMeta(bare) === Some(Multimodal.TsMeta(3L, None)))
    // a desynced fourth packet ends the walk with the parsed prefix
    val torn = bare ++ Array.fill(188)(0x55.toByte)
    assert(Multimodal.tsMeta(torn).get.n_packets === 3L)
    // not a transport stream at all
    assert(Multimodal.tsMeta("plain text".getBytes("ISO-8859-1")).isEmpty)
  }

  test("audioDims: ogg walk — OpusHead 48kHz grid minus pre-skip, " +
      "Vorbis rate, -1 sentinel pages skip back, torn tail degrades") {
    val opus = oggPage(0L, opusHead(2, 312), 2) ++
      oggPage(312L + 96000L, b(0x42), 4)
    assert(Multimodal.detectKind(opus) === "ogg")
    assert(Multimodal.audioDims(opus) ===
      Some(Multimodal.AudioMeta(48000L, 2L, 96000L, 2000000L)))
    // a trailing page with the -1 no-packet-ends sentinel must skip
    // back to the last REAL granule
    val sentinel = opus ++ oggPage(-1L, b(0x00), 0)
    assert(Multimodal.audioDims(sentinel).get.n_samples === 96000L)
    // torn tail: the cut page header disappears; the intact prefix
    // page's granule stands (here: the BOS page -> 0 samples)
    val torn = opus.take(opus.length - 10)
    assert(Multimodal.audioDims(torn).get.n_samples === 0L)
    // vorbis: granule counts at the declared rate
    val vorb = oggPage(0L, vorbisHead(22050L, 1), 2) ++
      oggPage(44100L, b(0x17), 4)
    assert(Multimodal.audioDims(vorb) ===
      Some(Multimodal.AudioMeta(22050L, 1L, 44100L, 2000000L)))
    // header-only fragment: nothing decodable is an honest zero
    assert(Multimodal.audioDims(
      oggPage(0L, opusHead(1, 0), 2)).get.n_samples === 0L)
    // an Ogg page whose first packet is neither codec reads None
    assert(Multimodal.audioDims(oggPage(0L, s("FLAC junk"), 2)).isEmpty)
  }

  /** Canonical AVI header prefix: RIFF/AVI + LIST hdrl with avih first. */
  private def aviHeader(us: Long, frames: Long, w: Long, h: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    bos.write(s("RIFF")); le32(4 + 8 + 4 + 8 + 56)
    bos.write(s("AVI ")); bos.write(s("LIST")); le32(4 + 8 + 56)
    bos.write(s("hdrl")); bos.write(s("avih")); le32(56)
    le32(us); le32(0); le32(0); le32(0); le32(frames); le32(0); le32(0)
    le32(0); le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    bos.toByteArray
  }

  /** Minimal mp4: ftyp + moov(mvhd + audio tkhd 0x0 + video tkhd),
    * optionally with a sample table (`stbl` content) under the VIDEO
    * trak's mdia/minf.
    */
  private def mp4File(timescale: Long, duration: Long, w: Long, h: Long,
      v1: Boolean = false, stbl: Array[Byte] = Array.empty): Array[Byte] = {
    def fix1616(v: Long): Array[Byte] = be32(v << 16)
    val mvhd =
      if (v1) box("mvhd", b(1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(timescale) ++ be32(duration >> 32) ++
        be32(duration & 0xffffffffL) ++ new Array[Byte](80))
      else box("mvhd", be32(0) ++ new Array[Byte](8) ++ be32(timescale) ++
        be32(duration) ++ new Array[Byte](80))
    def tkhd(tw: Long, th: Long) = box("tkhd",
      be32(0) ++ new Array[Byte](72) ++ fix1616(tw) ++ fix1616(th))
    val mdia =
      if (stbl.isEmpty) Array.emptyByteArray
      else box("mdia", box("minf", box("stbl", stbl)))
    val moov = box("moov", mvhd ++ box("trak", tkhd(0, 0)) ++
      box("trak", tkhd(w, h) ++ mdia))
    ftypFile("isom", moov)
  }

  /** stsz with a declared sample_count (sample_size 0 = per-sample
    * table, entries omitted — the count field is all the walk reads).
    */
  private def stsz(count: Long): Array[Byte] =
    box("stsz", be32(0) ++ be32(0) ++ be32(count))

  /** stts run-length entries (count, delta). */
  private def stts(entries: (Long, Long)*): Array[Byte] =
    box("stts", be32(0) ++ be32(entries.length) ++
      entries.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)

  // ---- EBML builders (the WebpSpec hand-assembly discipline) ----

  /** An EBML element: raw id bytes (marker kept) + 1-byte size + body. */
  private def el(idBytes: Array[Byte], body: Array[Byte]): Array[Byte] = {
    require(body.length < 127)
    idBytes ++ b(0x80 | body.length) ++ body
  }

  private def beBytes(v: Long, len: Int): Array[Byte] =
    (0 until len).map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray

  /** A WebM file: EBML header (DocType webm) + Segment(Info + Tracks). */
  private def webmFile(timecodeScaleNs: Option[Long],
      durationUnits: Option[Double], w: Long, h: Long,
      f32: Boolean = false, unknownSegSize: Boolean = false): Array[Byte] = {
    val header = el(b(0x1A, 0x45, 0xDF, 0xA3),
      el(b(0x42, 0x82), s("webm")))
    val tcs = timecodeScaleNs.map(v =>
      el(b(0x2A, 0xD7, 0xB1), beBytes(v, 4))).getOrElse(Array.emptyByteArray)
    val dur = durationUnits.map { d =>
      if (f32) el(b(0x44, 0x89),
        beBytes(java.lang.Float.floatToIntBits(d.toFloat).toLong & 0xffffffffL, 4))
      else el(b(0x44, 0x89), beBytes(java.lang.Double.doubleToLongBits(d), 8))
    }.getOrElse(Array.emptyByteArray)
    val info = el(b(0x15, 0x49, 0xA9, 0x66), tcs ++ dur)
    val video = el(b(0xE0), el(b(0xB0), beBytes(w, 2)) ++
      el(b(0xBA), beBytes(h, 2)))
    val tracks = el(b(0x16, 0x54, 0xAE, 0x6B), el(b(0xAE), video))
    val segBody = info ++ tracks
    val seg =
      if (unknownSegSize) b(0x18, 0x53, 0x80, 0x67, 0xFF) ++ segBody
      else el(b(0x18, 0x53, 0x80, 0x67), segBody)
    header ++ seg
  }

  test("videoDims: WebM EBML walk — TimecodeScale x Duration, Video " +
      "track dims, unknown-size Segment, float32, defaults, torn") {
    val full = webmFile(Some(1000000L), Some(90000.0), 1920L, 1080L)
    assert(Multimodal.detectKind(full) === "webm")
    assert(Multimodal.videoDims(full) ===
      Some(Multimodal.VideoMeta(1920L, 1080L, None, Some(90000000L))))
    // unknown-size Segment (live-muxed stamping) parses identically
    assert(Multimodal.videoDims(webmFile(Some(1000000L), Some(90000.0),
      1920L, 1080L, unknownSegSize = true)) ===
      Some(Multimodal.VideoMeta(1920L, 1080L, None, Some(90000000L))))
    // float32 duration
    assert(Multimodal.videoDims(webmFile(Some(1000000L), Some(512.0),
      640L, 360L, f32 = true)) ===
      Some(Multimodal.VideoMeta(640L, 360L, None, Some(512000L))))
    // TimecodeScale omitted: the spec default (1 ms / unit) applies
    assert(Multimodal.videoDims(webmFile(None, Some(500.0), 320L, 240L)) ===
      Some(Multimodal.VideoMeta(320L, 240L, None, Some(500000L))))
    // Duration omitted: dims report with an ABSENT duration
    assert(Multimodal.videoDims(webmFile(Some(1000000L), None, 320L,
      240L)) === Some(Multimodal.VideoMeta(320L, 240L, None, None)))
    // torn: the cut breaks the Segment's declared size -> the walk
    // never reaches dims -> None (never a partial lie)
    assert(Multimodal.videoDims(full.take(full.length - 12)).isEmpty)
    assert(Multimodal.videoDims(full.take(20)).isEmpty)
    // an mkv DocType routes through the same walk
    val mkv = el(b(0x1A, 0x45, 0xDF, 0xA3),
      el(b(0x42, 0x82), s("matroska"))) ++ full.drop(
      el(b(0x1A, 0x45, 0xDF, 0xA3), el(b(0x42, 0x82), s("webm"))).length)
    assert(Multimodal.detectKind(mkv) === "mkv")
    assert(Multimodal.videoDims(mkv).map(_.width) === Some(1920L))
  }

  test("videoDims: mp4 sample-table frame counts — stsz count, stts " +
      "sum fallback, absent table stays absent") {
    val withStsz = mp4File(90000L, 450000L, 1280L, 720L,
      stbl = stsz(300L))
    assert(Multimodal.videoDims(withStsz) ===
      Some(Multimodal.VideoMeta(1280L, 720L, Some(300L), Some(5000000L))))
    val withStts = mp4File(90000L, 450000L, 1280L, 720L,
      stbl = stts((250L, 100L), (50L, 200L)))
    assert(Multimodal.videoDims(withStts) ===
      Some(Multimodal.VideoMeta(1280L, 720L, Some(300L), Some(5000000L))))
    // stsz wins when both are present (the direct count)
    val both = mp4File(90000L, 450000L, 1280L, 720L,
      stbl = stts((7L, 1L)) ++ stsz(42L))
    assert(Multimodal.videoDims(both).flatMap(_.n_frames) === Some(42L))
  }

  test("videoDims: avi header fields and the mp4 mvhd/tkhd walk; " +
      "videoDimsCol agrees on canonical AVI and stays null elsewhere") {
    import spark.implicits._
    val avi = aviHeader(33333L, 300L, 640L, 480L)
    assert(Multimodal.videoDims(avi) ===
      Some(Multimodal.VideoMeta(640L, 480L, Some(300L),
        Some(33333L * 300L))))
    // a REAL uncompressed AVI from the decodeAvi fixture family agrees
    // on dims (headers vs full decode)
    val mp4 = mp4File(timescale = 90000L, duration = 450000L, w = 1280L,
      h = 720L)
    assert(Multimodal.videoDims(mp4) ===
      Some(Multimodal.VideoMeta(1280L, 720L, None, Some(5000000L))))
    // v1 mvhd (64-bit duration) and the audio-trak-first skip rule
    val mp4v1 = mp4File(timescale = 1000L, duration = 7500L, w = 320L,
      h = 240L, v1 = true)
    assert(Multimodal.videoDims(mp4v1) ===
      Some(Multimodal.VideoMeta(320L, 240L, None, Some(7500000L))))
    // fragmented/DASH convention: mvhd duration 0 or the all-ones
    // sentinel = UNKNOWN — dims report, duration stays absent (never a
    // 0 that the size gate would drop as too_short)
    assert(Multimodal.videoDims(
      mp4File(timescale = 90000L, duration = 0L, w = 1280L, h = 720L)) ===
      Some(Multimodal.VideoMeta(1280L, 720L, None, None)))
    assert(Multimodal.videoDims(
      mp4File(timescale = 90000L, duration = 0xffffffffL, w = 64L,
        h = 48L)) === Some(Multimodal.VideoMeta(64L, 48L, None, None)))
    // AVI with a zero frame interval: the header omits the rate —
    // duration unknown, frame count still real
    assert(Multimodal.videoDims(aviHeader(0L, 300L, 640L, 480L)) ===
      Some(Multimodal.VideoMeta(640L, 480L, Some(300L), None)))
    // mov brand routes through the same walk
    val mov = b(0, 0, 0, 16) ++ s("ftyp") ++ s("qt  ") ++ be32(0) ++
      mp4.drop(16)
    assert(Multimodal.videoDims(mov).map(_.width) === Some(1280L))
    // sanity guards: garbage us/frames reject; torn moov rejects
    assert(Multimodal.videoDims(
      aviHeader(2000000000L, 300L, 64L, 48L)).isEmpty)
    assert(Multimodal.videoDims(mp4.take(40)).isEmpty)
    assert(Multimodal.videoDims(s("not a container")).isEmpty)
    val rows = Seq(("avi", avi), ("mp4", mp4), ("txt", s("hello world")))
      .toDF("name", "payload")
      .select(col("name"), Multimodal.videoDimsCol(col("payload")).as("v"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getStruct(1)).map(st =>
        (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3)))).toMap
    assert(rows("avi") === Some((640L, 480L, 300L, 33333L * 300L)))
    assert(rows("mp4") === None) // box walk is JVM-side by design
    assert(rows("txt") === None)
    // zero-frame-interval AVI in the COLUMN: null duration, real frames
    val zeroUs = Seq(Tuple1(aviHeader(0L, 300L, 640L, 480L)))
      .toDF("payload")
      .select(Multimodal.videoDimsCol(col("payload")).as("v"))
      .head().getStruct(0)
    assert(zeroUs.getLong(2) === 300L)
    assert(zeroUs.isNullAt(3), "us=0 must read an ABSENT duration")
  }

  test("imageDimsCol: a TIFF truncated mid-IFD reads null like the " +
      "bounds-checked JVM walk (partially-present entries never parse)") {
    import spark.implicits._
    // canonical LE layout, TWO declared entries, cut ONE byte into the
    // second entry's value field: tag/type/count are fully present, so
    // without the per-entry length bound the torn 257 entry's value
    // hex-parses its single byte (0xBC → 188) and conv() fabricates a
    // bogus non-null height where the JVM walk rejects the whole IFD
    def le16a(v: Int) = b(v & 0xff, (v >> 8) & 0xff)
    def le32a(v: Long) = b((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    val full = b(0x49, 0x49, 0x2A, 0x00) ++ le32a(8) ++ le16a(2) ++
      (le16a(256) ++ le16a(3) ++ le32a(1) ++ le16a(555) ++ le16a(0)) ++
      (le16a(257) ++ le16a(4) ++ le32a(1) ++ le32a(444)) ++ le32a(0)
    val torn = full.take(10 + 12 + 9)
    assert(Multimodal.imageDims(torn) === None, "JVM walk must reject")
    val rows = Seq(("full", full), ("torn", torn)).toDF("name", "payload")
      .select(col("name"), Multimodal.imageDimsCol(col("payload")).as("d"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.getStruct(1)).map(st => (st.getLong(0), st.getLong(1))))
      .toMap
    assert(rows("full") === Some((555L, 444L)))
    assert(rows("torn") === None,
      "col walk must match the JVM walk on truncated payloads")
  }

  test("ispeDims: crafted zero/oversized axes reject (the tiffDims " +
      "sanity bound)") {
    val zeroW = box("iprp", box("ipco",
      box("ispe", be32(0) ++ be32(0) ++ be32(310))))
    assert(Multimodal.imageDims(
      ftypFile("avif", box("meta", be32(0) ++ zeroW))) === None)
    val hugeH = box("iprp", box("ipco",
      box("ispe", be32(0) ++ be32(420) ++ be32(0x80000001L))))
    assert(Multimodal.imageDims(
      ftypFile("avif", box("meta", be32(0) ++ hugeH))) === None)
  }

  test("sizeGate: only a PARSED header can drop a row; pixel and " +
      "duration rules fire in the stated order; unknowns keep") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(100, 100)), // 10k pixels: in range
      (2L, png(2, 2)), // too few
      (3L, png(2000, 2000)), // too many (4M > 1M)
      (4L, flacBytes(8000L, 1L, 4000L)), // 0.5 s: too short
      (5L, flacBytes(8000L, 1L, 80000L)), // 10 s: ok
      (6L, aviHeader(33333L, 3000L, 64L, 64L)), // 100 s: too long
      (7L, aviHeader(33333L, 300L, 4L, 4L)), // 16 px: too few (before dur)
      (8L, s("just text")), // unknown: keep
      (9L, flacBytes(8000L, 1L, 80000L).take(30)), // torn: keep
      // r15: the native-expression gate covers the JVM-walk formats
      // the fixed-offset hex columns never could
      (10L, mp4File(90000L, 450000L, 1280L, 720L)), // 5 s, 0.9 Mpx: ok
      // fragmented mp4 (duration unknown): pixel rules still fire
      (11L, mp4File(90000L, 0L, 2000L, 2000L)), // 4 Mpx: too many
      (12L, webmFile(Some(1000000L), Some(90000.0), 100L, 100L)), // 90 s
      (13L, mp3Frame(0)), // one 26 ms frame: too short
      (14L, oggPage(0L, opusHead(2, 0), 2) ++
        oggPage(480000L, b(1), 4))) // 10 s of opus: ok
    val out = Multimodal.sizeGate(rows.toDF("media_id", "payload"),
        minPixels = 100L, maxPixels = 1000000L,
        minDurationMicros = 1000000L, maxDurationMicros = 30000000L)
      .select("media_id", "keep", "reason").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(1L) === ((true, "ok")))
    assert(out(2L) === ((false, "too_few_pixels")))
    assert(out(3L) === ((false, "too_many_pixels")))
    assert(out(4L) === ((false, "too_short")))
    assert(out(5L) === ((true, "ok")))
    assert(out(6L) === ((false, "too_long")))
    assert(out(7L) === ((false, "too_few_pixels")))
    assert(out(8L) === ((true, "no_header")))
    assert(out(9L) === ((true, "no_header")))
    assert(out(10L) === ((true, "ok")))
    assert(out(11L) === ((false, "too_many_pixels")),
      "a fragmented mp4's parsed dims must still gate")
    assert(out(12L) === ((false, "too_long")), "WebM duration gates")
    assert(out(13L) === ((false, "too_short")), "mp3 duration gates")
    assert(out(14L) === ((true, "ok")), "ogg/opus duration gates")
  }

  test("routedFeatures + decodeCoverage report the new ISO-BMFF kinds " +
      "under their own names (observably stubbed, never unknown)") {
    import spark.implicits._
    val media = Seq(
      (1L, ftypFile("avif")), (2L, ftypFile("isom")), (3L, ftypFile("heic")),
      (4L, flacBytes(8000L, 1L, 80L)), (5L, mp3Frame(0)))
      .toDF("media_id", "payload")
    val out = Multimodal.routedFeatures(media).collect()
      .map(r => r.media_id -> ((r.kind, r.decoded))).toMap
    assert(out(1L) === (("avif", false)))
    assert(out(2L) === (("mp4", false)))
    assert(out(3L) === (("heic", false)))
    assert(out(4L) === (("flac", false)))
    assert(out(5L) === (("mp3", false)))
    val cov = Multimodal.decodeCoverage(media).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("stub_ppm")).toMap
    assert(cov === Map("avif" -> 1000000L, "mp4" -> 1000000L,
      "heic" -> 1000000L, "flac" -> 1000000L, "mp3" -> 1000000L))
  }
}
