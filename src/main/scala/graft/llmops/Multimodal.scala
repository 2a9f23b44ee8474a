package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside (SURVEY §2.11). All three modalities
  * decode FOR REAL with dependency-free code only: images via
  * javax.imageio ([[decodeImage]] — PNG/BMP/GIF/JPEG) plus the
  * hand-rolled [[Webp]] VP8L decoder (lossless WebP), audio via the
  * RIFF/WAVE PCM parse ([[decodeWav]]), video via the uncompressed-
  * AVI/MJPEG RIFF walk ([[decodeAvi]]); only codecs with no such
  * decoder (compressed audio, lossy VP8, non-MJPEG video codecs) fall
  * to the deterministic [[decodeStub]], which any real decoder (JNI,
  * ONNX runtime, subprocess) can replace without touching the plan —
  * and [[decodeCoverage]] reports the stubbed fraction per kind so the
  * degrade is observable, never silent.
  *
  * Scale notes: payload bytes never reach a wide shuffle — metadata is
  * computed scan-side; feature extraction is mapPartitions (one codec
  * init per partition, not per row), after `repartition` sized so one
  * partition's payloads fit executor memory.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      features: Array[Float])

  /** Wrap a text table as a media table (the driver testdata has no binary
    * column; UTF-8 bytes stand in for real payloads — same plumbing).
    */
  def payloadFrom(df: DataFrame, idCol: String, textCol: String,
      kind: String = "text"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** Scan-side metadata: byte length + SHA-256 — no decode needed. */
  def withMetadata(media: DataFrame): DataFrame =
    media.withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("sha256", sha2(col("payload"), 256))

  /** Magic-byte signature table — ONE ordered rule list drives both the
    * JVM classifier ([[detectKind]]) and the codegen column
    * ([[detectKindCol]]), so the two can't drift. Prefix rules only
    * (the standard file(1) treatment); RIFF containers disambiguate on
    * the format tag at offset 8 (WEBP/WAVE/AVI ), any other tag reports
    * the bare container. Detection trusts the BYTES, not a
    * caller-supplied kind column — a mislabeled crawl payload routes to
    * the decoder its magic says, or honestly to `unknown`.
    */
  private val MagicRules: Seq[(String, Array[Byte])] = Seq(
    "png" -> Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "gif" -> "GIF8".getBytes("ISO-8859-1"),
    "pdf" -> "%PDF-".getBytes("ISO-8859-1"),
    "gzip" -> Array(0x1F, 0x8B).map(_.toByte),
    "zstd" -> Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte),
    "zip" -> Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte),
    "tiff-le" -> Array(0x49, 0x49, 0x2A, 0x00).map(_.toByte),
    "tiff-be" -> Array(0x4D, 0x4D, 0x00, 0x2A).map(_.toByte),
    "warc" -> "WARC/".getBytes("ISO-8859-1"),
    "bmp" -> "BM".getBytes("ISO-8859-1"),
    "flac" -> "fLaC".getBytes("ISO-8859-1"),
    "mp3" -> "ID3".getBytes("ISO-8859-1"),
    // the Ogg page capture pattern — the container for Opus/Vorbis
    // audio on the open web; the bare container name, the riff stance
    // (codec disambiguation needs the first packet, not the prefix)
    "ogg" -> "OggS".getBytes("ISO-8859-1"),
    // ICONDIR: reserved 0, type 1 — the favicon format every crawl hits
    "ico" -> Array(0x00, 0x00, 0x01, 0x00).map(_.toByte),
    // prefix-only text sniffs, stated scope: an XML-prologued svg reads
    // "xml" (content sniffing past the first bytes is not a prefix rule)
    "xml" -> "<?xml".getBytes("ISO-8859-1"),
    "svg" -> "<svg".getBytes("ISO-8859-1"))

  private val RiffTags: Seq[(String, String)] =
    Seq("WEBP" -> "webp", "WAVE" -> "wav", "AVI " -> "avi")

  /** ISO-BMFF brand table — the offset-4 rule: bytes 4-7 spell "ftyp"
    * and the MAJOR brand at offset 8 disambiguates the family (the RIFF
    * tag rule transplanted to the MP4 container world): mp4/mov/m4a
    * audio-video containers, avif/heic the image formats riding the
    * same box grammar. Unlisted brands report the bare container
    * ("isobmff" — the `riff` stance). Major brand only, stated: a file
    * whose major brand is generic but whose compatible-brands list
    * names avif classifies by its major brand.
    */
  private val FtypBrands: Seq[(String, String)] = Seq(
    "avif" -> "avif", "avis" -> "avif",
    "heic" -> "heic", "heix" -> "heic", "mif1" -> "heic", "msf1" -> "heic",
    "isom" -> "mp4", "iso2" -> "mp4", "iso4" -> "mp4", "iso5" -> "mp4",
    "iso6" -> "mp4", "mp41" -> "mp4", "mp42" -> "mp4", "dash" -> "mp4",
    "qt  " -> "mov", "M4A " -> "m4a")

  /** The EBML element magic (`1A 45 DF A3`) — the Matroska-family
    * container (WebM is Matroska restricted to VP8/VP9/AV1 + Opus/
    * Vorbis, a top-3 video container on the open web). The family
    * disambiguates on the DocType element (`42 82`), which sits at a
    * VARIABLE offset inside the EBML header — not a prefix rule — so
    * the shared rule both classifiers (and the DuckDB replay) can spell
    * is: a byte-aligned occurrence of the full DocType element
    * (id + one-byte size + the doctype string) within the FIRST
    * [[EbmlDocTypeWindow]] bytes → that kind; otherwise the bare
    * container ("ebml" — the riff/isobmff stance). Real muxers put
    * DocType within the first ~30 bytes; the marker bytes (0x82/0x88)
    * cannot occur in ASCII text, so the bounded search is as precise as
    * a walk for everything but a crafted payload — which classifies
    * identically (and harmlessly) in every engine, the true-replay
    * requirement.
    */
  private val EbmlMagic: Array[Byte] =
    Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)
  private[llmops] val EbmlDocTypeWindow = 64
  private val EbmlDocTypes: Seq[(String, Array[Byte])] = Seq(
    "webm" -> (Array[Byte](0x42.toByte, 0x82.toByte, 0x84.toByte) ++
      "webm".getBytes("ISO-8859-1")),
    "mkv" -> (Array[Byte](0x42.toByte, 0x82.toByte, 0x88.toByte) ++
      "matroska".getBytes("ISO-8859-1")))

  /** Classify a payload by magic bytes (see [[MagicRules]]). Returns
    * "tiff" for either byte order; "riff" for a RIFF container with an
    * unrecognized format tag; "aiff" for a FORM (IFF) container whose
    * form type is AIFF/AIFC and "iff" for any other FORM type (the
    * riff stance); "isobmff" for an `ftyp` box with an
    * unlisted major brand; "mp4seg" for a CMAF/fMP4 MEDIA segment
    * (first box `styp`/`sidx`/`moof` — DASH/HLS segments carry no
    * ftyp); "webm"/"mkv"/"ebml" for the EBML magic by
    * the bounded DocType rule ([[EbmlDocTypes]]); "aac" for a bare
    * ADTS frame sync (0xFFF with LAYER BITS 00 — the field that
    * separates an ADTS AAC stream from MPEG audio, whose Layer III
    * spells 01 there); "mp3" for an ID3v2 tag OR a bare MPEG audio
    * frame sync (0xFF + three set bits) — the masked rules the
    * exact-prefix table can't spell, checked LAST so jpeg's FF D8 FF
    * wins, aac's tighter mask before mp3's (an ID3v2-tagged ADTS
    * stream reads "mp3" by the prefix rule, stated — the audio walk
    * then sniffs the layer bits after the tag skip and hands the
    * stream to the ADTS hop, so its duration still parses); "mpegts"
    * for three aligned sync bytes on the 188-byte packet grid (0x47 is
    * ASCII 'G', so one match is meaningless — the structural rule, and
    * GIF's prefix rule wins above it); "unknown" when nothing matches.
    */
  def detectKind(payload: Array[Byte]): String = {
    def startsWith(m: Array[Byte], off: Int): Boolean =
      payload.length >= off + m.length &&
        java.util.Arrays.equals(
          payload, off, off + m.length, m, 0, m.length)
    def at(s: String, off: Int): Boolean =
      startsWith(s.getBytes("ISO-8859-1"), off)
    if (at("RIFF", 0)) {
      RiffTags.collectFirst {
        case (tag, kind) if at(tag, 8) => kind
      }.getOrElse("riff")
    } else if (at("FORM", 0)) {
      // the IFF container (RIFF's big-endian ancestor): AIFF/AIFC
      // audio disambiguates on the form type at 8, the RIFF tag rule
      if (at("AIFF", 8) || at("AIFC", 8)) "aiff" else "iff"
    } else if (at("ftyp", 4)) {
      FtypBrands.collectFirst {
        case (brand, kind) if at(brand, 8) => kind
      }.getOrElse("isobmff")
    } else if (at("styp", 4) || at("sidx", 4) || at("moof", 4)) {
      // a CMAF/fMP4 MEDIA segment (DASH/HLS): no ftyp — the first box
      // is the segment type, a segment index, or a movie fragment
      "mp4seg"
    } else if (startsWith(EbmlMagic, 0)) {
      val lim = math.min(payload.length, EbmlDocTypeWindow)
      def found(m: Array[Byte]): Boolean =
        (0 to lim - m.length).exists(startsWith(m, _))
      EbmlDocTypes.collectFirst {
        case (kind, m) if found(m) => kind
      }.getOrElse("ebml")
    } else MagicRules.collectFirst {
      case (kind, m) if startsWith(m, 0) =>
        if (kind.startsWith("tiff")) "tiff" else kind
    }.getOrElse(
      // MPEG-TS: the sync byte 0x47 is ASCII 'G', so one match is
      // meaningless — the structural rule is three aligned sync bytes
      // at the 188-byte packet grid (GIF's prefix rule wins above)
      if (payload.length >= 377 && (payload(0) & 0xFF) == 0x47 &&
          (payload(188) & 0xFF) == 0x47 &&
          (payload(376) & 0xFF) == 0x47) "mpegts"
      else if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF &&
          (payload(1) & 0xF6) == 0xF0) "aac"
      else if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF &&
          (payload(1) & 0xE0) == 0xE0) "mp3"
      else "unknown")
  }

  /** The same classification as a codegen'd CASE over binary prefixes —
    * no UDF, so kind detection rides the scan (and a DuckDB replay can
    * walk the identical hex prefixes). Rule order mirrors [[detectKind]]
    * exactly: RIFF tag, ftyp brand, the EBML DocType rule, the prefix
    * table, the MPEG-audio frame sync (a hex-nibble check — FF then
    * E/F), unknown.
    */
  def detectKindCol(payload: Column): Column = {
    def pre(off: Int, m: Array[Byte]): Column =
      substring(payload, off + 1, m.length) === lit(m)
    def preS(off: Int, s: String): Column = pre(off, s.getBytes("ISO-8859-1"))
    val riff = RiffTags.foldRight(lit("riff")) { case ((tag, kind), e) =>
      when(preS(8, tag), lit(kind)).otherwise(e)
    }
    val ftyp = FtypBrands.foldRight(lit("isobmff")) { case ((brand, kind), e) =>
      when(preS(8, brand), lit(kind)).otherwise(e)
    }
    // the structural/masked tail, mirrored from the JVM rule order:
    // three 188-grid sync bytes route mpegts, then the frame-sync pair
    // with aac's tighter mask first (ADTS spells layer 00 in the second
    // byte — F0/F1/F8/F9 — where Layer III spells 01)
    val mp3Sync = when(length(payload) >= 377 &&
        hex(substring(payload, 1, 1)) === "47" &&
        hex(substring(payload, 189, 1)) === "47" &&
        hex(substring(payload, 377, 1)) === "47",
      lit("mpegts"))
      .when(hex(substring(payload, 1, 1)) === "FF" &&
        hex(substring(payload, 2, 1)).isin("F0", "F1", "F8", "F9"),
      lit("aac"))
      .when(hex(substring(payload, 1, 1)) === "FF" &&
        substring(hex(substring(payload, 2, 1)), 1, 1).isin("E", "F"),
      lit("mp3")).otherwise(lit("unknown"))
    val rest = MagicRules.foldRight(mp3Sync) { case ((kind, m), e) =>
      when(pre(0, m),
        lit(if (kind.startsWith("tiff")) "tiff" else kind)).otherwise(e)
    }
    // the same bounded DocType search as the JVM side: a byte-aligned
    // contains over the first EbmlDocTypeWindow bytes (binary contains
    // is inherently byte-aligned; the DuckDB replay anchors hex pairs
    // with a `^(?:..)*` regexp)
    val ebmlWin = substring(payload, 1, EbmlDocTypeWindow)
    val ebml = EbmlDocTypes.foldRight(lit("ebml")) { case ((kind, m), e) =>
      when(contains(ebmlWin, lit(m)), lit(kind)).otherwise(e)
    }
    when(preS(0, "RIFF"), riff)
      .when(preS(0, "FORM"),
        when(preS(8, "AIFF") || preS(8, "AIFC"), lit("aiff"))
          .otherwise(lit("iff")))
      .when(preS(4, "ftyp"), ftyp)
      .when(preS(4, "styp") || preS(4, "sidx") || preS(4, "moof"),
        lit("mp4seg"))
      .when(pre(0, EbmlMagic), ebml)
      .otherwise(rest)
  }

  /** Image dimensions WITHOUT decode — the scan-side size gate: at
    * 100 TB you filter thumbnails/banners/oversized images out BEFORE
    * paying a decode, so dims must come from the header fields alone.
    * JVM twin of [[imageDimsCol]] plus the formats whose headers need a
    * walk (JPEG SOF scan, WebP VP8L bit-packed / VP8 start-code / VP8X
    * canvas fields, the TIFF first-IFD walk in both byte orders, the
    * ISO-BMFF `ispe` box walk for avif/heic). Returns (width, height);
    * None when the magic or the header fields don't parse.
    */
  def imageDims(payload: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Long = (be16(i).toLong << 16) | be16(i + 2)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    try {
      detectKind(payload) match {
        case "png" if payload.length >= 24 &&
            new String(payload, 12, 4, "ISO-8859-1") == "IHDR" =>
          Some((be32(16).toInt, be32(20).toInt))
        case "gif" if payload.length >= 10 =>
          Some((le16(6), le16(8)))
        case "bmp" if payload.length >= 26 && le32(14) >= 40 =>
          // BITMAPINFOHEADER: signed LE32; negative height = top-down
          Some((le32(18).toInt, math.abs(le32(22).toInt)))
        case "jpeg" =>
          // marker walk to the first SOFn (C0-C3, C5-C7, C9-CB, CD-CF)
          var i = 2
          var out: Option[(Int, Int)] = None
          while (out.isEmpty && i + 4 <= payload.length) {
            if (u8(i) != 0xff) return None
            val m = u8(i + 1)
            if (m == 0xff) i += 1 // fill byte
            else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
            else {
              val len = be16(i + 2)
              if (len < 2 || i + 2 + len > payload.length) return None
              val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 &&
                m != 0xc8 && m != 0xcc
              if (isSof) {
                if (len < 7) return None
                out = Some((be16(i + 7), be16(i + 5)))
              }
              i += 2 + len
            }
          }
          out
        case "webp" if payload.length >= 30 =>
          val tag = new String(payload, 12, 4, "ISO-8859-1")
          tag match {
            case "VP8L" if u8(20) == 0x2f =>
              // 14-bit fields, LSB-first from byte 21
              val b = le32(21)
              Some((((b & 0x3fff) + 1).toInt, (((b >> 14) & 0x3fff) + 1).toInt))
            case "VP8 " if payload.length >= 30 &&
                u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a =>
              Some((le16(26) & 0x3fff, le16(28) & 0x3fff))
            case "VP8X" if payload.length >= 31 =>
              // 24-bit LE canvas-minus-one fields at payload offsets 4/7
              def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
              Some((le24(24) + 1, le24(27) + 1))
            case _ => None
          }
        case "tiff" => tiffDims(payload)
        case "avif" | "heic" | "isobmff" => ispeDims(payload)
        case "ico" if payload.length >= 8 && le16(4) >= 1 =>
          // first ICONDIRENTRY: single dimension bytes, 0 means 256
          def dim(i: Int): Int = if (u8(i) == 0) 256 else u8(i)
          Some((dim(6), dim(7)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** TIFF dimensions via the first-IFD walk, both byte orders: tags 256
    * (ImageWidth) and 257 (ImageLength) of SHORT or LONG type, count 1 —
    * the baseline layout every mainstream writer emits. Values are
    * LEFT-justified in the entry's 4-byte value field per spec, so a
    * SHORT reads from the field's first two bytes in either byte order.
    * Torn header/IFD or a missing tag → None.
    */
  private def tiffDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val n = payload.length
    if (n < 8) return None
    val le = payload(0) == 'I'.toByte
    def u8(i: Int): Int = payload(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > n) return None
    val cnt = u16(ifd.toInt)
    if (ifd + 2 + 12L * cnt > n) return None
    var w = 0L; var h = 0L
    var i = 0
    while (i < cnt) {
      val base = ifd.toInt + 2 + 12 * i
      val tpe = u16(base + 2)
      if (u32(base + 4) == 1L && (tpe == 3 || tpe == 4)) {
        val v = if (tpe == 3) u16(base + 8).toLong else u32(base + 8)
        u16(base) match {
          case 256 => w = v
          case 257 => h = v
          case _ =>
        }
      }
      i += 1
    }
    if (w >= 1 && h >= 1 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some((w.toInt, h.toInt))
    else None
  }

  /** ISO-BMFF `ispe` walk for avif/heic dimensions: scan the box tree
    * (32-bit sizes, the 64-bit `largesize` form, size-0 to-end boxes)
    * into `meta` (a FullBox — 4 version/flag bytes after the header) →
    * `iprp` → `ipco`, returning the FIRST ispe's width/height — the
    * primary item's property in the files mainstream encoders emit
    * (resolving the pitm→ipma association to pick among multiple ispe
    * boxes is out of stated scope: a thumbnail-first property container
    * reads the thumb). Torn boxes end that level's walk; depth-capped
    * like the AVI LIST recursion.
    */
  private def ispeDims(payload: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Long = payload(i) & 0xffL
    def be32(i: Int): Long =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def walk(start: Long, end: Long, depth: Int): Option[(Int, Int)] = {
      var off = start
      while (off + 8 <= end) {
        val sz0 = be32(off.toInt)
        var hdr = 8L
        var sz = sz0
        if (sz0 == 1L) {
          if (off + 16 > end) return None
          sz = be64(off.toInt + 8); hdr = 16L
        } else if (sz0 == 0L) sz = end - off
        if (sz < hdr || off + sz > end || sz > Int.MaxValue) return None
        val t = new String(payload, off.toInt + 4, 4, "ISO-8859-1")
        if (t == "ispe" && sz >= hdr + 12) {
          // same sanity bound as tiffDims: a crafted ispe can carry a
          // zero or >Int.MaxValue axis — downstream pixel math must
          // never see a nonpositive dimension, so out-of-range rejects
          val iw = be32((off + hdr + 4).toInt)
          val ih = be32((off + hdr + 8).toInt)
          return if (iw >= 1 && ih >= 1 && iw <= Int.MaxValue &&
            ih <= Int.MaxValue) Some((iw.toInt, ih.toInt)) else None
        }
        val inner =
          if (depth < 8 && t == "meta" && sz >= hdr + 4)
            walk(off + hdr + 4, off + sz, depth + 1)
          else if (depth < 8 && (t == "iprp" || t == "ipco"))
            walk(off + hdr, off + sz, depth + 1)
          else None
        if (inner.isDefined) return inner
        off += sz
      }
      None
    }
    walk(0L, payload.length.toLong, 0)
  }

  /** The arithmetic half of [[imageDims]] as a codegen column — PNG
    * (BE32 IHDR fields), GIF (LE16 logical-screen fields), BMP (LE32
    * BITMAPINFOHEADER fields) and ICO (ICONDIR entry bytes, 0 means
    * 256) have their dimensions at constant offsets, and TIFF parses in
    * its CANONICAL layout (first IFD at offset 8 — what the JDK writer
    * and every header-first writer emits), so every read is a
    * literal-offset hex + conv + substring with no UDF. The TIFF half
    * scans the first [[TiffColMaxEntries]] IFD entries for tags 256/257,
    * both byte orders — entries are spec-ordered ASCENDING by tag and
    * only 254/255 can precede 256, so the dims sit within the first
    * four entries of every conformant file (the cap also bounds the
    * unrolled codegen: a 16-entry unroll measurably cost ~70 s of
    * Janino compilation per plan — SCALE.md records the ladder).
    * Exotic prefixes or an IFD placed after the image data read null
    * here and the unbounded JVM walk handles them. Returns
    * struct(w, h); null for every other kind (route those through
    * [[imageDims]] inside the decode stage, where the payload is
    * already in hand).
    *
    * Codegen stance, measured r15: this one CASE generates more than
    * the JVM's 64 KB single-method budget (CaseWhen branches past the
    * first are conditionally evaluated, so whole-stage codegen can
    * neither split them into helper methods nor share the repeated
    * subtrees), so a plan containing it runs with WHOLE-STAGE fusion
    * disabled — each operator still executes a COMPILED, method-split
    * UnsafeProjection (verified: no second compile failure; the oracle
    * lane holds 0.36 s at sf0.1), it just isn't fused with its
    * neighbors. This column is the DuckDB-replayable byte-walk surface;
    * compositions that want one fused scan use the native
    * [[org.apache.spark.sql.graftfn.MediaHeaderMeta]] expression (the
    * sizeGate path), whose generated code is one static call.
    */
  private val TiffColMaxEntries = 6

  def imageDimsCol(payload: Column): Column = {
    def byteHex(i: Int): Column = hex(substring(payload, i + 1, 1))
    def leAt(i: Int, n: Int): Column =
      conv(concat(((i + n - 1) to i by -1).map(byteHex(_)): _*), 16, 10)
        .cast("long")
    def beAt(i: Int, n: Int): Column =
      conv(hex(substring(payload, i + 1, n)), 16, 10).cast("long")
    // per-format PREFIX predicates instead of embedding the full
    // detectKindCol router once per branch: CaseWhen branches past the
    // first are conditionally evaluated, so codegen CANNOT extract the
    // repeated router as a common subexpression — it inlines five
    // times, and with the r15 EBML rules the fused unit crossed the
    // JVM 64 KB method limit. `detectKind(x) == "gif"` is exactly
    // `GIF8-prefix AND NOT ftyp-at-4` (no earlier rule's magic
    // prefixes these, RIFF/EBML magics don't overlap them, and only
    // the offset-4 ftyp rule can shadow a short prefix — PNG's 8-byte
    // magic pins bytes 4-7 so it needs no guard).
    val notFtyp = !(substring(payload, 5, 4) ===
      lit("ftyp".getBytes("ISO-8859-1")))
    def pre(m: Array[Byte]): Column = substring(payload, 1, m.length) === lit(m)
    val isPng = pre(MagicRules.collectFirst { case ("png", m) => m }.get)
    val isGif = pre("GIF8".getBytes("ISO-8859-1")) && notFtyp
    val isBmp = pre("BM".getBytes("ISO-8859-1")) && notFtyp
    val isTiff = (pre(Array(0x49, 0x49, 0x2A, 0x00).map(_.toByte)) ||
      pre(Array(0x4D, 0x4D, 0x00, 0x2A).map(_.toByte))) && notFtyp
    val isIco = pre(Array(0x00, 0x00, 0x01, 0x00).map(_.toByte)) && notFtyp
    // BMP height is SIGNED LE32 (negative = top-down rows): two's
    // complement on the unsigned read
    val bmpH = leAt(22, 4)
    val bmpHAbs = when(bmpH >= (1L << 31), lit(1L << 32) - bmpH).otherwise(bmpH)
    // --- TIFF: the CANONICAL first-IFD-at-offset-8 layout (what
    // ImageIO and every header-first writer emits — verified: the JDK
    // writer pins ifdOffset=8), so every field offset is a LITERAL and
    // the whole parse stays inside whole-stage codegen. Files whose
    // first IFD sits elsewhere (libtiff-style IFD-after-data) read null
    // here and the JVM walk handles them — the canonical-WAV stance.
    // (Two earlier forms are recorded in SCALE.md: dynamic-position
    // reads duplicated the IFD-pointer subtree into every byte read and
    // blew the generated code past the driver heap; a transform-lambda
    // binding fixed the size but its non-codegen ArrayTransform dragged
    // the ENTIRE CASE to interpreted eval for every row — 10× on the
    // oracle lane.)
    val isLe = substring(payload, 1, 2) === lit("II".getBytes("ISO-8859-1"))
    def tiffAt(off: Int, n: Int): Column = {
      val h = hex(substring(payload, off + 1, n))
      val le = conv(concat(((n - 1) to 0 by -1).map(j =>
        substring(h, 2 * j + 1, 2)): _*), 16, 10).cast("long")
      when(isLe, le).otherwise(conv(h, 16, 10).cast("long"))
    }
    val ifd = tiffAt(4, 4)
    val nEnt = tiffAt(8, 2)
    def entryDim(tag: Long): Column = {
      val hits = (0 until TiffColMaxEntries).map { i =>
        val base = 10 + 12 * i // literal byte offset of entry i
        val tpe = tiffAt(base + 2, 2)
        // per-entry truncation bound: hex() of a PARTLY-present field
        // yields a short string and conv() happily parses it as a
        // smaller number — without the literal length gate a TIFF torn
        // mid-IFD would read garbage dims here while the bounds-checked
        // JVM walk rejects it (the col/JVM parity law). A fully-absent
        // entry already read null; this makes partial ones match it.
        // The SHORT/LONG dispatch lives in the VALUE (a bad type reads
        // null and the hit skips) so the tpe read is inlined twice per
        // entry, not three times — codegen size is the budget here.
        when(length(payload) >= lit(base + 12) &&
            lit(i.toLong) < nEnt && tiffAt(base, 2) === tag &&
            tiffAt(base + 4, 4) === 1L,
          when(tpe === 3L, tiffAt(base + 8, 2))
            .when(tpe === 4L, tiffAt(base + 8, 4)))
      }
      coalesce(hits :+ lit(null).cast("long"): _*)
    }
    val tiffW = entryDim(256L)
    val tiffH = entryDim(257L)
    val tiffDim = when(tiffW >= 1L && tiffH >= 1L,
      struct(tiffW.as("w"), tiffH.as("h")))
      .otherwise(lit(null).cast("struct<w:bigint,h:bigint>"))
    // no nEnt cap in the guard: the cap bounds the SCAN, not the file —
    // a 15-entry ImageIO IFD still parses because its 256/257 lead;
    // reads past a short payload conv to null and the hit skips
    val tiffOk = length(payload) >= 10 && tiffAt(2, 2) === 42L &&
      ifd === 8L
    when(isPng && length(payload) >= 24 &&
        substring(payload, 13, 4) === lit("IHDR".getBytes("ISO-8859-1")),
      struct(beAt(16, 4).as("w"), beAt(20, 4).as("h")))
      .when(isGif && length(payload) >= 10,
        struct(leAt(6, 2).as("w"), leAt(8, 2).as("h")))
      .when(isBmp && length(payload) >= 26 && leAt(14, 4) >= 40,
        struct(leAt(18, 4).as("w"), bmpHAbs.as("h")))
      .when(isTiff && tiffOk, tiffDim)
      .when(isIco && length(payload) >= 8 && leAt(4, 2) >= 1L,
        struct(
          when(leAt(6, 1) === 0L, 256L).otherwise(leAt(6, 1)).as("w"),
          when(leAt(7, 1) === 0L, 256L).otherwise(leAt(7, 1)).as("h")))
      .otherwise(lit(null).cast("struct<w:bigint,h:bigint>"))
  }

  /** JPEG EXIF orientation (r15 — the image-prep correctness bit every
    * thumbnail/perceptual-hash pipeline needs: cameras store rotated
    * pixels plus the 1–8 orientation tag, and ignoring it makes
    * visually-identical photos invisible to aHash across devices): the
    * [[imageDims]] marker walk to APP1, the `Exif\0\0` preamble, then
    * a TIFF IFD0 walk in EITHER byte order for tag 0x0112 (SHORT).
    * None when the tag/segment is absent or torn — the spec default is
    * 1 (top-left), the caller's to apply; values outside 1–8 reject.
    * The walk stops at SOS: APP segments precede entropy data by spec.
    */
  def exifOrientation(payload: Array[Byte]): Option[Int] = {
    if (detectKind(payload) != "jpeg") return None
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    try {
      var i = 2
      while (i + 4 <= payload.length) {
        if (u8(i) != 0xff) return None
        val m = u8(i + 1)
        if (m == 0xff) i += 1
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else {
          val len = be16(i + 2)
          if (len < 2 || i + 2 + len > payload.length) return None
          if (m == 0xe1 && len >= 16 &&
              new String(payload, i + 4, 4, "ISO-8859-1") == "Exif" &&
              u8(i + 8) == 0 && u8(i + 9) == 0) {
            val t = i + 10
            if (t + 8 > payload.length) return None
            val le = u8(t) == 0x49 && u8(t + 1) == 0x49
            val be = u8(t) == 0x4d && u8(t + 1) == 0x4d
            if (!le && !be) return None
            def r16(j: Int): Int =
              if (le) u8(j) | (u8(j + 1) << 8) else be16(j)
            def r32(j: Int): Long =
              if (le) r16(j).toLong | (r16(j + 2).toLong << 16)
              else (r16(j).toLong << 16) | r16(j + 2)
            if (r16(t + 2) != 42) return None
            val ifdOff = r32(t + 4)
            if (ifdOff < 8L || ifdOff > Int.MaxValue - 16L) return None
            val ifd = t + ifdOff.toInt
            if (ifd + 2 > payload.length) return None
            val cnt = r16(ifd)
            var e = 0
            while (e < cnt) {
              val p = ifd + 2 + e * 12
              if (p + 12 > payload.length) return None
              if (r16(p) == 0x0112) {
                val v = r16(p + 8)
                return if (v >= 1 && v <= 8) Some(v) else None
              }
              e += 1
            }
            return None
          }
          if (m == 0xda) return None
          i += 2 + len
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class AudioMeta(sample_rate: Long, channels: Long,
      n_samples: Long, duration_micros: Long)

  /** Audio stream parameters WITHOUT decode — the [[imageDims]] sibling
    * for sound: at 100 TB the audio size gate (too short / too long /
    * wrong rate) must read header fields, not pay a PCM decode for the
    * reject decision. Routes by [[detectKind]] of the bytes:
    *
    *   - wav: the [[wavPcm]] chunk walk's fmt/data headers only (frames
    *     from the data chunk LENGTH — no sample is read);
    *   - flac: STREAMINFO (spec-mandated first metadata block): 20-bit
    *     sample rate, 3-bit channels, 36-bit total samples;
    *   - mp3: MPEG audio frame-header hop (Layer III, all three MPEG
    *     versions; ID3v2 tags skipped via the syncsafe size) — each
    *     header gives the frame's byte length and sample count, so the
    *     walk visits ~one 4-byte read per frame and sums an EXACT
    *     duration for CBR and VBR alike; free-format bitrate (index 0)
    *     and a desynced byte end the walk with whatever parsed
    *     (truncated tail = the parsed prefix's duration, the degrade
    *     contract);
    *   - ogg: the [[oggMeta]] container walk — Opus/Vorbis
    *     identification headers + the last page's granule position
    *     (r15);
    *   - m4a: the [[m4aMeta]] moov walk — the audio trak's mdhd
    *     timescale (= sample rate) and duration (= samples) (r15);
    *   - aac: the [[aacMeta]] ADTS frame-header hop — the mp3 walk's
    *     MPEG-4 sibling, 1024 samples per raw data block (r15);
    *   - aiff: the [[aiffMeta]] COMM-chunk walk — channels, per-channel
    *     frame count, and the 80-bit extended-float sample rate read
    *     exactly by integer shift arithmetic (r15).
    *
    * `n_samples` counts per-channel PCM frames in every branch;
    * `duration_micros = n_samples · 10⁶ div rate` (integer). None when
    * the magic or the headers don't parse.
    */
  def audioDims(payload: Array[Byte]): Option[AudioMeta] =
    try {
      detectKind(payload) match {
        case "wav" => wavPcm(payload).map { case (ch, rate, bits, _, dLen) =>
          val frames = dLen.toLong / (bits / 8) / ch
          AudioMeta(rate.toLong, ch.toLong, frames, frames * 1000000L / rate)
        }
        case "flac" => flacStreamInfo(payload)
        case "mp3" => mp3Meta(payload)
        case "ogg" => oggMeta(payload)
        case "m4a" => m4aMeta(payload)
        case "aac" => aacMeta(payload)
        case "aiff" => aiffMeta(payload)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ISO-BMFF AUDIO meta (r15 — the m4a podcast gate: an hour-long
    * m4a previously read no_header because only the VIDEO walk knew the
    * container): moov → the first trak whose `hdlr` handler type is
    * `soun` → its `mdhd` — for an audio track the mdhd TIMESCALE is the
    * sample rate and the mdhd DURATION counts samples at it, both
    * FullBox versions; channels from the fixed-layout channelcount
    * field of the first audio SampleEntry inside `stbl`→`stsd` (what
    * every AAC writer emits; a torn/absent stsd degrades to channel
    * count 1, the mono-safe floor — stated). Duration sentinel rules
    * follow [[mp4Meta]]: mdhd duration 0 / all-ones means UNKNOWN —
    * and since [[AudioMeta]] carries no absent-duration form, such
    * files return None (audio with unknown length has nothing to gate
    * on — the honest no_header class).
    */
  private def m4aMeta(payload: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int): Long = payload(i) & 0xffL
    def be32(i: Int): Long =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxes(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit = {
      var off = start
      while (off + 8 <= end) {
        val sz0 = be32(off.toInt)
        var hdr = 8L
        var sz = sz0
        if (sz0 == 1L) {
          if (off + 16 > end) return
          sz = be64(off.toInt + 8); hdr = 16L
        } else if (sz0 == 0L) sz = end - off
        if (sz < hdr || off + sz > end || sz > Int.MaxValue) return
        f(new String(payload, off.toInt + 4, 4, "ISO-8859-1"),
          off + hdr, off + sz)
        off += sz
      }
    }
    def into(start: Long, end: Long, name: String): Option[(Long, Long)] = {
      var out: Option[(Long, Long)] = None
      boxes(start, end)((t, p, e) => if (out.isEmpty && t == name) out = Some((p, e)))
      out
    }
    var rate = 0L
    var nSamples = -1L
    var channels = 1L
    var found = false
    def trak(start: Long, end: Long): Unit = {
      if (found) return
      into(start, end, "mdia").foreach { case (mp, me) =>
        val isSoun = into(mp, me, "hdlr").exists { case (hp, he) =>
          hp + 16 <= he &&
            new String(payload, hp.toInt + 8, 4, "ISO-8859-1") == "soun"
        }
        if (isSoun) into(mp, me, "mdhd").foreach { case (dp, de) =>
          val v = u8(dp.toInt)
          if (v == 0L && de >= dp + 20) {
            rate = be32(dp.toInt + 12)
            nSamples = be32(dp.toInt + 16)
            if (nSamples == 0xffffffffL) nSamples = -1L
          } else if (v == 1L && de >= dp + 32) {
            rate = be32(dp.toInt + 20)
            nSamples = be64(dp.toInt + 24)
          }
          // channels from the first audio SampleEntry's fixed layout
          for {
            (ip, ie) <- into(mp, me, "minf")
            (sp, se) <- into(ip, ie, "stbl")
            (tp, te) <- into(sp, se, "stsd")
          } if (tp + 8 + 8 + 16 + 2 <= te) {
            val ch = (u8(tp.toInt + 32) << 8) | u8(tp.toInt + 33)
            if (ch >= 1 && ch <= 64) channels = ch
          }
          if (rate >= 1 && nSamples > 0) found = true
        }
      }
    }
    boxes(0L, payload.length.toLong) { (t, p, e) =>
      if (t == "moov") boxes(p, e) { (t2, p2, e2) =>
        if (t2 == "trak") trak(p2, e2)
      }
    }
    if (found && nSamples <= Long.MaxValue / 1000000L)
      Some(AudioMeta(rate, channels, nSamples, nSamples * 1000000L / rate))
    else None
  }

  /** Ogg container walk (r15 — the Ogg front door's meta half): the
    * FIRST page's identification packet names the codec —
    *
    *   - Opus ("OpusHead"): channels + 16-bit pre-skip; granule
    *     positions count 48 kHz samples by spec, so `sample_rate`
    *     reports 48000 (the decode rate — the informational
    *     input-sample-rate field is not the stream clock, stated) and
    *     `n_samples = last granule − pre-skip`;
    *   - Vorbis (0x01 "vorbis"): channels + the LE32 rate; granule
    *     positions count PCM frames at that rate.
    *
    * The stream LENGTH comes from the LAST page's granule position —
    * found by scanning BACKWARD for the final valid "OggS" capture
    * (version 0, non-negative granule; pages whose granule is the
    * -1 no-packet-ends sentinel skip further back). A torn tail
    * degrades to the last intact page's granule — the parsed-prefix
    * contract; a header-only fragment reads 0 samples (nothing
    * decodable is an honest zero). None when the magic or the
    * identification packet don't parse.
    */
  private def oggMeta(payload: Array[Byte]): Option[AudioMeta] = {
    val n = payload.length
    if (n < 28) return None
    def u8(i: Int): Long = payload(i) & 0xffL
    def le16(i: Int): Long = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = le16(i) | (le16(i + 2) << 16)
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)
    def isPage(i: Int): Boolean =
      i + 27 <= n && payload(i) == 'O'.toByte && payload(i + 1) == 'g'.toByte &&
        payload(i + 2) == 'g'.toByte && payload(i + 3) == 'S'.toByte &&
        payload(i + 4) == 0
    if (!isPage(0)) return None
    // first page payload = the identification packet
    val nSegs = u8(26).toInt
    if (27 + nSegs > n) return None
    var segSum = 0
    var s = 0
    while (s < nSegs) { segSum += u8(27 + s).toInt; s += 1 }
    val p0 = 27 + nSegs
    val pEnd = math.min(n, p0 + segSum)
    def at(off: Int, m: String): Boolean =
      p0 + off + m.length <= pEnd &&
        m.indices.forall(k => payload(p0 + off + k) == m.charAt(k).toByte)
    val head: Option[(Long, Long, Long)] = // (rate, channels, preSkip)
      if (at(0, "OpusHead") && p0 + 12 <= pEnd)
        Some((48000L, u8(p0 + 9), le16(p0 + 10)))
      else if (p0 < pEnd && u8(p0) == 1L && at(1, "vorbis") &&
        p0 + 16 <= pEnd) {
        val rate = le32(p0 + 12)
        if (rate >= 1) Some((rate, u8(p0 + 11), 0L)) else None
      } else None
    head.flatMap { case (rate, ch, preSkip) =>
      if (ch < 1) None
      else {
        // last valid page's granule, scanning backward; the -1
        // sentinel (no packet ends on this page) skips further back
        var g = -1L
        var i = n - 27
        while (g < 0 && i >= 0) {
          if (isPage(i)) {
            val gp = le64(i + 6)
            if (gp >= 0) g = gp
          }
          i -= 1
        }
        if (g < 0) None
        else {
          val samples = math.max(0L, g - preSkip)
          Some(AudioMeta(rate, ch, samples, samples * 1000000L / rate))
        }
      }
    }
  }

  /** FLAC STREAMINFO parse (the spec requires it as the FIRST metadata
    * block, 34 bytes): sample rate / channels / total samples from the
    * bit-packed 8 bytes at offset 18. Zero rate (spec-reserved) → None.
    */
  private def flacStreamInfo(payload: Array[Byte]): Option[AudioMeta] = {
    if (payload.length < 42) return None
    def u8(i: Int): Long = payload(i) & 0xffL
    if ((u8(4) & 0x7f) != 0L ||
        ((u8(5) << 16) | (u8(6) << 8) | u8(7)) != 34L) return None
    val rate = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
    val ch = ((u8(20) >> 1) & 0x7) + 1
    val nSamples = ((u8(21) & 0xf) << 32) | (u8(22) << 24) |
      (u8(23) << 16) | (u8(24) << 8) | u8(25)
    if (rate == 0L) None
    else Some(AudioMeta(rate, ch, nSamples, nSamples * 1000000L / rate))
  }

  /** MPEG audio (Layer III) header walk — see [[audioDims]]. Public
    * bitrate/samplerate tables from the MPEG-1/2 audio spec. */
  private def mp3Meta(payload: Array[Byte]): Option[AudioMeta] = {
    val n = payload.length
    def u8(i: Int): Int = payload(i) & 0xff
    var off = 0
    if (n >= 10 && payload(0) == 'I'.toByte && payload(1) == 'D'.toByte &&
        payload(2) == '3'.toByte) {
      // ID3v2: 4-byte syncsafe size (7 bits per byte) + optional footer
      val sz = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      off = 10 + sz + (if ((u8(5) & 0x10) != 0) 10 else 0)
    }
    // ID3 can tag an ADTS AAC stream just as it tags MPEG audio — the
    // prefix rule reads "mp3", so THIS walk sniffs the layer bits after
    // the tag skip and hands an ADTS stream to its own hop (r15; was a
    // stated None)
    if (off + 2 <= n && u8(off) == 0xff && (u8(off + 1) & 0xf6) == 0xf0)
      return aacMeta(payload, off)
    val mpeg1Br = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)
    val mpeg2Br = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 144, 160)
    val baseRates = Array(44100, 48000, 32000)
    var rate = 0L; var ch = 0L; var samples = 0L; var frames = 0L
    var ok = off >= 0
    while (ok && off + 4 <= n) {
      val h = (u8(off) << 24) | (u8(off + 1) << 16) | (u8(off + 2) << 8) |
        u8(off + 3)
      val verBits = (h >>> 19) & 3 // 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
      val layerBits = (h >>> 17) & 3 // 1 = Layer III
      val brIdx = (h >>> 12) & 15
      val srIdx = (h >>> 10) & 3
      if ((h >>> 21) != 0x7ff || verBits == 1 || layerBits != 1 ||
          brIdx == 0 || brIdx == 15 || srIdx == 3) ok = false
      else {
        val mpeg1 = verBits == 3
        val sr = baseRates(srIdx) / (if (mpeg1) 1 else if (verBits == 2) 2 else 4)
        val br = (if (mpeg1) mpeg1Br(brIdx) else mpeg2Br(brIdx)) * 1000
        val spf = if (mpeg1) 1152 else 576
        val flen = spf / 8 * br / sr + ((h >>> 9) & 1)
        if (flen < 4 || off + flen > n) ok = false
        else {
          if (frames == 0L) {
            rate = sr.toLong
            ch = if (((h >>> 6) & 3) == 3) 1L else 2L
          }
          samples += spf; frames += 1; off += flen
        }
      }
    }
    if (frames == 0L || rate == 0L) None
    else Some(AudioMeta(rate, ch, samples, samples * 1000000L / rate))
  }

  /** ADTS AAC frame-header hop (r15 — the mp3 walk's MPEG-4 sibling; a
    * bare `FFF` AAC stream previously matched the looser mp3 mask and
    * read None): each 7/9-byte ADTS header carries the 13-bit frame
    * length, the 4-bit sampling-frequency index, the 3-bit channel
    * configuration and the 2-bit raw-data-block count, so the hop reads
    * one header per frame and sums EXACT samples (1024 per raw data
    * block) for CBR and VBR alike. Rate/channels pin from the FIRST
    * frame: frequency by the public MPEG-4 index table; configuration 7
    * is 8 channels (7.1) by the same table, configuration 0 means
    * "defined in a PCE" and degrades to the mono-safe floor of 1
    * (stated — the m4a absent-stsd precedent). Reserved frequency
    * indices (13–15), an impossible frame length (< the 7-byte header)
    * and a desynced byte end the walk with the parsed prefix — the mp3
    * degrade contract; CRC frames (protection bit 0) hop identically
    * because the frame length field covers the 2 CRC bytes.
    */
  private def aacMeta(payload: Array[Byte], from: Int = 0): Option[AudioMeta] = {
    val n = payload.length
    def u8(i: Int): Int = payload(i) & 0xff
    val rates = Array(96000, 88200, 64000, 48000, 44100, 32000, 24000,
      22050, 16000, 12000, 11025, 8000, 7350)
    var rate = 0L; var ch = 0L; var samples = 0L; var frames = 0L
    var off = from
    var ok = true
    while (ok && off + 7 <= n) {
      if (u8(off) != 0xff || (u8(off + 1) & 0xf6) != 0xf0) ok = false
      else {
        val sfi = (u8(off + 2) >> 2) & 0xf
        val cfg = ((u8(off + 2) & 1) << 2) | (u8(off + 3) >> 6)
        val flen = ((u8(off + 3) & 3) << 11) | (u8(off + 4) << 3) |
          (u8(off + 5) >> 5)
        val rdb = u8(off + 6) & 3
        if (sfi >= 13 || flen < 7 || off + flen > n) ok = false
        else {
          if (frames == 0L) {
            rate = rates(sfi).toLong
            ch = if (cfg == 0) 1L else if (cfg == 7) 8L else cfg.toLong
          }
          samples += 1024L * (rdb + 1); frames += 1; off += flen
        }
      }
    }
    if (frames == 0L) None
    else Some(AudioMeta(rate, ch, samples, samples * 1000000L / rate))
  }

  /** AIFF/AIFC COMM-chunk walk (r15 — the big-endian WAV sibling; the
    * archival/export format of audio tooling): FORM header, then even-
    * padded chunks; `COMM` carries channels (BE16), per-channel frame
    * count (BE32) and the sample rate as an 80-bit IEEE extended
    * float, which this walk reads EXACTLY by integer shift arithmetic
    * (15-bit exponent + 64-bit mantissa; every integer rate is
    * representable, so no floating point touches the value — the
    * DuckDB-replay discipline). Zero/denormal/oversized rates and a
    * truncated COMM read None; unknown chunks skip by their declared
    * size (the wavPcm contract).
    */
  private def aiffMeta(payload: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = (be16(i).toLong << 16) | be16(i + 2)
    val n = payload.length
    var off = 12L
    while (off + 8 <= n) {
      val id = new String(payload, off.toInt, 4, "ISO-8859-1")
      val sz = be32(off.toInt + 4)
      if (id == "COMM") {
        if (sz < 18L || off + 8 + 18 > n) return None
        val p = off.toInt + 8
        val ch = be16(p).toLong
        val frames = be32(p + 2)
        val exp = be16(p + 8) & 0x7fff
        val mant = (be32(p + 10) << 32) | be32(p + 14)
        val shift = exp - 16383 - 63
        val rate =
          if (exp == 0 || mant == 0L) 0L
          else if (shift > 0 || shift <= -64) 0L // over/underflow
          else mant >>> -shift
        return if (rate >= 1L && ch >= 1L && frames >= 0L)
          Some(AudioMeta(rate, ch, frames, frames * 1000000L / rate))
        else None
      }
      off += 8L + sz + (sz & 1L)
    }
    None
  }

  /** CMAF/fMP4 segment duration from the `sidx` box (r15 — the fMP4
    * half of the streaming-segment story, the [[tsMeta]] sibling): a
    * top-level box walk (the m4a idiom) to the FIRST `sidx`, whose
    * reference list sums subsegment durations in the declared
    * timescale; `duration_micros = sum · 10⁶ div timescale` — exact
    * integer division, headers-only (`moof`/`mdat` never read). Both
    * FullBox versions; a zero timescale, a torn reference list, or a
    * segment with no sidx (moof-only low-latency form) reads None —
    * the degrade contract.
    */
  def mp4SegDuration(payload: Array[Byte]): Option[Long] = {
    if (detectKind(payload) != "mp4seg") return None
    def u8(i: Int): Long = payload(i) & 0xffL
    def be32(i: Int): Long =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    val n = payload.length.toLong
    var off = 0L
    try {
      while (off + 8 <= n) {
        val sz0 = be32(off.toInt)
        var hdr = 8L
        var sz = sz0
        if (sz0 == 1L) {
          if (off + 16 > n) return None
          sz = be64(off.toInt + 8); hdr = 16L
        } else if (sz0 == 0L) sz = n - off
        if (sz < hdr || off + sz > n) return None
        if (new String(payload, off.toInt + 4, 4, "ISO-8859-1") == "sidx") {
          val p = (off + hdr).toInt
          val v = u8(p)
          val timescale = be32(p + 8)
          // v0: EPT(4)+offset(4); v1: 8+8 — the ref list follows
          val refsAt = p + 12 + (if (v == 0L) 8 else 16) + 2
          if (refsAt + 2 > n) return None
          val count = ((u8(refsAt) << 8) | u8(refsAt + 1)).toInt
          var total = 0L
          var i = 0
          while (i < count) {
            val r = refsAt + 2 + i * 12
            if (r + 12 > n) return None
            total += be32(r + 4)
            i += 1
          }
          return if (timescale >= 1L && total <= Long.MaxValue / 1000000L)
            Some(total * 1000000L / timescale)
          else None
        }
        off += sz
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class TsMeta(n_packets: Long, duration_micros: Option[Long])

  /** MPEG transport stream probe (r15 — the HLS SEGMENT half of the
    * playlist story: `.ts` media segments carry their wall-clock span
    * only in PCR timestamps): walk the 188-byte packet grid while the
    * sync byte holds (a desynced packet ends the walk with the parsed
    * prefix — the frame-hop degrade contract), counting packets and
    * reading the Program Clock Reference wherever an adaptation field
    * flags one (33-bit base × 300 + 9-bit extension, the 27 MHz grid);
    * `duration_micros = (lastPCR − firstPCR) / 27` — EXACT integer
    * division, headers-only, no PES/codec parse. Fewer than two PCRs
    * (or a non-increasing pair — a PCR wrap, out of stated scope for
    * seconds-long segments) reports None duration with the packet
    * count intact.
    */
  def tsMeta(payload: Array[Byte]): Option[TsMeta] = {
    if (detectKind(payload) != "mpegts") return None
    def u8(i: Int): Int = payload(i) & 0xff
    var off = 0
    var n = 0L
    var firstPcr = -1L
    var lastPcr = -1L
    while (off + 188 <= payload.length && u8(off) == 0x47) {
      val afc = (u8(off + 3) >> 4) & 3
      if (afc >= 2) {
        val afLen = u8(off + 4)
        if (afLen >= 7 && (u8(off + 5) & 0x10) != 0) {
          val base = (u8(off + 6).toLong << 25) | (u8(off + 7).toLong << 17) |
            (u8(off + 8).toLong << 9) | (u8(off + 9).toLong << 1) |
            (u8(off + 10) >> 7)
          val pcr = base * 300L + (((u8(off + 10) & 1) << 8) | u8(off + 11))
          if (firstPcr < 0L) firstPcr = pcr
          lastPcr = pcr
        }
      }
      n += 1L; off += 188
    }
    if (n == 0L) None
    else Some(TsMeta(n,
      if (firstPcr >= 0L && lastPcr > firstPcr)
        Some((lastPcr - firstPcr) / 27L)
      else None))
  }

  /** The [[wavPcm]] twin for AIFF: locates COMM + SSND, admits integer
    * PCM at 8, 16 or 24 bits — AIFF samples are BIG-endian and 8-bit
    * AIFF is SIGNED (both opposite to WAV, the classic interop trap).
    * Returns (channels, rate, bits, dataOffset, dataLen) where the
    * offset already accounts for SSND's offset field; None elsewhere.
    */
  private def aiffPcm(payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
    try {
      if (detectKind(payload) != "aiff") return None
      def u8(i: Int): Int = payload(i) & 0xff
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Long = (be16(i).toLong << 16) | be16(i + 2)
      val n = payload.length
      var off = 12L
      var comm: Option[(Int, Int, Int)] = None // (ch, rate, bits)
      var data: Option[(Int, Int)] = None      // (offset, len)
      while (off + 8 <= n && (comm.isEmpty || data.isEmpty)) {
        val id = new String(payload, off.toInt, 4, "ISO-8859-1")
        val sz = be32(off.toInt + 4)
        if (off + 8 + sz > n) return None
        val p = off.toInt + 8
        if (id == "COMM" && sz >= 18L) {
          val meta = aiffMeta(payload)
          comm = meta.map(m =>
            (m.channels.toInt, m.sample_rate.toInt, be16(p + 6)))
          if (meta.isEmpty) return None
        } else if (id == "SSND" && sz >= 8L) {
          val skip = be32(p)
          if (8L + skip > sz || skip > Int.MaxValue) return None
          data = Some((p + 8 + skip.toInt, (sz - 8L - skip).toInt))
        }
        off += 8L + sz + (sz & 1L)
      }
      for {
        (ch, rate, bits) <- comm
        (dOff, dLen) <- data
        if (bits == 8 || bits == 16 || bits == 24) && ch >= 1 && rate > 0
      } yield (ch, rate, bits, dOff, dLen)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL AIFF decode features — the [[decodeWav]] stat contract over
    * big-endian signed PCM (all samples pooled, amplitudes normalized
    * by 2^(bits−1)); None on undecodable bytes.
    */
  def decodeAiffFeatures(payload: Array[Byte], dims: Int = 8): Option[Array[Float]] =
    aiffPcm(payload).map { case (ch, rate, bits, dOff, dLen) =>
      def sample(i: Int): Double =
        if (bits == 8) payload(dOff + i) / 128.0
        else if (bits == 24)
          ((payload(dOff + i * 3) << 16) |
            ((payload(dOff + i * 3 + 1) & 0xff) << 8) |
            (payload(dOff + i * 3 + 2) & 0xff)) / 8388608.0
        else ((payload(dOff + i * 2) << 8) |
          (payload(dOff + i * 2 + 1) & 0xff)) / 32768.0
      val n = dLen / (bits / 8)
      var sum = 0.0; var sum2 = 0.0
      var mn = Double.MaxValue; var mx = Double.MinValue
      var i = 0
      while (i < n) {
        val v = sample(i)
        sum += v; sum2 += v * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      val frames = n / ch
      val feats =
        if (n == 0) Array(ch.toFloat, rate.toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
        else Array(ch.toFloat, rate.toFloat, frames.toFloat,
          (sum / n).toFloat, math.sqrt(sum2 / n).toFloat,
          mn.toFloat, mx.toFloat, frames.toFloat / rate)
      val out = new Array[Float](dims)
      feats.take(dims).copyToArray(out)
      out
    }

  /** Channel-averaged PCM in [-1, 1] from a decodable AIFF — the
    * [[wavMonoSamples]] twin over big-endian signed samples. The SAME
    * recording written as WAV and as AIFF yields the IDENTICAL sample
    * stream, so the envelope signature matches bit-for-bit — the
    * FLAC≡WAV parity law extended to the big-endian container.
    */
  def aiffMonoSamples(payload: Array[Byte]): Option[Array[Float]] =
    aiffPcm(payload).map { case (ch, _, bits, dOff, dLen) =>
      def sample(i: Int): Double =
        if (bits == 8) payload(dOff + i) / 128.0
        else if (bits == 24)
          ((payload(dOff + i * 3) << 16) |
            ((payload(dOff + i * 3 + 1) & 0xff) << 8) |
            (payload(dOff + i * 3 + 2) & 0xff)) / 8388608.0
        else ((payload(dOff + i * 2) << 8) |
          (payload(dOff + i * 2 + 1) & 0xff)) / 32768.0
      val n = dLen / (bits / 8)
      val frames = n / ch
      val out = new Array[Float](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < ch) { acc += sample(f * ch + c); c += 1 }
        out(f) = (acc / ch).toFloat
        f += 1
      }
      out
    }

  /** The fixed-offset half of [[audioDims]] as a pure codegen column —
    * FLAC (STREAMINFO is spec-pinned to the first metadata block, so
    * every field sits at a constant offset) and CANONICAL-layout WAV
    * (fmt chunk at 12, data chunk at 36 — the layout every mainstream
    * encoder writes; exotic chunk orders read null here and the JVM
    * walk handles them, stated). All hex/conv/shift arithmetic riding
    * the scan; the duration division goes through DECIMAL minus its
    * pmod so the integer quotient is exact on any rate. Returns
    * struct(sample_rate, channels, n_samples, duration_micros); null
    * for everything else (mp3's variable frame walk is JVM-side by
    * design, the JPEG-SOF stance).
    */
  def audioDimsCol(payload: Column): Column = {
    def byteAt(i: Int): Column =
      conv(hex(substring(payload, i + 1, 1)), 16, 10).cast("long")
    def beAt(i: Int, n: Int): Column =
      conv(hex(substring(payload, i + 1, n)), 16, 10).cast("long")
    def leAt(i: Int, n: Int): Column =
      conv(concat(((i + n - 1) to i by -1).map(j =>
        hex(substring(payload, j + 1, 1))): _*), 16, 10).cast("long")
    // direct per-format predicates — the imageDimsCol equivalence note
    val isFlac = substring(payload, 1, 4) ===
      lit("fLaC".getBytes("ISO-8859-1")) &&
      !(substring(payload, 5, 4) === lit("ftyp".getBytes("ISO-8859-1")))
    val isWav = substring(payload, 1, 4) ===
      lit("RIFF".getBytes("ISO-8859-1")) &&
      substring(payload, 9, 4) === lit("WAVE".getBytes("ISO-8859-1"))
    def divExact(num: Column, den: Column): Column = {
      val d38 = num.cast("decimal(38,0)")
      val den38 = den.cast("decimal(38,0)")
      ((d38 - pmod(d38, den38)) / den38).cast("long")
    }
    // FLAC STREAMINFO
    val fRate = shiftleft(byteAt(18), 12) + shiftleft(byteAt(19), 4) +
      shiftright(byteAt(20), 4)
    val fCh = shiftright(byteAt(20), 1).bitwiseAND(lit(7L)) + 1L
    val fNs = shiftleft(byteAt(21).bitwiseAND(lit(15L)), 32) + beAt(22, 4)
    val flacOk = length(payload) >= 42 &&
      byteAt(4).bitwiseAND(lit(0x7fL)) === 0L && beAt(5, 3) === 34L &&
      fRate >= 1L
    // canonical WAV: RIFF/WAVE + "fmt " (16-byte PCM) at 12, "data" at 36
    val wCh = leAt(22, 2)
    val wRate = leAt(24, 4)
    val wBits = leAt(34, 2)
    val wDataLen = leAt(40, 4)
    val wBytesPerFrame = wCh * shiftright(wBits, 3)
    val wavOk = length(payload) >= 44 &&
      substring(payload, 13, 4) === lit("fmt ".getBytes("ISO-8859-1")) &&
      leAt(16, 4) === 16L && leAt(20, 2) === 1L &&
      (wBits === 8L || wBits === 16L) && wCh >= 1L && wRate >= 1L &&
      substring(payload, 37, 4) === lit("data".getBytes("ISO-8859-1")) &&
      length(payload) >= lit(44L) + wDataLen
    val wFrames = divExact(wDataLen, wBytesPerFrame)
    val nul = lit(null).cast(
      "struct<sample_rate:bigint,channels:bigint,n_samples:bigint," +
        "duration_micros:bigint>")
    when(isFlac && flacOk,
      struct(fRate.as("sample_rate"), fCh.as("channels"),
        fNs.as("n_samples"),
        divExact(fNs * 1000000L, fRate).as("duration_micros")))
      .when(isWav && wavOk,
        struct(wRate.as("sample_rate"), wCh.as("channels"),
          wFrames.as("n_samples"),
          divExact(wFrames * 1000000L, wRate).as("duration_micros")))
      .otherwise(nul)
  }

  /** `n_frames`/`duration_micros` are None when the HEADERS don't carry
    * them — fragmented/DASH mp4s stamp mvhd duration 0 (or the all-ones
    * unknown sentinel) while their tkhd dims are real, and an AVI may
    * omit the frame interval: reporting 0 micros would make the size
    * gate drop a common web format as 'too_short', against the
    * only-a-parsed-header-can-drop policy. Unknown is absent, not zero.
    */
  final case class VideoMeta(width: Long, height: Long,
      n_frames: Option[Long], duration_micros: Option[Long])

  /** Video stream parameters WITHOUT decode — the last cell of the
    * size-gate matrix ([[imageDims]] / [[audioDims]] siblings): at
    * 100 TB the video gate (resolution/duration) must read container
    * headers, not demux frames. Routes by [[detectKind]]:
    *
    *   - avi: the AVIMAINHEADER (`avih`) fields — width/height, frame
    *     count, and duration = µs-per-frame × total frames (headers
    *     only; [[decodeAvi]] is the frame path);
    *   - mp4/mov/isobmff: `moov`→`mvhd` (timescale + duration → exact
    *     integer micros; duration 0 and the all-ones sentinel read
    *     UNKNOWN — the fragmented/DASH convention) and the first
    *     `trak`→`tkhd` with NONZERO 16.16-fixed width/height (video
    *     tracks carry dims, audio tracks are 0×0 — the disambiguation
    *     rule, stated); `n_frames` is that trak's sample-table count
    *     (`stsz` sample_count, `stts` sum fallback) — exact, headers
    *     only;
    *   - webm/mkv (and bare ebml): the [[webmMeta]] EBML walk —
    *     Info's TimecodeScale×Duration and the first Video track's
    *     PixelWidth/PixelHeight; `n_frames` stays absent (Matroska
    *     headers carry no count, stated).
    *
    * Field-sanity guards (µs-per-frame/frames ≤ 10⁹, duration fits the
    * micros multiply) reject attacker-controlled overflow the same way
    * [[decodeAvi]] caps dims. None when the magic or headers don't
    * parse.
    */
  def videoDims(payload: Array[Byte]): Option[VideoMeta] =
    try {
      detectKind(payload) match {
        case "avi" => aviMeta(payload)
        case "mp4" | "mov" | "isobmff" => mp4Meta(payload)
        case "webm" | "mkv" | "ebml" => webmMeta(payload)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Headers-only AVI walk: find `avih` (recursing into LISTs, the
    * [[decodeAvi]] shape) and read the public AVIMAINHEADER fields.
    */
  private def aviMeta(payload: Array[Byte]): Option[VideoMeta] = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def str4(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (payload.length < 24 || str4(0) != "RIFF" || str4(8) != "AVI ")
      return None
    var found: Option[VideoMeta] = None
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var off = start
      var torn = false
      while (!torn && found.isEmpty && off + 8 <= end) {
        val id = str4(off)
        val sz = bb.getInt(off + 4)
        if (sz < 0 || off + 8 + sz > end) torn = true
        else {
          if (id == "LIST" && sz >= 4) {
            if (depth < 32) walk(off + 12, off + 8 + sz, depth + 1)
          } else if (id == "avih" && sz >= 40) {
            val us = bb.getInt(off + 8).toLong & 0xffffffffL
            val fr = bb.getInt(off + 8 + 16).toLong & 0xffffffffL
            val w = bb.getInt(off + 8 + 32).toLong & 0xffffffffL
            val h = bb.getInt(off + 8 + 36).toLong & 0xffffffffL
            if (w >= 1 && h >= 1 && us <= 1000000000L && fr <= 1000000000L)
              // a zero frame interval means the header omits it —
              // duration is UNKNOWN, not zero (the mvhd-0 rule)
              found = Some(VideoMeta(w, h, Some(fr),
                if (us >= 1 && fr >= 1) Some(us * fr) else None))
          }
          off += 8 + sz + (sz & 1)
        }
      }
    }
    walk(12, payload.length, 0)
    found
  }

  /** ISO-BMFF `moov` walk: mvhd timescale/duration (both FullBox
    * versions), the first trak with nonzero tkhd dims, and THAT trak's
    * sample-table frame count (`stbl` → `stsz` sample_count, falling to
    * the `stts` entry sum when stsz is absent) — exact `n_frames` from
    * headers only, closing the r14 `n_frames = 0` scope bound.
    */
  private def mp4Meta(payload: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int): Long = payload(i) & 0xffL
    def be32(i: Int): Long =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    // iterate the sibling boxes of one level; f(type, payloadStart,
    // boxEnd); a torn box ends the level (the walk's degrade contract)
    def boxes(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit = {
      var off = start
      while (off + 8 <= end) {
        val sz0 = be32(off.toInt)
        var hdr = 8L
        var sz = sz0
        if (sz0 == 1L) {
          if (off + 16 > end) return
          sz = be64(off.toInt + 8); hdr = 16L
        } else if (sz0 == 0L) sz = end - off
        if (sz < hdr || off + sz > end || sz > Int.MaxValue) return
        f(new String(payload, off.toInt + 4, 4, "ISO-8859-1"),
          off + hdr, off + sz)
        off += sz
      }
    }
    def into(start: Long, end: Long, name: String): Option[(Long, Long)] = {
      var out: Option[(Long, Long)] = None
      boxes(start, end)((t, p, e) => if (out.isEmpty && t == name) out = Some((p, e)))
      out
    }
    // stsz sample_count (u32 at payload+8, after version/flags +
    // sample_size) is the direct count; stts sums its (count, delta)
    // run-length entries — same number by spec, kept as the fallback
    def stblFrames(start: Long, end: Long): Option[Long] = {
      var stsz: Option[Long] = None
      var stts: Option[Long] = None
      boxes(start, end) { (t, p, e) =>
        if (t == "stsz" && e >= p + 12) stsz = Some(be32(p.toInt + 8))
        else if (t == "stts" && e >= p + 8) {
          val n = be32(p.toInt + 4)
          if (p + 8 + 8L * n <= e) {
            var s = 0L
            var i = 0L
            while (i < n) { s += be32((p + 8 + 8L * i).toInt); i += 1 }
            stts = Some(s)
          }
        }
      }
      stsz.orElse(stts)
    }
    var timescale = 0L
    var duration = -1L
    var w = 0L
    var h = 0L
    var frames: Option[Long] = None
    def trak(start: Long, end: Long): Unit = {
      var tw = 0L
      var th = 0L
      var cnt: Option[Long] = None
      boxes(start, end) { (t, p, e) =>
        if (t == "tkhd") {
          val v = u8(p.toInt)
          val (wo, ho) =
            if (v == 1L) (p.toInt + 88, p.toInt + 92) else (p.toInt + 76, p.toInt + 80)
          if (ho + 4 <= e) {
            val cw = be32(wo) >> 16 // 16.16 fixed point
            val ch = be32(ho) >> 16
            if (cw >= 1 && ch >= 1) { tw = cw; th = ch }
          }
        } else if (t == "mdia")
          for {
            (mp, me) <- into(p, e, "minf")
            (sp, se) <- into(mp, me, "stbl")
          } cnt = stblFrames(sp, se)
      }
      // first trak with dims wins — audio tracks are 0x0 by convention
      if (tw >= 1 && th >= 1 && (w < 1 || h < 1)) { w = tw; h = th; frames = cnt }
    }
    boxes(0L, payload.length.toLong) { (t, p, e) =>
      if (t == "moov") boxes(p, e) { (t2, p2, e2) =>
        if (t2 == "trak") trak(p2, e2)
        else if (t2 == "mvhd" && e2 >= p2 + 4) {
          val v = u8(p2.toInt)
          if (v == 0L && e2 >= p2 + 24) {
            timescale = be32(p2.toInt + 12); duration = be32(p2.toInt + 16)
          } else if (v == 1L && e2 >= p2 + 36) {
            timescale = be32(p2.toInt + 20); duration = be64(p2.toInt + 24)
          }
        }
      }
    }
    // mvhd duration 0 and the all-ones unknown sentinel (0xFFFFFFFF in
    // v0; v1's 64-bit sentinel reads negative) mean UNKNOWN — the
    // fragmented/DASH convention: real dims, duration declared later in
    // moof fragments. Report the dims with an absent duration so the
    // size gate's duration rules don't fire on a parsed-fine header.
    val durMicros =
      if (timescale >= 1 && duration > 0 && duration != 0xffffffffL &&
        duration <= Long.MaxValue / 1000000L)
        Some(duration * 1000000L / timescale)
      else None
    if (w >= 1 && h >= 1) Some(VideoMeta(w, h, frames, durMicros))
    else None
  }

  /** Headers-only WebM/Matroska walk — the EBML twin of [[mp4Meta]]:
    * Segment → Info (TimecodeScale + Duration) and Segment → Tracks →
    * TrackEntry → Video (PixelWidth/PixelHeight). EBML elements are
    * (vint id, vint size, payload); an unknown size (all value bits
    * set — how live-muxed Segments are stamped) extends to the parent's
    * end; torn elements end that level's walk; depth-capped like the
    * box walks. Duration is a FLOAT element (4 or 8 bytes) in timecode
    * units; `duration_micros = duration · timecodeScale(ns) / 1000`
    * (TimecodeScale defaults to 10⁶ ns per the spec). `n_frames` stays
    * None — Matroska headers carry no frame count (counting
    * SimpleBlocks is a demux, out of the headers-only contract, stated).
    */
  private def webmMeta(payload: Array[Byte]): Option[VideoMeta] = {
    val n = payload.length
    def u8(i: Int): Long = payload(i) & 0xffL
    // vint: leading-zero count of the first byte gives the width; ids
    // KEEP the marker bit (matching the spec's id notation), sizes
    // CLEAR it. Returns (value, nextOffset); None on torn/invalid.
    def vint(off: Int, keepMarker: Boolean): Option[(Long, Int)] = {
      if (off >= n || payload(off) == 0) return None
      val len = java.lang.Integer.numberOfLeadingZeros(u8(off).toInt) - 23
      if (len > 8 || off + len > n) return None
      var v = if (keepMarker) u8(off) else u8(off) & (0xffL >>> len)
      var i = 1
      while (i < len) { v = (v << 8) | u8(off + i); i += 1 }
      Some((v, off + len))
    }
    // unknown-size sentinel: all size bits set for the vint's width
    def unknownSize(off: Int): Boolean = {
      val len = java.lang.Integer.numberOfLeadingZeros(u8(off).toInt) - 23
      val all = (1L << (7 * len)) - 1
      vint(off, keepMarker = false).exists(_._1 == all)
    }
    def beUint(off: Int, len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | u8(off + i); i += 1 }
      v
    }
    def beFloat(off: Int, len: Int): Option[Double] = len match {
      case 4 => Some(java.lang.Float.intBitsToFloat(beUint(off, 4).toInt).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(beUint(off, 8)))
      case _ => None
    }
    var timecodeScale = 1000000L // spec default: 1 ms per timecode unit
    var durationUnits: Option[Double] = None
    var w = 0L
    var h = 0L
    // walk one level, descending by element id through the declared
    // path only (the mp4 moov/trak discipline)
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var off = start
      var torn = false
      while (!torn && off < end) {
        val parsed = for {
          (id, o1) <- vint(off, keepMarker = true)
          (sz, o2) <- vint(o1, keepMarker = false)
        } yield (id, sz, o1, o2)
        parsed match {
          case None => torn = true
          case Some((id, sz0, o1, o2)) =>
            val sz = if (unknownSize(o1)) (end - o2).toLong else sz0
            if (sz < 0 || o2 + sz > end) torn = true
            else {
              val p = o2
              val e = o2 + sz.toInt
              id match {
                // Segment / Info / Tracks / TrackEntry / Video
                case 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xAEL |
                    0xE0L if depth < 8 => walk(p, e, depth + 1)
                case 0x2AD7B1L if sz >= 1 && sz <= 8 => // TimecodeScale ns
                  val v = beUint(p, sz.toInt)
                  if (v >= 1) timecodeScale = v
                case 0x4489L => // Duration (float, timecode units)
                  durationUnits = beFloat(p, sz.toInt).filter(d =>
                    !d.isNaN && d > 0 && d <= 1e15)
                case 0xB0L if sz >= 1 && sz <= 8 && w < 1 => // PixelWidth
                  w = beUint(p, sz.toInt)
                case 0xBAL if sz >= 1 && sz <= 8 && h < 1 => // PixelHeight
                  h = beUint(p, sz.toInt)
                case _ =>
              }
              off = e
            }
        }
      }
    }
    // top level: the EBML header element (skipped whole), then Segment
    walk(0, n, 0)
    val durMicros = durationUnits.map { d =>
      // exact for header-realistic values: d·scale < 2^53 enforced by
      // the 1e15 cap above and the integer-nanosecond grid
      (d * timecodeScale / 1000.0).toLong
    }.filter(m => m >= 0 && m <= Long.MaxValue / 2)
    if (w >= 1 && h >= 1 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some(VideoMeta(w, h, None, durMicros))
    else None
  }

  /** The fixed-offset half of [[videoDims]] as a pure codegen column —
    * CANONICAL-layout AVI only (the `LIST hdrl` at offset 12 with
    * `avih` first, the layout every mainstream muxer writes; exotic
    * layouts read null here and the JVM walk handles them; ISO-BMFF's
    * moov can sit anywhere, so mp4 stays JVM-side — the JPEG-SOF
    * stance). Same field-sanity guards as the JVM walk, replayed by
    * the oracle. Returns struct(width, height, n_frames,
    * duration_micros); null otherwise.
    */
  def videoDimsCol(payload: Column): Column = {
    def leAt(i: Int, n: Int): Column =
      conv(concat(((i + n - 1) to i by -1).map(j =>
        hex(substring(payload, j + 1, 1))): _*), 16, 10).cast("long")
    val us = leAt(32, 4)
    val fr = leAt(48, 4)
    val w = leAt(64, 4)
    val h = leAt(68, 4)
    // direct per-format predicate — the imageDimsCol equivalence note
    val isAvi = substring(payload, 1, 4) ===
      lit("RIFF".getBytes("ISO-8859-1")) &&
      substring(payload, 9, 4) === lit("AVI ".getBytes("ISO-8859-1"))
    val ok = isAvi && length(payload) >= 88 &&
      substring(payload, 13, 4) === lit("LIST".getBytes("ISO-8859-1")) &&
      substring(payload, 25, 4) === lit("avih".getBytes("ISO-8859-1")) &&
      leAt(28, 4) >= 40L && w >= 1L && h >= 1L &&
      us <= 1000000000L && fr <= 1000000000L
    // the JVM walk's unknown-duration rule, mirrored: a zero frame
    // interval reads a NULL duration, never 0 micros
    when(ok, struct(w.as("width"), h.as("height"), fr.as("n_frames"),
      when(us >= 1L && fr >= 1L, us * fr).otherwise(lit(null).cast("long"))
        .as("duration_micros")))
      .otherwise(lit(null).cast(
        "struct<width:bigint,height:bigint,n_frames:bigint," +
          "duration_micros:bigint>"))
  }

  /** The scan-side media SIZE GATE the dims family exists for: drop
    * payloads whose HEADERS prove them out of range BEFORE any decode
    * is paid — at 100 TB the thumbnail/banner/hour-long-podcast cut
    * must cost a header read, not a codec. Since r15 the per-row work
    * is ONE native codegen expression
    * ([[org.apache.spark.sql.graftfn.MediaHeaderMeta]] — a static call
    * into the bounds-checked JVM header walks), so the gate rides the
    * parquet scan inside one WholeStageCodegen span for real: the
    * previous composition of detectKindCol + three hex-CASE parsers
    * generated a method past the JVM's 64 KB limit and the whole scan
    * silently fell back (see the expression's scaladoc). The JVM walks
    * also gate MORE formats than the fixed-offset columns could —
    * mp3/mp4/WebM durations, JPEG/ispe/exotic-TIFF dims now reject
    * oversized/overlong media at the scan too.
    *
    * Policy, stated: only a PARSED header can drop a row. Unknown kinds
    * and unparseable headers pass as `keep = true, reason = 'no_header'`
    * — the decode stage and [[decodeCoverage]] own that class (a gate
    * that dropped unknowns would silently erase every format the
    * header walks don't cover, the opposite of the no-silent-caps
    * rule). Images/videos gate on PIXELS (an axis claiming ≥ 2²⁰
    * is definitionally too large — keeps the product in range without
    * overflow); audio/video gate on DURATION. In-range parsed rows
    * read `reason = 'ok'`. Emits the input columns + (kind, keep,
    * reason).
    */
  def sizeGate(media: DataFrame,
      minPixels: Long = 1024L, maxPixels: Long = 1L << 24,
      minDurationMicros: Long = 100000L,
      maxDurationMicros: Long = 4L * 3600L * 1000000L): DataFrame = {
    require(minPixels >= 0 && maxPixels >= minPixels)
    require(minDurationMicros >= 0 && maxDurationMicros >= minDurationMicros)
    val p = col("payload")
    val axisCap = 1L << 20
    // ONE expression call per row, bound as a named projection (it is
    // referenced by kind + every rule) — the rule CASE then reads
    // named struct fields; the whole pipeline is a few hundred bytes
    // of generated code.
    val staged = media.withColumn("__m",
      org.apache.spark.sql.graftfn.MediaHeaderMeta.mediaHeaderMeta(p))
    val w = col("__m.w")
    val h = col("__m.h")
    val dur = col("__m.duration_micros")
    val reason =
      when(w.isNull && dur.isNull, lit("no_header"))
        .when(w.isNotNull && (w >= axisCap || h >= axisCap),
          lit("too_many_pixels"))
        .when(w.isNotNull && w * h > maxPixels, lit("too_many_pixels"))
        .when(w.isNotNull && w * h < minPixels, lit("too_few_pixels"))
        .when(dur.isNotNull && dur < minDurationMicros, lit("too_short"))
        .when(dur.isNotNull && dur > maxDurationMicros, lit("too_long"))
        .otherwise(lit("ok"))
    staged
      .withColumn("kind", col("__m.kind"))
      .withColumn("reason", reason)
      .withColumn("keep", col("reason").isin("ok", "no_header"))
      .drop("__m")
  }

  /** STUB decoder — deterministic fake "features" derived from payload
    * bytes, used for kinds with no in-JVM codec (compressed audio/video
    * codecs). A real implementation would decode the media and run a
    * feature extractor here; the signature (bytes → fixed-size Float
    * vector) is the contract. Images take the REAL decode path below
    * ([[decodeImage]]); WAV/PCM audio takes [[decodeWav]]; uncompressed
    * AVI video takes [[decodeAvi]].
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** REAL image decode — `javax.imageio` ships in the JDK (PNG, BMP, GIF,
    * JPEG readers), no external dependency. Emits pixel-stat features:
    *
    *   [width, height, mean R, mean G, mean B, mean luma, luma stddev,
    *    aspect ratio]   (channel values normalized to [0, 1])
    *
    * truncated/zero-padded to `dims`. Returns None on undecodable bytes —
    * the caller decides the fallback (extractFeatures falls back to the
    * stub so a corrupt payload degrades instead of killing the task, the
    * only sane behavior at 100 TB where some fraction of scraped images
    * is always truncated).
    *
    * Per-pixel getRGB is the portable-correctness baseline; a production
    * hot path would grab the raster buffer per format. The loop cost is
    * per-payload CPU inside mapPartitions — embarrassingly parallel, no
    * effect on plan shape or shuffle volume.
    */
  /** One image loader for every pixel consumer (features, aHash, pHash,
    * thumbnails): javax.imageio first (PNG/BMP/GIF/JPEG), then the
    * dependency-free [[Webp]] VP8L decode — so lossless WebP feeds the
    * SAME feature/hash paths as the in-JDK formats and a webp near-dup
    * hashes identically to its PNG twin. None on everything else.
    */
  private[llmops] def loadImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val viaJdk =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    viaJdk.orElse(Webp.decodeArgb(payload).map { im =>
      val out = new java.awt.image.BufferedImage(im.width, im.height,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      out.setRGB(0, 0, im.width, im.height, im.argb, 0, im.width)
      out
    })
  }

  def decodeImage(payload: Array[Byte], dims: Int = 8): Option[Array[Float]] = {
    val img = loadImage(payload)
    img.map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          val lum = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += lum; sl2 += lum * lum
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      val meanL = sl / n
      val varL = math.max(0.0, sl2 / n - meanL * meanL)
      val feats = Array(w.toFloat, h.toFloat,
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
        (meanL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
        w.toFloat / h)
      val out = new Array[Float](dims)
      feats.take(dims).copyToArray(out)
      out
    }
  }

  /** REAL audio decode — a dependency-free RIFF/WAVE PCM parse (the
    * [[decodeImage]] precedent: in-JDK only, corrupt or non-WAV bytes
    * return None and the caller degrades to the stub). Handles the
    * canonical uncompressed layouts: format code 1 (integer PCM) at 8 or
    * 16 bits per sample, any channel count/rate, chunks in any order.
    * Emits sample-stat features over all channels interleaved:
    *
    *   [n_channels, sample_rate, n_frames (per-channel samples),
    *    mean amplitude, RMS, min, max, duration seconds]
    *
    * amplitudes normalized to [-1, 1] (8-bit is unsigned midpoint-128,
    * 16-bit signed little-endian), truncated/zero-padded to `dims`.
    * Like the image path, the loop is per-payload CPU inside
    * mapPartitions — no effect on plan shape or shuffle volume.
    */
  /** The RIFF/WAVE chunk walk shared by [[decodeWav]], [[wavMonoSamples]]
    * and [[audioEnvelopeHash]]: locates fmt/data, admits integer PCM —
    * format code 1, or WAVE_FORMAT_EXTENSIBLE (0xFFFE, what every DAW
    * writes past 2 channels or 16 bits) whose SubFormat GUID's leading
    * code is PCM — at 8, 16 or 24 bits (r15: 24-bit studio exports
    * previously read None). Returns (channels, rate, bits, dataOffset,
    * dataLen); None on anything else — the degrade contract.
    */
  private def wavPcm(payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (payload.length < 44 || str4(0) != "RIFF" || str4(8) != "WAVE") None
      else {
        var off = 12
        var fmt: Option[(Int, Int, Int, Int)] = None // (code, ch, rate, bits)
        var data: Option[(Int, Int)] = None          // (offset, len)
        while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
          val id = str4(off)
          val sz = bb.getInt(off + 4)
          if (sz < 0 || off + 8 + sz > payload.length) return None
          if (id == "fmt " && sz >= 16) {
            var code = bb.getShort(off + 8) & 0xFFFF
            // extensible: the REAL code leads the SubFormat GUID
            if (code == 0xFFFE && sz >= 40)
              code = bb.getShort(off + 8 + 24) & 0xFFFF
            fmt = Some((code, bb.getShort(off + 10) & 0xFFFF,
              bb.getInt(off + 12), bb.getShort(off + 22) & 0xFFFF))
          } else if (id == "data") data = Some((off + 8, sz))
          off += 8 + sz + (sz & 1) // chunks are word-aligned
        }
        for {
          (code, ch, rate, bits) <- fmt
          (dOff, dLen) <- data
          if code == 1 && (bits == 8 || bits == 16 || bits == 24) &&
            ch >= 1 && rate > 0
        } yield (ch, rate, bits, dOff, dLen)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def decodeWav(payload: Array[Byte], dims: Int = 8): Option[Array[Float]] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      wavPcm(payload).map { case (ch, rate, bits, dOff, dLen) =>
        {
          val bytesPer = bits / 8
          val n = dLen / bytesPer
          var sum = 0.0; var sum2 = 0.0
          var mn = Double.MaxValue; var mx = Double.MinValue
          var i = 0
          while (i < n) {
            val v =
              if (bits == 8) ((payload(dOff + i) & 0xFF) - 128) / 128.0
              else if (bits == 24)
                (((payload(dOff + i * 3) & 0xFF) |
                  ((payload(dOff + i * 3 + 1) & 0xFF) << 8) |
                  (payload(dOff + i * 3 + 2) << 16)): Int) / 8388608.0
              else bb.getShort(dOff + i * 2) / 32768.0
            sum += v; sum2 += v * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val frames = n / ch
          val feats =
            if (n == 0) Array(ch.toFloat, rate.toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
            else Array(ch.toFloat, rate.toFloat, frames.toFloat,
              (sum / n).toFloat, math.sqrt(sum2 / n).toFloat,
              mn.toFloat, mx.toFloat, frames.toFloat / rate)
          val out = new Array[Float](dims)
          feats.take(dims).copyToArray(out)
          out
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL compressed-audio decode features — the [[decodeWav]] stat
    * contract ([n_channels, sample_rate, n_frames, mean amplitude, RMS,
    * min, max, duration seconds]) computed from [[Flac.decode]]'s PCM
    * (all channels pooled, amplitudes normalized by 2^(bits−1) — the
    * same grid a WAV twin normalizes on). None on undecodable bytes or
    * a frame-less stream — the degrade contract.
    */
  def decodeFlacFeatures(payload: Array[Byte], dims: Int = 8): Option[Array[Float]] =
    Flac.decode(payload).map { au =>
      val norm = (1L << (au.bits - 1)).toDouble
      var sum = 0.0; var sum2 = 0.0
      var mn = Double.MaxValue; var mx = Double.MinValue
      var n = 0L
      var c = 0
      while (c < au.channels) {
        val ch = au.samples(c)
        var i = 0
        while (i < ch.length) {
          val v = ch(i) / norm
          sum += v; sum2 += v * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          n += 1; i += 1
        }
        c += 1
      }
      val frames = au.samples(0).length
      val feats = Array(au.channels.toFloat, au.sampleRate.toFloat,
        frames.toFloat, (sum / n).toFloat, math.sqrt(sum2 / n).toFloat,
        mn.toFloat, mx.toFloat, frames.toFloat / au.sampleRate)
      val out = new Array[Float](dims)
      feats.take(dims).copyToArray(out)
      out
    }

  /** Channel-averaged PCM samples in [-1, 1] from a decodable FLAC —
    * the [[wavMonoSamples]] twin over the [[Flac.decode]] frame path
    * (r15: compressed audio becomes perceptually visible): per-frame
    * channel average, normalized by 2^(bits−1). A FLAC re-encode of a
    * WAV yields the IDENTICAL sample stream (lossless), so the envelope
    * signature matches bit-for-bit — the PNG≡BMP precedent for sound.
    */
  def flacMonoSamples(payload: Array[Byte]): Option[Array[Float]] =
    Flac.decode(payload).map { au =>
      val frames = au.samples(0).length
      val norm = (1L << (au.bits - 1)).toDouble
      val out = new Array[Float](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < au.channels) { acc += au.samples(c)(f) / norm; c += 1 }
        out(f) = (acc / au.channels).toFloat
        f += 1
      }
      out
    }

  /** The shared mono-PCM front door of [[audioEnvelopeHash]]: routes by
    * the BYTES (the routedFeatures trust-the-magic rule) to whichever
    * real decoder covers the format — WAV PCM, FLAC, or AIFF (r15).
    * None elsewhere (mp3/aac entropy decode is out of stated scope).
    */
  def monoSamples(payload: Array[Byte]): Option[Array[Float]] =
    detectKind(payload) match {
      case "wav" => wavMonoSamples(payload)
      case "flac" => flacMonoSamples(payload)
      case "aiff" => aiffMonoSamples(payload)
      case _ => None
    }

  /** Channel-averaged PCM samples in [-1, 1] from a decodable WAV — the
    * raw material of [[audioEnvelopeHash]]. Interleaved channels average
    * per frame (gain-preserving mono downmix); None on undecodable bytes.
    */
  def wavMonoSamples(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      wavPcm(payload).map { case (ch, _, bits, dOff, dLen) =>
        val n = dLen / (bits / 8)
        val frames = n / ch
        val out = new Array[Float](frames)
        var f = 0
        while (f < frames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val i = f * ch + c
            acc +=
              (if (bits == 8) ((payload(dOff + i) & 0xFF) - 128) / 128.0
               else if (bits == 24)
                 (((payload(dOff + i * 3) & 0xFF) |
                   ((payload(dOff + i * 3 + 1) & 0xFF) << 8) |
                   (payload(dOff + i * 3 + 2) << 16)): Int) / 8388608.0
               else bb.getShort(dOff + i * 2) / 32768.0)
            c += 1
          }
          out(f) = (acc / ch).toFloat
          f += 1
        }
        out
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit PERCEPTUAL audio signature — the [[imageAHash]] sibling for
    * sound, completing the re-encode-invariant near-dup matrix (text
    * minhash ✓, image aHash ✓, video frame-hashes ✓, audio was bytes
    * only): the decoded mono PCM stream splits into 64 equal-TIME
    * segments, each segment's mean-square energy is measured, and bit s
    * sets when segment s is louder than the average segment — the aHash
    * threshold trick on the loudness envelope.
    *
    * Why those invariances hold: a volume change multiplies every
    * segment energy AND their mean by the same factor (bits unmoved); a
    * resample keeps segment boundaries time-proportional (the envelope
    * SHAPE is what is hashed); an 8↔16-bit re-encode adds quantization
    * noise orders below envelope structure. A re-encoded copy of the
    * same recording therefore lands within a few Hamming bits while its
    * BYTES share nothing — the case [[cdcChunks]]/[[sampleFrames]] can
    * never pair. None on undecodable or sample-less audio; silence (a
    * flat envelope) hashes to 0. r15: routes through [[monoSamples]],
    * so a FLAC re-encode of a WAV hashes IDENTICALLY (lossless ⇒ the
    * same sample stream ⇒ the same envelope — spec-pinned parity law).
    */
  def audioEnvelopeHash(payload: Array[Byte]): Option[Long] =
    monoSamples(payload).filter(_.nonEmpty).map { s =>
      val n = s.length
      val e = new Array[Double](64)
      var seg = 0
      while (seg < 64) {
        val from = (seg.toLong * n / 64).toInt
        val to = ((seg + 1).toLong * n / 64).toInt
        var acc = 0.0
        var i = from
        while (i < to) { acc += s(i).toDouble * s(i); i += 1 }
        e(seg) = if (to > from) acc / (to - from) else 0.0
        seg += 1
      }
      val mean = e.sum / 64
      var h = 0L
      var b = 0
      while (b < 64) { if (e(b) > mean) h |= 1L << b; b += 1 }
      h
    }

  /** (media_id, ahash) for every DECODABLE audio payload — the
    * [[imageHashes]] twin (same column names, so the shared banding half
    * serves both). Per-payload CPU inside mapPartitions; no plan or
    * shuffle impact.
    */
  def audioHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind == "audio") audioEnvelopeHash(r.payload).map(h => (r.media_id, h))
          else None
        }
      }.toDF("media_id", "ahash")
  }

  /** Acoustic near-duplicate pairs by envelope-hash Hamming distance —
    * the re-encoded-recording detector, banded through the SAME
    * [[hashBandedPairs]] machinery as images (8 × 8-bit bands, pigeonhole
    * recall to Hamming 7, exact bit_count verify, hot-band guard). The
    * banding half is oracled over planted signatures
    * (q_x_multimodal_audio_pairs); the decode half is spec-pinned
    * (square-wave envelopes with hand-computed hashes, 8↔16-bit /
    * volume / resample invariance).
    */
  def audioHashPairs(media: DataFrame, maxHamming: Int = 6,
      maxBandFreq: Option[Int] = Dedup.DefaultMaxBandFreq): DataFrame =
    hashBandedPairs(audioHashes(media), maxHamming, maxBandFreq)

  /** A decoded uncompressed AVI: dimensions, the frame interval in
    * microseconds (0 when the header omits it), and the raw DIB frame
    * payloads in stream order.
    */
  final case class AviVideo(width: Int, height: Int, microSecPerFrame: Int,
      frames: Vector[Array[Byte]])

  /** REAL video decode — a dependency-free uncompressed-AVI (RIFF) frame
    * extractor, completing the modality story ([[decodeImage]] /
    * [[decodeWav]] precedents: in-JDK only, anything undecodable returns
    * None and the caller degrades to the stub). Walks the RIFF chunk
    * tree exactly like the WAV walk, recursing into LIST chunks: `avih`
    * supplies width/height/frame-interval, and every `##db`/`##dc`
    * stream chunk (uncompressed DIB / raw frame data) inside `LIST movi`
    * becomes a frame. Compressed codecs parse as frames of undecodable
    * bytes — [[videoFrameHashes]] then skips them (its per-frame DIB
    * check), features fall back to the stub; a torn chunk ends the walk
    * with whatever parsed before it.
    */
  def decodeAvi(payload: Array[Byte]): Option[AviVideo] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (payload.length < 24 || str4(0) != "RIFF" || str4(8) != "AVI ") None
      else {
        var header: Option[(Int, Int, Int)] = None // (w, h, usPerFrame)
        val frames = Vector.newBuilder[Array[Byte]]
        // depth-capped: a crafted payload of nothing but nested 12-byte
        // LISTs must degrade (deeper nests skipped), never overflow the
        // stack — real AVIs nest 2-3 levels; StackOverflowError is not
        // NonFatal, so the recursion itself has to be bounded.
        def walk(start: Int, end: Int, depth: Int): Unit = {
          var off = start
          var torn = false
          while (!torn && off + 8 <= end) {
            val id = str4(off)
            val sz = bb.getInt(off + 4)
            if (sz < 0 || off + 8 + sz > end) torn = true
            else {
              if (id == "LIST" && sz >= 4) {
                if (depth < 32) walk(off + 12, off + 8 + sz, depth + 1)
              }
              else if (id == "avih" && sz >= 40)
                header = Some((bb.getInt(off + 8 + 32), bb.getInt(off + 8 + 36),
                  bb.getInt(off + 8)))
              else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
                  (id.substring(2) == "db" || id.substring(2) == "dc"))
                frames += java.util.Arrays.copyOfRange(payload, off + 8, off + 8 + sz)
              off += 8 + sz + (sz & 1) // chunks are word-aligned
            }
          }
        }
        walk(12, payload.length, 0)
        // dims bounded: header ints are attacker-controlled — cap each
        // axis and total pixels (16M ≈ one 64 MB int buffer) so the
        // downstream frame allocation can't Int-overflow or OOM a task.
        header.collect { case (w, h, us) if w >= 1 && h >= 1 &&
            w <= 16384 && h <= 16384 && w.toLong * h <= (1L << 24) =>
          AviVideo(w, h, math.max(us, 0), frames.result())
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One AVI frame as a BufferedImage: a 24-bit bottom-up DIB (BGR byte
    * triples, rows padded to 4 bytes, last row first — the uncompressed
    * layout) when the byte count matches the dimensions, otherwise an
    * MJPEG attempt — Motion-JPEG frames are plain JPEG images, which
    * `javax.imageio` decodes in-JDK, so MJPEG AVIs (the most common
    * "compressed" AVI in the wild) decode for real too. None when
    * neither parses (a genuinely compressed codec, a torn chunk).
    */
  private def aviFrameImage(w: Int, h: Int,
      data: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    // size math in Long + [[decodeAvi]]'s dim caps: no Int overflow can
    // route a garbage-header frame into the DIB allocation below.
    val dimsSane = w >= 1 && h >= 1 && w <= 16384 && h <= 16384 &&
      w.toLong * h <= (1L << 24)
    val rowSize = if (dimsSane) ((w * 3 + 3) / 4) * 4 else 0
    if (!dimsSane || data.length.toLong < rowSize.toLong * h) {
      // not a full DIB: JFIF/JPEG frames start 0xFF 0xD8.
      if (data.length >= 2 && (data(0) & 0xFF) == 0xFF && (data(1) & 0xFF) == 0xD8)
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data)))
        catch { case scala.util.control.NonFatal(_) => None }
      else None
    } else try {
      // same degrade-instead-of-kill guard as the MJPEG branch
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val b = data(row + x * 3) & 0xFF
          val g = data(row + x * 3 + 1) & 0xFF
          val r = data(row + x * 3 + 2) & 0xFF
          im.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      Some(im)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Video feature vector from a decoded AVI — the [[decodeImage]] /
    * [[decodeWav]] stat shape:
    *
    *   [width, height, n_frames, fps, mean luma, luma stddev,
    *    aspect ratio, duration seconds]
    *
    * luma stats pool over every decodable frame's pixels (normalized to
    * [0, 1]); fps/duration are 0 when the header omits the frame
    * interval. None when the payload isn't an AVI or no frame decodes.
    */
  def decodeAviFeatures(payload: Array[Byte], dims: Int = 8): Option[Array[Float]] =
    decodeAvi(payload).flatMap { v =>
      val imgs = v.frames.flatMap(aviFrameImage(v.width, v.height, _))
      if (imgs.isEmpty) None
      else {
        var sl = 0.0; var sl2 = 0.0; var n = 0L
        imgs.foreach { im =>
          var y = 0
          while (y < im.getHeight) {
            var x = 0
            while (x < im.getWidth) {
              val rgb = im.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)
              sl += lum; sl2 += lum * lum; n += 1
              x += 1
            }
            y += 1
          }
        }
        val meanL = sl / n
        val varL = math.max(0.0, sl2 / n - meanL * meanL)
        val fps = if (v.microSecPerFrame > 0) 1e6 / v.microSecPerFrame else 0.0
        val feats = Array(v.width.toFloat, v.height.toFloat, imgs.size.toFloat,
          fps.toFloat, (meanL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
          v.width.toFloat / v.height,
          (if (fps > 0) imgs.size / fps else 0.0).toFloat)
        val out = new Array[Float](dims)
        feats.take(dims).copyToArray(out)
        Some(out)
      }
    }

  /** Per-frame perceptual hashes of `kind = "video"` rows:
    * (media_id, frame_no, ahash) for every decodable DIB frame — the
    * SAME 8×8 grid hash as still images, so a video frame and a still of
    * the same picture pair up, and the rows feed [[hashBandedPairs]] on
    * (media_id·2^20 + frame_no or any composed id) exactly like
    * [[imageHashes]] output does. Undecodable payloads and
    * compressed/torn frames drop — the degrade contract. mapPartitions
    * codec boundary: per-payload CPU, no plan or shuffle impact.
    */
  def videoFrameHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind != "video") Iterator.empty
          else decodeAvi(r.payload).iterator.flatMap { v =>
            v.frames.iterator.zipWithIndex.flatMap { case (f, i) =>
              aviFrameImage(v.width, v.height, f)
                .map(im => (r.media_id, i.toLong, aHashOfImage(im)))
            }
          }
        }
      }.toDF("media_id", "frame_no", "ahash")
  }

  /** Deterministic frame sampling over the raw payload: frames of
    * `frameLen` bytes starting every `stride` bytes (stride < frameLen ⇒
    * overlap), the video/audio analog of token-window chunking. All
    * codegen'd built-ins — binary `substring` slices, no decode, no
    * shuffle — so the sampler runs at scan speed and ships each frame to
    * the (stubbed) codec as its own row. Same tail arithmetic as
    * `Corpus.tokenChunks`: a frame starts at every stride multiple below
    * `byte_len`; the final frames may be short.
    */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    require(frameLen >= 1 && stride >= 1)
    val n = length(col("payload")).cast("long")
    media
      .select(col("media_id"), col("payload"), n.as("_n"),
        explode(when(n >= 1,
          sequence(lit(0L), floor((n - 1) / stride))).otherwise(array()))
          .as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        call_function("substring", col("payload"),
          (col("frame_no") * stride + 1).cast("int"), lit(frameLen)).as("frame"))
      .select(col("media_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(hex(col("frame"))).as("frame_md5"))
  }

  /** Content-defined chunking (CDC): cut each payload at positions where
    * the `window`-byte window ENDING there has
    * `hash52(hex(window)) % 2^maskBits == 0` — the dedup-storage move
    * ([[sampleFrames]]' fixed-stride frames all SHIFT after one inserted
    * byte; content-defined boundaries re-align, so identical regions in
    * two payloads yield identical interior chunks at ANY offset). Mean
    * chunk size ≈ 2^maskBits bytes; the payload end is always a
    * boundary, so every byte lands in exactly one chunk. Emits
    * (media_id, chunk_no, start_byte (1-based), chunk_bytes, chunk_md5);
    * downstream block-level dedup is a groupBy on chunk_md5.
    *
    * Deliberately the PURE content-defined form: the min/max chunk-size
    * clamp of FastCDC-style chunkers suppresses boundaries relative to
    * the PREVIOUS boundary — a sequential scan, not a per-position
    * predicate — so it doesn't parallelize as a dataflow; tune
    * `maskBits` instead. Cost honesty: one row per payload byte, each
    * hashing a `window`-byte hex slice (O(n·w) md5 work) — exactly what
    * makes every boundary decision replayable by the SQL oracle; a
    * production hot path would swap in a gear-hash rolling expression
    * (same boundaries contract, one multiply-add per byte).
    */
  def cdcChunks(media: DataFrame, window: Int = 8,
      maskBits: Int = 6): DataFrame = {
    require(window >= 1 && maskBits >= 0 && maskBits < 52)
    val n = length(col("payload")).cast("long")
    val base = media.select(col("media_id"), col("payload"), n.as("_n"))
      .filter(col("_n") >= 1)
    val pos = base.select(col("media_id"), col("payload"), col("_n"),
      explode(when(col("_n") >= window,
        sequence(lit(window.toLong), col("_n"))).otherwise(array())).as("p"))
    val hits = pos.filter(
      pmod(PortableHash.hash52(hex(call_function("substring", col("payload"),
        (col("p") - window + 1).cast("int"), lit(window)))),
        lit(1L << maskBits)) === 0)
      .select(col("media_id"), col("p"))
    val ends = hits
      .unionByName(base.select(col("media_id"), col("_n").as("p")))
      .distinct()
    chunksFromEnds(base, ends)
  }

  /** Shared chunk assembly of the CDC family: boundary END positions →
    * (chunk_no, start, bytes, md5) via one per-payload lag window.
    */
  private def chunksFromEnds(base: DataFrame, ends: DataFrame): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("p")
    ends
      .withColumn("s0", coalesce(lag(col("p"), 1).over(w), lit(0L)))
      .withColumn("chunk_no", (row_number().over(w) - 1).cast("long"))
      .join(base.select(col("media_id"), col("payload")), Seq("media_id"))
      .select(col("media_id"), col("chunk_no"),
        (col("s0") + 1).as("start_byte"),
        (col("p") - col("s0")).as("chunk_bytes"),
        md5(hex(call_function("substring", col("payload"),
          (col("s0") + 1).cast("int"), (col("p") - col("s0")).cast("int"))))
          .as("chunk_md5"))
  }

  /** [[cdcChunks]] on the O(n) rolling gear hash — the production CDC
    * path: boundary positions come from ONE codegen'd pass per payload
    * ([[org.apache.spark.sql.graftfn.GearBoundaries]] — an add-shift per
    * byte) instead of an md5 of every window (O(n·w)). Different hash ⇒
    * different (equally content-defined) boundaries than [[cdcChunks]];
    * same insertion-robustness property, same output shape, same
    * downstream `chunk_md5` groupBy. Mean chunk ≈ 2^maskBits bytes;
    * still fully SQL-oracle-replayable (the gear recurrence telescopes
    * to an m-term windowed sum — see the expression's scaladoc).
    */
  def cdcChunksGear(media: DataFrame, maskBits: Int = 6): DataFrame = {
    import org.apache.spark.sql.graftfn.GearBoundaries.gearBoundaries
    require(maskBits >= 1 && maskBits <= 52)
    val n = length(col("payload")).cast("long")
    val base = media.select(col("media_id"), col("payload"), n.as("_n"))
      .filter(col("_n") >= 1)
    val ends = base.select(col("media_id"),
      explode(array_union(gearBoundaries(col("payload"), maskBits),
        array(col("_n")))).as("p"))
    chunksFromEnds(base, ends)
  }

  /** The block-dedup KPI over a [[cdcChunks]]/[[cdcChunksGear]] table:
    * how much storage does chunk-level dedup save. One aggregation pass:
    * total vs distinct chunk counts and bytes (a duplicated chunk's bytes
    * count once — min length per md5 is exact because equal md5 ⇒ equal
    * bytes at this granularity), plus the saving in integer basis points
    * (`DIV` — engine-portable, no float).
    */
  def cdcDedupStats(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_md5")
      .agg(count(lit(1)).as("__n"), min("chunk_bytes").as("__b"))
      .agg(sum("__n").as("n_chunks"),
        count(lit(1)).as("n_unique_chunks"),
        sum(col("__n") * col("__b")).as("total_bytes"),
        sum("__b").as("unique_bytes"))
      .withColumn("saved_bps",
        expr("(total_bytes - unique_bytes) * 10000 DIV total_bytes"))

  /** Binary near-dup pairs: two payloads are near-duplicates when their
    * sampled-frame fingerprint SETS overlap — n-gram Jaccard transplanted
    * to the byte domain (the re-encoded/re-muxed copy detector: container
    * metadata changes, the sampled content frames largely do not). Exact
    * Jaccard over distinct `frame_md5` sets at the given sampling;
    * returns (id_a < id_b, jaccard ≥ threshold).
    *
    * Scale: candidate generation is the inverted equi-join on the
    * fingerprint (only payloads SHARING a frame ever pair — never
    * all-pairs), per-payload fingerprint counts are bounded by
    * payload_bytes / stride, and `maxDf` (DEFAULT ON) is the skew
    * defense: a fingerprint shared by d payloads emits d²/2 candidate
    * rows, so one ubiquitous frame — a black video lead-in shared by the
    * whole corpus — is quadratic without a cap. Fingerprints above the
    * cap are excluded from CANDIDATE GENERATION only (the
    * [[Retrieval.invertedIndex]] stop-term move); the Jaccard itself
    * stays EXACT over the full fingerprint sets — shared above-cap
    * frames are counted back per candidate pair through the bounded
    * hot-postings join, and the denominators always use full set sizes.
    * The only semantic loss: a pair sharing NOTHING below the cap is
    * never considered — at a df cap of 100k, exactly the pairs whose
    * entire overlap is corpus-wide boilerplate, which near-dup detection
    * wants to ignore anyway (same argument as
    * [[Dedup.pruneFrequentBandKeys]]).
    */
  def frameJaccardPairs(media: DataFrame, frameLen: Int = 16,
      stride: Int = 12, threshold: Double = 0.8,
      maxDf: Long = 100000L): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    require(maxDf >= 1)
    val fr = sampleFrames(media, frameLen, stride)
      .select(col("media_id").as("doc"), col("frame_md5").as("s"))
      .distinct().cache()
    val sizes = fr.groupBy("doc").agg(count(lit(1)).as("n"))
    val hot = fr.groupBy("s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("s").cache()
    val cool = fr.join(hot, Seq("s"), "left_anti")
    // candidates + their below-cap overlap in one pass: the self-join is
    // bounded by maxDf²/2 rows per fingerprint.
    val sharedCool = cool.alias("x")
      .join(cool.alias("y"), col("x.s") === col("y.s") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_cool"))
    // exact correction: above-cap frames shared by each CANDIDATE pair —
    // bounded by |candidates| × hot-frames-per-doc, never d² over the
    // hot fingerprint's full posting list.
    val hotFr = fr.join(hot, Seq("s"), "left_semi")
    val sharedHot = sharedCool.select("id_a", "id_b")
      .join(hotFr.select(col("doc").as("id_a"), col("s")), Seq("id_a"))
      .join(hotFr.select(col("doc").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_hot"))
    val shared = sharedCool
      .join(sharedHot, Seq("id_a", "id_b"), "left")
      .withColumn("shared", col("shared_cool") + coalesce(col("shared_hot"), lit(0L)))
    val out = shared
      .join(sizes.select(col("doc").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint(true)
    fr.unpersist(); hot.unpersist()
    out
  }

  final case class MediaThumb(media_id: Long, kind: String,
      thumb: Array[Byte], thumb_w: Int, thumb_h: Int)

  /** Deterministic fit-inside resize of a decodable image payload:
    * nearest-neighbor scaling (no AA, no interpolation — bit-stable
    * across runs) to at most `maxDim` on the longer edge, re-encoded as
    * PNG. None on undecodable bytes.
    */
  def resizeImage(payload: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    require(maxDim >= 1)
    val img = loadImage(payload)
    img.map { im =>
      val scale = maxDim.toDouble / math.max(im.getWidth, im.getHeight)
      val tw = math.max(1, math.round(im.getWidth * scale).toInt)
      val th = math.max(1, math.round(im.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(tw, th,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(im, 0, 0, tw, th, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (bos.toByteArray, tw, th)
    }
  }

  /** Thumbnail generation over the media table — the resize stage of an
    * image-pipeline (dedupe thumbs, embed thumbs, ship thumbs to
    * labelers). Same mapPartitions shape as [[extractFeatures]]: payload
    * bytes stay inside the partition, no wide shuffle. Non-image kinds
    * and undecodable payloads emit an empty thumb with 0×0 dims — the
    * caller filters or routes them, nothing throws at 100 TB.
    */
  def thumbnails(media: DataFrame, maxDim: Int = 64): Dataset[MediaThumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val t =
            if (r.kind == "image") resizeImage(r.payload, maxDim) else None
          t match {
            case Some((bytes, w, h)) => MediaThumb(r.media_id, r.kind, bytes, w, h)
            case None => MediaThumb(r.media_id, r.kind, Array.emptyByteArray, 0, 0)
          }
        }
      }
  }

  /** Perceptual average-hash (aHash) of a decodable image payload: the
    * 64-bit signature that survives RE-ENCODING — the frame-fingerprint
    * near-dup path ([[frameJaccardPairs]]) catches byte-identical copies,
    * but a JPEG re-save of the same picture shares zero byte frames;
    * pixels, not bytes, are the invariant. Bit b = i·8+j is set when the
    * mean luma of grid cell (i, j) of the 8×8 block partition EXCEEDS the
    * mean of the 64 cell means (strict — ties to 0).
    *
    * Every quantity is an exact integer, so the hash is bit-stable across
    * runs and machines: per-pixel luma = 299·r + 587·g + 114·b (scaled by
    * 1000, never divided), cell mean = truncating integer division, grid
    * boundaries by integer floor with a ≥ 1-pixel guarantee (images
    * smaller than 8×8 still hash). None on undecodable bytes — the
    * [[decodeImage]] degrade contract.
    */
  def imageAHash(payload: Array[Byte]): Option[Long] = {
    val img = loadImage(payload)
    img.map(aHashOfImage)
  }

  /** The 8×8 grid aHash over an already-decoded image — shared by
    * [[imageAHash]] (encoded payloads) and [[videoFrameHashes]] (decoded
    * AVI frames), so a video frame and a still of the same picture hash
    * identically.
    */
  private def aHashOfImage(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    val cellMeans = new Array[Long](64)
    var i = 0
    while (i < 8) {
      val y0 = (i.toLong * h / 8).toInt
      val y1 = math.max(((i + 1).toLong * h / 8).toInt, y0 + 1).min(h).max(y0 + 1)
      var j = 0
      while (j < 8) {
        val x0 = (j.toLong * w / 8).toInt
        val x1 = math.max(((j + 1).toLong * w / 8).toInt, x0 + 1).min(w).max(x0 + 1)
        var s = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = im.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        cellMeans(i * 8 + j) = if (n == 0) 0L else s / n
        j += 1
      }
      i += 1
    }
    val avg = cellMeans.sum / 64
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (cellMeans(b) > avg) hash |= (1L << b)
      b += 1
    }
    hash
  }

  /** Fixed-point DCT basis for [[imagePHash]]: `C(u)(x) =
    * round(cos((2x+1)·u·π/64) · 2¹⁴)` — StrictMath.cos is specified
    * bit-identical on every JVM (Math.cos is allowed 1-ulp platform
    * variance), so the table, and therefore every pHash, is
    * deterministic across heterogeneous executors.
    */
  private lazy val PHashCos: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      Math.round(StrictMath.cos((2 * x + 1) * u * Math.PI / 64.0) * 16384.0))

  /** Perceptual DCT hash (pHash) of a decodable image payload — the
    * robustness upgrade over [[imageAHash]]: aHash thresholds raw cell
    * means, so contrast stretching, gamma, or sharpening flips its bits;
    * pHash thresholds the 8×8 LOW-FREQUENCY DCT coefficients of the
    * 32×32 block-mean luma against their median, which survives exactly
    * those edits (a linear pixel remap `a·p + b` scales every non-DC
    * coefficient AND their mean by `a > 0` — the comparisons are
    * invariant by algebra, and the spec pins it). All arithmetic is
    * integer fixed-point (luma ≤ 255 000, |C| ≤ 2¹⁴, two 32-term
    * separable passes → |F| ≤ 7·10¹⁶): same hash on any executor.
    * Bit layout: 63 AC coefficients (u,v) ≠ (0,0) at positions 1..63 set
    * when F exceeds the AC MEAN — compared as `F·63 > Σ` (|F|·63 <
    * 2⁶², no overflow), so the threshold needs no division and carries
    * no truncation-direction edge; bit 0 (DC) always clear. The
    * mean-threshold variant, not the median: on low-entropy inputs
    * (gradients, vignettes) the AC energy is ONE-SIDED — a handful of
    * large signed coefficients against dozens of exact zeros — and the
    * median collapses onto the zero plateau, hashing every such image
    * to 0; the mean keeps the sign structure (measured on synthetic
    * gradients: median-threshold hashed horizontal ≡ vertical ≡ 0,
    * mean-threshold separates them at Hamming 14).
    */
  def imagePHash(payload: Array[Byte]): Option[Long] = {
    val img = loadImage(payload)
    img.map(pHashOfImage)
  }

  private def pHashOfImage(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    // 32×32 block-mean integer luma — the aHash grid at 4× resolution
    val luma = Array.ofDim[Long](32, 32) // (row y)(col x)
    var i = 0
    while (i < 32) {
      val y0 = (i.toLong * h / 32).toInt
      val y1 = math.max(((i + 1).toLong * h / 32).toInt, y0 + 1).min(h).max(y0 + 1)
      var j = 0
      while (j < 32) {
        val x0 = (j.toLong * w / 32).toInt
        val x1 = math.max(((j + 1).toLong * w / 32).toInt, x0 + 1).min(w).max(x0 + 1)
        var s = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = im.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        luma(i)(j) = if (n == 0) 0L else s / n
        j += 1
      }
      i += 1
    }
    // separable fixed-point DCT: rows then columns, 8 frequencies each
    val t = Array.ofDim[Long](8, 32) // t(u)(y) = Σ_x C(u)(x)·luma(y)(x)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var acc = 0L
        var x = 0
        while (x < 32) { acc += PHashCos(u)(x) * luma(y)(x); x += 1 }
        t(u)(y) = acc
        y += 1
      }
      u += 1
    }
    val coeffs = new Array[Long](64) // F(u*8+v) = Σ_y C(v)(y)·t(u)(y)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var y = 0
        while (y < 32) { acc += PHashCos(v)(y) * t(u)(y); y += 1 }
        coeffs(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    var acSum = 0L
    var k = 1
    while (k < 64) { acSum += coeffs(k); k += 1 }
    var hash = 0L
    var b = 1
    while (b < 64) {
      if (coeffs(b) * 63L > acSum) hash |= (1L << b)
      b += 1
    }
    hash
  }

  /** (media_id, ahash) with the pHash signature — the [[imageHashes]]
    * twin at DCT robustness; same column names, so [[hashBandedPairs]]
    * serves it unchanged.
    */
  def imagePHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind == "image") imagePHash(r.payload).map(h => (r.media_id, h))
          else None
        }
      }.toDF("media_id", "ahash")
  }

  /** Visual near-duplicate pairs by pHash Hamming distance — catches the
    * contrast/gamma-edited copies [[imageHashPairs]] misses, banded
    * through the same 8 × 8-bit machinery (pigeonhole recall to Hamming
    * 7, hot-band guard).
    */
  def imagePHashPairs(media: DataFrame, maxHamming: Int = 6,
      maxBandFreq: Option[Int] = Dedup.DefaultMaxBandFreq): DataFrame =
    hashBandedPairs(imagePHashes(media), maxHamming, maxBandFreq)

  /** (media_id, ahash) for every DECODABLE image payload — undecodable or
    * non-image rows drop here (route them via [[extractFeatures]]'s stub
    * path if they need accounting). Same mapPartitions codec boundary as
    * the other image stages: per-payload CPU, no plan/shuffle impact.
    */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind == "image") imageAHash(r.payload).map(h => (r.media_id, h))
          else None
        }
      }.toDF("media_id", "ahash")
  }

  /** Visual near-duplicate pairs by aHash Hamming distance — the
    * re-encoded-copy detector, banded exactly like
    * [[Dedup.simHashPairs]]: the 64-bit hash splits into 8 × 8-bit
    * bands, candidates collide in ≥ 1 band (pigeonhole: every pair with
    * Hamming ≤ 7 is GUARANTEED a collision — size maxHamming within
    * that), exact `bit_count(xor)` decides. Never all-pairs; the same
    * `maxBandFreq` guard as the text twin bounds a pathological band
    * bucket (all-black thumbnails share one hash).
    */
  def imageHashPairs(media: DataFrame, maxHamming: Int = 6,
      maxBandFreq: Option[Int] = Dedup.DefaultMaxBandFreq): DataFrame =
    hashBandedPairs(imageHashes(media), maxHamming, maxBandFreq)

  /** The banding + exact-Hamming-verify half of [[imageHashPairs]],
    * exposed over an ALREADY-COMPUTED 64-bit signature table
    * (`idCol`, `hashCol`) — the decode half is JVM-only, but this half is
    * pure integer arithmetic, so planting known signatures makes the
    * band → collide → verify chain value-exact in SQL
    * (q_x_multimodal_ahash_pairs) and lets specs drive the skew guard
    * with synthetic hot buckets.
    */
  def hashBandedPairs(sigs: DataFrame, maxHamming: Int = 6,
      maxBandFreq: Option[Int] = Dedup.DefaultMaxBandFreq,
      idCol: String = "media_id", hashCol: String = "ahash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "banding guarantees recall only to Hamming 7 (8 bands x 8 bits)")
    val bandBits = 8
    val allBanded = sigs.select(col(idCol).as("doc"), col(hashCol).as("ahash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col(hashCol), b * bandBits)
            .bitwiseAND((1L << bandBits) - 1).as("bkey"))): _*))
        .as("bb"))
      .select(col("doc"), col("ahash"), col("bb.band"), col("bb.bkey"))
    val banded = maxBandFreq.fold(allBanded)(
      Dedup.pruneFrequentBandKeys(allBanded, Seq("band", "bkey"), _))
    banded.alias("x")
      .join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Partition-wise feature extraction over the typed Dataset — the shape a
    * real codec needs: per-partition init, iterator-in/iterator-out.
    * `kind = "image"` takes the real javax.imageio decode, `kind =
    * "audio"` the real WAV/PCM parse, `kind = "video"` the real
    * uncompressed-AVI walk (all with stub fallback on undecodable
    * bytes — a corrupt payload degrades instead of killing the task);
    * other kinds take the stub.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // real codecs initialize their native context HERE, once.
        rows.map { r =>
          val feats = (r.kind match {
            case "image" => decodeImage(r.payload, dims)
            case "audio" => decodeWav(r.payload, dims)
            case "video" => decodeAviFeatures(r.payload, dims)
            case _ => None
          }).getOrElse(decodeStub(r.payload, dims))
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, feats)
        }
      }
  }

  final case class MediaDecoded(media_id: Long, kind: String, byte_len: Long,
      features: Array[Float], decoded: Boolean)

  /** [[extractFeatures]] with the magic-byte front door: every payload
    * routes by [[detectKind]] of its BYTES — a mislabeled or absent
    * caller kind can't send a JPEG to the WAV parser or silently stub a
    * decodable image. `decoded` records whether a REAL decoder produced
    * the features (vs the stub fallback) — the per-row observability
    * that [[decodeCoverage]] aggregates into the data-card gauge.
    */
  /** The REAL-decoder dispatch by detected kind — the one routing table
    * [[routedFeatures]], [[decodeCoverage]] and [[mediaDataCard]]
    * share; None = no in-JVM codec for this kind (the caller stubs,
    * observably).
    */
  private def decodeReal(kind: String, payload: Array[Byte],
      dims: Int): Option[Array[Float]] = kind match {
    case "png" | "jpeg" | "gif" | "bmp" => decodeImage(payload, dims)
    case "webp" => decodeWebpFeatures(payload, dims)
    case "wav" => decodeWav(payload, dims)
    case "flac" => decodeFlacFeatures(payload, dims)
    case "aiff" => decodeAiffFeatures(payload, dims)
    case "avi" => decodeAviFeatures(payload, dims)
    case _ => None
  }

  def routedFeatures(media: DataFrame, dims: Int = 8): Dataset[MediaDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), lit("").as("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = detectKind(r.payload)
          val real = decodeReal(kind, r.payload, dims)
          MediaDecoded(r.media_id, kind, r.payload.length.toLong,
            real.getOrElse(decodeStub(r.payload, dims)), real.isDefined)
        }
      }
  }

  /** The MEDIA data card — the [[Corpus.dataCard]] sibling a multimodal
    * release ships, closing the loop the MediaMixBench evidence opened:
    * per (source, detected kind): payload count and bytes, real-decode
    * vs stub split (`stub_ppm`), and `pair_recall_projection_bps` — the
    * projected visual/acoustic near-dup pair recall under the
    * MediaMixBench-MEASURED law (r14: planted-pair recall loss equals
    * exactly the undecodable-twin share — a pair is findable iff its
    * encoded side decodes, so the projection is the decodable share,
    * in basis points). A crawl mix drifting toward AVIF/lossy-WebP
    * shows up as a falling projection in the card — the continuously-
    * justified stance the one-off bench table couldn't give.
    *
    * Scale: one mapPartitions decode pass (the codec boundary), one
    * (sources × kinds)-bounded aggregation. Integer arithmetic
    * throughout — the card is value-exact under the oracle.
    */
  def mediaDataCard(media: DataFrame, sourceCol: String,
      dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(sourceCol).cast("string").as("source"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (src, p) =>
          val kind = detectKind(p)
          (src, kind, p.length.toLong,
            decodeReal(kind, p, dims).isDefined)
        }
      }
      .toDF("source", "kind", "byte_len", "decoded")
      .groupBy("source", "kind")
      .agg(count(lit(1)).as("n"), sum("byte_len").as("n_bytes"),
        sum(col("decoded").cast("long")).as("n_decoded"))
      .withColumn("n_stubbed", col("n") - col("n_decoded"))
      .withColumn("stub_ppm", expr("(n_stubbed * 1000000L) div n"))
      .withColumn("pair_recall_projection_bps",
        expr("(n_decoded * 10000L) div n"))
  }

  /** The stubbed-format mix gauge (a data-card column): per DETECTED
    * kind, how many payloads produced real features vs degraded to the
    * stub — `stub_ppm` on the integer micro grid. This is what makes a
    * silently under-covered corpus observable: a crawl that is 60%
    * WebP-lossy shows `webp | stub_ppm ~ 600000`, not a quietly thin
    * visual-dedup result. Kinds-bounded output; one aggregation.
    */
  def decodeCoverage(media: DataFrame, dims: Int = 8): DataFrame =
    routedFeatures(media, dims).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(col("decoded").cast("long")).as("n_decoded"))
      .withColumn("n_stubbed", col("n") - col("n_decoded"))
      .withColumn("stub_ppm", expr("(n_stubbed * 1000000L) div n"))

  /** WebP feature decode: VP8L (lossless) payloads decode FOR REAL via
    * [[Webp.decodeVp8l]] and emit the exact [[decodeImage]] pixel-stat
    * feature contract; lossy VP8 and animated/extended payloads whose
    * image chunk is not VP8L return None — the caller degrades to the
    * stub and [[decodeCoverage]] reports the gap (the honest-stub
    * discipline, scope stated like the PDF CID bound).
    */
  def decodeWebpFeatures(payload: Array[Byte], dims: Int = 8): Option[Array[Float]] =
    Webp.decodeArgb(payload).map { im =>
      featuresOfArgb(im.width, im.height, im.argb, dims)
    }

  /** The [[decodeImage]] pixel-stat feature vector computed from a raw
    * ARGB array — one implementation of the stat loop for decoders that
    * produce pixels without a BufferedImage.
    */
  private[llmops] def featuresOfArgb(w: Int, h: Int, argb: Array[Int],
      dims: Int): Array[Float] = {
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    var i = 0
    while (i < argb.length) {
      val rgb = argb(i)
      val r = (rgb >> 16) & 0xFF
      val g = (rgb >> 8) & 0xFF
      val b = rgb & 0xFF
      val lum = 0.299 * r + 0.587 * g + 0.114 * b
      sr += r; sg += g; sb += b; sl += lum; sl2 += lum * lum
      i += 1
    }
    val n = w.toDouble * h
    val meanL = sl / n
    val varL = math.max(0.0, sl2 / n - meanL * meanL)
    val feats = Array(w.toFloat, h.toFloat,
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      (meanL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
      w.toFloat / h)
    val out = new Array[Float](dims)
    feats.take(dims).copyToArray(out)
    out
  }
}
