package graft

import graft.llmops.{Multimodal, Webp}
import org.apache.spark.sql.functions.col

/** VP8L decode over hand-assembled lossless-WebP bytes (the
  * Xlsx/PDF/safetensors FOREIGN-fixture discipline): every stream below
  * is written bit-by-bit from the published bitstream layout — header,
  * simple and code-length-coded prefix codes, LZ77 with both the 2D
  * distance map and absolute distances, the color cache, and all four
  * transforms — then decoded and compared pixel-for-pixel against the
  * hand-computed ARGB ground truth. Lossy VP8 and truncation degrade to
  * None, never throw.
  */
class WebpSpec extends SparkTestBase {

  /** LSB-first bit writer (the VP8L stream convention). */
  private final class BitWriter {
    private val bytes = scala.collection.mutable.ArrayBuffer[Int]()
    private var cur = 0
    private var nBits = 0
    def bits(v: Int, n: Int): this.type = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { bytes += cur; cur = 0; nBits = 0 }
        i += 1
      }
      this
    }
    /** A prefix CODE is walked MSB-first by the decoder — append its
      * bits reversed relative to [[bits]].
      */
    def code(v: Int, len: Int): this.type = {
      var bit = len - 1
      while (bit >= 0) { bits((v >> bit) & 1, 1); bit -= 1 }
      this
    }
    def toBytes: Array[Byte] = {
      val out = bytes.toArray.map(_.toByte)
      if (nBits > 0) out :+ cur.toByte else out
    }
  }

  /** Wrap a raw VP8L stream (0x2f + bits) in RIFF/WEBP. */
  private def riff(vp8l: Array[Byte]): Array[Byte] = {
    val padded = if (vp8l.length % 2 == 1) vp8l :+ 0.toByte else vp8l
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write("RIFF".getBytes("ISO-8859-1"))
    le32(4 + 8 + padded.length)
    bos.write("WEBP".getBytes("ISO-8859-1"))
    bos.write("VP8L".getBytes("ISO-8859-1"))
    le32(vp8l.length)
    bos.write(padded)
    bos.toByteArray
  }

  private def header(bw: BitWriter, w: Int, h: Int): Unit = {
    bw.bits(w - 1, 14).bits(h - 1, 14).bits(0, 1).bits(0, 3)
    ()
  }

  /** simple prefix code, one 8-bit symbol (0 data bits per read). */
  private def simple1(bw: BitWriter, sym: Int): Unit = {
    bw.bits(1, 1).bits(0, 1).bits(1, 1).bits(sym, 8)
    ()
  }

  /** simple prefix code, one symbol in the 1-bit form (sym 0 or 1). */
  private def simple1Small(bw: BitWriter, sym: Int): Unit = {
    bw.bits(1, 1).bits(0, 1).bits(0, 1).bits(sym, 1)
    ()
  }

  /** simple prefix code, two 8-bit symbols (1 data bit per read;
    * canonically the smaller symbol value reads as bit 0).
    */
  private def simple2(bw: BitWriter, symA: Int, symB: Int): Unit = {
    bw.bits(1, 1).bits(1, 1).bits(1, 1).bits(symA, 8).bits(symB, 8)
    ()
  }

  private def decode(vp8l: Array[Byte]): Webp.Argb =
    Webp.decodeArgb(riff(vp8l)).getOrElse(fail("expected a decode"))

  /** Write a NORMAL (code-length-coded) prefix code assigning length 1
    * to exactly `symbols` (sorted ascending; canonical codes are then
    * 0, 1, … in that order). Uses the 4-symbol code-length code
    * {0, 1, 17, 18} (all length 2 → codes 00, 01, 10, 11) and an exact
    * max_symbol so not one spare code-length read leaks into the data.
    */
  private def normalCode(bw: BitWriter, symbols: Seq[Int]): Unit = {
    // plan the zero runs between symbols as (clSym, extraVal, extraBits)
    val plan = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    var at = 0
    symbols.foreach { s =>
      var gap = s - at
      while (gap > 0) {
        if (gap >= 11) {
          var chunk = math.min(138, gap)
          if (gap - chunk > 0 && gap - chunk < 3) chunk = gap - 3
          plan += ((18, chunk - 11, 7)); gap -= chunk
        } else if (gap >= 3) {
          plan += ((17, gap - 3, 3)); gap = 0
        } else {
          plan += ((0, 0, 0)); gap -= 1 // a literal zero-length read
        }
      }
      plan += ((1, 0, 0))
      at = s + 1
    }
    val reads = plan.length
    bw.bits(0, 1) // not simple
    bw.bits(0, 4) // num_code_lengths = 4 → order 17, 18, 0, 1
    (0 until 4).foreach(_ => bw.bits(2, 3)) // those four all length 2
    // cl canonical codes: 0→00, 1→01, 17→10, 18→11
    bw.bits(1, 1) // use max_symbol
    val stored = reads - 2
    val k = Seq(0, 1, 2, 3, 4, 5, 6, 7)
      .find(k => stored < (1 << (2 + 2 * k))).get
    bw.bits(k, 3)
    bw.bits(stored, 2 + 2 * k)
    val clCodes = Map(0 -> 0, 1 -> 1, 17 -> 2, 18 -> 3)
    plan.foreach { case (clSym, extraVal, extraBits) =>
      bw.code(clCodes(clSym), 2)
      if (extraBits > 0) bw.bits(extraVal, extraBits)
    }
    ()
  }

  test("single-color image: simple 1-symbol codes, zero data bits per pixel") {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 3, 2)
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1) // no color cache
    bw.bits(0, 1) // no meta prefix
    simple1(bw, 0x34) // green
    simple1(bw, 0x12) // red
    simple1(bw, 0x56) // blue
    simple1(bw, 0xff) // alpha
    simple1Small(bw, 0) // distance (unused)
    val im = decode(bw.toBytes)
    assert(im.width === 3 && im.height === 2)
    assert(im.argb.toSeq === Seq.fill(6)(0xff123456))
  }

  test("LZ77 copy via the 2D distance map: code 1 = the pixel above") {
    // 4x2: row 0 = four literals, row 1 = one length-4 copy at
    // distance code 1 (0, 1) → linear distance = xsize = 4
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 4, 2)
    bw.bits(0, 1).bits(0, 1).bits(0, 1)
    // green: NORMAL code over 280 symbols; lengths: {10: 1, 259: 1}
    // (10 = the literal green, 259 = length code 3 → copy length 4)
    normalCode(bw, Seq(10, 259))
    simple1(bw, 20) // red
    simple1(bw, 30) // blue
    simple1(bw, 0xff) // alpha
    simple1Small(bw, 0) // distance code: single symbol 0 → lz77 value 1
    // pixels: 4 literals (green code 0), then symbol 259 (green code 1)
    (0 until 4).foreach(_ => bw.bits(0, 1))
    bw.bits(1, 1) // symbol 259 → length code 3 → length 4, no extra bits
    // distance symbol: 0 bits (single-symbol code) → distance code 1
    val im = decode(bw.toBytes)
    assert(im.width === 4 && im.height === 2)
    assert(im.argb.toSeq === Seq.fill(8)(0xff140a1e))
  }

  test("LZ77 absolute distance: code > 120") {
    // 5x2: row 0 literals, row 1 copies at absolute distance 5
    // (distance code 125): lz77 prefix for 125: code 13, 5 extra bits 28
    // (offset (2+1)<<5 = 96; 96 + 28 + 1 = 125 → plane 125-120 = 5)
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 5, 2)
    bw.bits(0, 1).bits(0, 1).bits(0, 1)
    // green normal code: {77: 1, 260: 1} (260 = length code 4 → 5..6)
    normalCode(bw, Seq(77, 260))
    simple1(bw, 1) // red
    simple1(bw, 2) // blue
    simple1(bw, 3) // alpha
    simple1(bw, 13) // distance: single symbol 13 (needs the 8-bit form)
    (0 until 5).foreach(_ => bw.bits(0, 1)) // 5 literals, green 77
    bw.bits(1, 1) // symbol 260 → length code 4
    bw.bits(0, 1) // length extra bit: offset 4 + 0 + 1 → length 5
    bw.bits(28, 5) // distance symbol 13 (0 bits) + 5 extra bits = 28
    val im = decode(bw.toBytes)
    assert(im.width === 5 && im.height === 2)
    assert(im.argb.toSeq === Seq.fill(10)(0x03014d02))
  }

  test("subtract-green transform: r/b reconstruct by adding green") {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 2, 1)
    bw.bits(1, 1).bits(2, 2) // one transform: SUBTRACT_GREEN
    bw.bits(0, 1) // no more transforms
    bw.bits(0, 1).bits(0, 1)
    simple1(bw, 100) // green
    simple1(bw, 50) // red (stored residual)
    simple1(bw, 10) // blue
    simple1(bw, 0xff)
    simple1Small(bw, 0)
    val im = decode(bw.toBytes)
    assert(im.argb.toSeq === Seq.fill(2)(0xff96646e))
    // r = (50+100) & 0xff = 150 = 0x96; g = 100 = 0x64; b = 110 = 0x6e
  }

  test("color cache: literal inserts, later pixels reference by index") {
    val px = 0xff030709
    val cacheBits = 2
    val idx = ((0x1e35a7bd * px) >>> (32 - cacheBits))
    val cacheSym = 280 + idx // 256 + 24 + idx
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 2, 2)
    bw.bits(0, 1) // no transforms
    bw.bits(1, 1).bits(cacheBits, 4) // color cache, 4 entries
    bw.bits(0, 1) // no meta
    normalCode(bw, Seq(7, cacheSym)) // green over 284 symbols
    simple1(bw, 3) // red
    simple1(bw, 9) // blue
    simple1(bw, 0xff) // alpha
    simple1Small(bw, 0)
    // p0 literal (code 0 = symbol 7), p1..p3 cache hits (code 1)
    bw.bits(0, 1)
    bw.bits(1, 1).bits(1, 1).bits(1, 1)
    val im = decode(bw.toBytes)
    assert(im.argb.toSeq === Seq.fill(4)(px))
  }

  test("color indexing with pixel bundling: 2-entry palette packs 8 px/byte") {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 8, 1)
    bw.bits(1, 1).bits(3, 2) // COLOR_INDEXING
    bw.bits(1, 8) // palette size - 1 = 1 → 2 entries
    // palette subimage 2x1 (not top level): deltas
    // entry0 = 0xff000000; entry1 delta = 0x00ffffff → 0xffffffff
    bw.bits(0, 1) // no cache
    simple2(bw, 0x00, 0xff) // green: p0 → 0, p1 → 0xff
    simple2(bw, 0x00, 0xff) // red
    simple2(bw, 0x00, 0xff) // blue
    simple2(bw, 0x00, 0xff) // alpha: p0 → 0xff (code 1), p1 → 0 (code 0)
    simple1Small(bw, 0)
    // palette pixels: p0: g=0,r=0,b=0,a=0xff → bits g0 r0 b0 a1
    bw.bits(0, 1).bits(0, 1).bits(0, 1).bits(1, 1)
    // p1: g=0xff,r=0xff,b=0xff,a=0 → bits 1 1 1 0
    bw.bits(1, 1).bits(1, 1).bits(1, 1).bits(0, 1)
    bw.bits(0, 1) // no more transforms
    // main image: packed width = 1; green = 0b10101010 = 0xAA
    bw.bits(0, 1).bits(0, 1) // no cache, no meta
    simple1(bw, 0xaa) // green
    simple1(bw, 0) // red
    simple1(bw, 0) // blue
    simple1(bw, 0) // alpha
    simple1Small(bw, 0)
    val im = decode(bw.toBytes)
    assert(im.width === 8 && im.height === 1)
    val black = 0xff000000
    val white = 0xffffffff
    assert(im.argb.toSeq ===
      Seq(black, white, black, white, black, white, black, white))
  }

  test("predictor transform: border rules + mode-1 left prediction") {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 2, 2)
    bw.bits(1, 1).bits(0, 2) // PREDICTOR
    bw.bits(0, 3) // size_bits = 2 → one 4x4 tile covers 2x2
    // tile subimage 1x1: green = mode = 1
    bw.bits(0, 1) // no cache
    simple1(bw, 1) // green (mode)
    simple1(bw, 0)
    simple1(bw, 0)
    simple1(bw, 0)
    simple1Small(bw, 0)
    bw.bits(0, 1) // no more transforms
    // residuals: p00 = 0x00808080 (pred 0xff000000), others 0
    bw.bits(0, 1).bits(0, 1)
    simple2(bw, 0x00, 0x80) // green
    simple2(bw, 0x00, 0x80) // red
    simple2(bw, 0x00, 0x80) // blue
    simple1(bw, 0x00) // alpha residual always 0 (pred alpha 0xff carries)
    simple1Small(bw, 0)
    // p00: green 0x80 (code 1), red 0x80, blue 0x80
    bw.bits(1, 1).bits(1, 1).bits(1, 1)
    // p10, p01, p11: all zero residuals (codes 0)
    (0 until 3).foreach(_ => bw.bits(0, 1).bits(0, 1).bits(0, 1))
    val im = decode(bw.toBytes)
    assert(im.argb.toSeq === Seq.fill(4)(0xff808080))
  }

  test("cross-channel color transform: signed 3.5 fixed-point deltas") {
    def build(greenToRed: Int): Webp.Argb = {
      val bw = new BitWriter
      bw.bits(0x2f, 8)
      header(bw, 2, 1)
      bw.bits(1, 1).bits(1, 2) // COLOR_TRANSFORM
      bw.bits(1, 3) // size_bits = 3 → one 8x8 tile
      // cte tile pixel: red = red_to_blue, green = green_to_blue,
      // blue = green_to_red
      bw.bits(0, 1) // tile subimage: no cache
      simple1(bw, 0x00) // green_to_blue = 0
      simple1(bw, 0x00) // red_to_blue = 0
      simple1(bw, greenToRed)
      simple1(bw, 0xff)
      simple1Small(bw, 0)
      bw.bits(0, 1) // no more transforms
      bw.bits(0, 1).bits(0, 1)
      simple1(bw, 64) // green
      simple1(bw, 10) // stored red residual
      simple1(bw, 20) // stored blue
      simple1(bw, 0xff)
      simple1Small(bw, 0)
      decode(bw.toBytes)
    }
    // delta(16, 64) = (16·64) >> 5 = 32 → r = (10+32) & 0xff = 42
    assert(build(16).argb.toSeq === Seq.fill(2)(0xff2a4014))
    // 0xF0 is −16 in int8: delta = −32 → r = (10−32) & 0xff = 234
    assert(build(0xf0).argb.toSeq === Seq.fill(2)(0xffea4014))
  }

  test("meta prefix codes: an entropy image selects per-tile code groups") {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 8, 1)
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1) // no color cache
    bw.bits(1, 1) // meta prefix codes
    bw.bits(0, 3) // huffman_bits = 2 → 4-px tiles → entropy image 2x1
    // entropy image (not top level): green channel = meta index 0 / 1
    bw.bits(0, 1) // no cache in the entropy image
    simple2(bw, 0x00, 0x01) // green: canonical 0→bit0, 1→bit1
    simple1(bw, 0x00); simple1(bw, 0x00); simple1(bw, 0x00)
    simple1Small(bw, 0)
    bw.bits(0, 1).bits(1, 1) // entropy pixels: green 0, then green 1
    // group 0: literal (a=255, r=1, g=10, b=2)
    simple1(bw, 10); simple1(bw, 1); simple1(bw, 2); simple1(bw, 0xff)
    simple1Small(bw, 0)
    // group 1: literal (a=255, r=3, g=200, b=4)
    simple1(bw, 200); simple1(bw, 3); simple1(bw, 4); simple1(bw, 0xff)
    simple1Small(bw, 0)
    val im = decode(bw.toBytes)
    assert(im.argb.toSeq ===
      Seq.fill(4)(0xff010a02) ++ Seq.fill(4)(0xff03c804))
  }

  test("container: lossy VP8, truncation, non-RIFF all degrade to None") {
    // lossy: a VP8 chunk
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("ISO-8859-1"))
    (0 until 4).foreach(_ => bos.write(20))
    bos.write("WEBP".getBytes("ISO-8859-1"))
    bos.write("VP8 ".getBytes("ISO-8859-1"))
    (0 until 4).foreach(_ => bos.write(0))
    assert(Webp.decodeArgb(bos.toByteArray).isEmpty)
    // truncated VP8L payload
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 100, 100)
    bw.bits(0, 1).bits(0, 1).bits(0, 1)
    assert(Webp.decodeArgb(riff(bw.toBytes)).isEmpty)
    // not RIFF at all
    assert(Webp.decodeArgb("not a webp at all".getBytes("UTF-8")).isEmpty)
    // bad signature byte
    assert(Webp.decodeArgb(riff(Array[Byte](0x2e, 0, 0, 0, 0))).isEmpty)
  }

  test("VP8X-wrapped VP8L decodes; detectKind sees webp for both") {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 1, 1)
    bw.bits(0, 1).bits(0, 1).bits(0, 1)
    simple1(bw, 7); simple1(bw, 8); simple1(bw, 9); simple1(bw, 0xff)
    simple1Small(bw, 0)
    val vp8l = bw.toBytes
    val padded = if (vp8l.length % 2 == 1) vp8l :+ 0.toByte else vp8l
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write("RIFF".getBytes("ISO-8859-1"))
    le32(4 + 8 + 10 + 8 + padded.length)
    bos.write("WEBP".getBytes("ISO-8859-1"))
    bos.write("VP8X".getBytes("ISO-8859-1")); le32(10)
    (0 until 10).foreach(_ => bos.write(0))
    bos.write("VP8L".getBytes("ISO-8859-1")); le32(vp8l.length)
    bos.write(padded)
    val bytes = bos.toByteArray
    val im = Webp.decodeArgb(bytes)
    assert(im.map(_.argb.toSeq) === Some(Seq(0xff080709)))
    assert(Multimodal.detectKind(bytes) === "webp")
    assert(Multimodal.detectKind(riff(vp8l)) === "webp")
  }

  private def singleColorWebp(w: Int, h: Int, argb: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, w, h)
    bw.bits(0, 1).bits(0, 1).bits(0, 1)
    simple1(bw, (argb >> 8) & 0xff)
    simple1(bw, (argb >> 16) & 0xff)
    simple1(bw, argb & 0xff)
    simple1(bw, (argb >>> 24) & 0xff)
    simple1Small(bw, 0)
    riff(bw.toBytes)
  }

  test("a webp and its PNG twin hash identically (aHash, pHash, features)") {
    // the 8x1 black/white palette fixture vs the same pixels as PNG
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    header(bw, 8, 1)
    bw.bits(1, 1).bits(3, 2).bits(1, 8)
    bw.bits(0, 1)
    simple2(bw, 0x00, 0xff); simple2(bw, 0x00, 0xff)
    simple2(bw, 0x00, 0xff); simple2(bw, 0x00, 0xff)
    simple1Small(bw, 0)
    bw.bits(0, 1).bits(0, 1).bits(0, 1).bits(1, 1)
    bw.bits(1, 1).bits(1, 1).bits(1, 1).bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1).bits(0, 1)
    simple1(bw, 0xaa); simple1(bw, 0); simple1(bw, 0); simple1(bw, 0)
    simple1Small(bw, 0)
    val webp = riff(bw.toBytes)
    val im = new java.awt.image.BufferedImage(8, 1,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 8).foreach(x =>
      im.setRGB(x, 0, if (x % 2 == 0) 0xff000000 else 0xffffffff))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.imageAHash(webp) === Multimodal.imageAHash(png))
    assert(Multimodal.imageAHash(webp).isDefined)
    assert(Multimodal.imagePHash(webp) === Multimodal.imagePHash(png))
    assert(Multimodal.decodeImage(webp).map(_.toSeq) ===
      Multimodal.decodeImage(png).map(_.toSeq))
  }

  test("detectKind: every magic plus the adversarial edges") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val pad = "x".getBytes("UTF-8")
    assert(Multimodal.detectKind(
      b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++ pad) === "png")
    assert(Multimodal.detectKind(b(0xFF, 0xD8, 0xFF) ++ pad) === "jpeg")
    assert(Multimodal.detectKind("GIF89a...".getBytes("ISO-8859-1")) === "gif")
    assert(Multimodal.detectKind("BM0000".getBytes("ISO-8859-1")) === "bmp")
    assert(Multimodal.detectKind("%PDF-1.7".getBytes("ISO-8859-1")) === "pdf")
    assert(Multimodal.detectKind(b(0x1F, 0x8B, 8) ++ pad) === "gzip")
    assert(Multimodal.detectKind(b(0x28, 0xB5, 0x2F, 0xFD) ++ pad) === "zstd")
    assert(Multimodal.detectKind(b(0x50, 0x4B, 0x03, 0x04) ++ pad) === "zip")
    assert(Multimodal.detectKind(b(0x49, 0x49, 0x2A, 0x00) ++ pad) === "tiff")
    assert(Multimodal.detectKind(b(0x4D, 0x4D, 0x00, 0x2A) ++ pad) === "tiff")
    assert(Multimodal.detectKind("WARC/1.1\r\n".getBytes("ISO-8859-1")) === "warc")
    assert(Multimodal.detectKind(
      "RIFFxxxxWAVEfmt ".getBytes("ISO-8859-1")) === "wav")
    assert(Multimodal.detectKind(
      "RIFFxxxxAVI LIST".getBytes("ISO-8859-1")) === "avi")
    assert(Multimodal.detectKind(
      "RIFFxxxxWEBPVP8L".getBytes("ISO-8859-1")) === "webp")
    // adversarial: RIFF with a bogus tag is the bare container;
    // a truncated magic or plain text is unknown
    assert(Multimodal.detectKind(
      "RIFFxxxxJUNK".getBytes("ISO-8859-1")) === "riff")
    assert(Multimodal.detectKind(b(0x89, 0x50)) === "unknown")
    assert(Multimodal.detectKind("hello world".getBytes("UTF-8")) === "unknown")
    assert(Multimodal.detectKind(Array.empty[Byte]) === "unknown")
  }

  test("imageDims: header-sniffed dimensions match the real decode for " +
      "every format; the codegen column agrees with the JVM walk") {
    import spark.implicits._
    def enc(w: Int, h: Int, format: String): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => im.setRGB(x, y, 0x446688)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, format, bos)
      bos.toByteArray
    }
    val png = enc(37, 19, "png")
    val gif = enc(12, 45, "gif")
    val bmp = enc(7, 3, "bmp")
    val jpg = enc(23, 61, "jpg")
    assert(Multimodal.imageDims(png) === Some((37, 19)))
    assert(Multimodal.imageDims(gif) === Some((12, 45)))
    assert(Multimodal.imageDims(bmp) === Some((7, 3)))
    assert(Multimodal.imageDims(jpg) === Some((23, 61)))
    // webp: VP8L fixture (3x2), a 1x1 via the single-color builder
    assert(Multimodal.imageDims(singleColorWebp(3, 2, 0xff000000)) === Some((3, 2)))
    assert(Multimodal.imageDims(singleColorWebp(200, 131, 0xff102030)) ===
      Some((200, 131)))
    // non-images and truncated headers: None, never a throw
    assert(Multimodal.imageDims("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDims(png.take(15)).isEmpty)
    assert(Multimodal.imageDims(Array.empty[Byte]).isEmpty)
    // the codegen column agrees with the JVM walk on its three formats
    val rows = Seq(("png", png), ("gif", gif), ("bmp", bmp),
        ("jpg", jpg), ("txt", "nope".getBytes("UTF-8")))
      .toDF("name", "payload")
      .select(col("name"), Multimodal.imageDimsCol(col("payload")).as("d"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.getStruct(1)).map(s => (s.getLong(0), s.getLong(1)))).toMap
    assert(rows("png") === Some((37L, 19L)))
    assert(rows("gif") === Some((12L, 45L)))
    assert(rows("bmp") === Some((7L, 3L)))
    assert(rows("jpg") === None) // SOF walk is JVM-side by design
    assert(rows("txt") === None)
  }

  test("routedFeatures routes by BYTES (mislabeled kinds can't stub a " +
      "decodable image) and decodeCoverage reports the stub mix") {
    import spark.implicits._
    val im = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach(x => (0 until 2).foreach(y => im.setRGB(x, y, 0x123456)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = bos.toByteArray
    val webp = singleColorWebp(3, 2, 0xff123456)
    val lossy = ("RIFF" + "\u0000\u0000\u0000\u0000" + "WEBPVP8 junk")
      .getBytes("ISO-8859-1")
    val rows = Seq(
      (1L, png), // decodable image, no kind label needed
      (2L, webp), // lossless webp → REAL decode
      (3L, lossy), // lossy webp → honest stub
      (4L, "just some text".getBytes("UTF-8"))) // unknown → stub
    val media = rows.toDF("media_id", "payload")
    val out = Multimodal.routedFeatures(media).collect()
      .map(r => r.media_id -> ((r.kind, r.decoded))).toMap
    assert(out(1L) === (("png", true)))
    assert(out(2L) === (("webp", true)))
    assert(out(3L) === (("webp", false)))
    assert(out(4L) === (("unknown", false)))
    val cov = Multimodal.decodeCoverage(media).collect()
      .map(r => r.getAs[String]("kind") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_decoded"),
          r.getAs[Long]("stub_ppm")))).toMap
    assert(cov("png") === ((1L, 1L, 0L)))
    assert(cov("webp") === ((2L, 1L, 500000L)))
    assert(cov("unknown") === ((1L, 0L, 1000000L)))
  }
}
