package graft.llmops

/** Dependency-free WebP **lossless** (VP8L) decoder — the in-JDK image
  * surface ([[Multimodal.decodeImage]]'s javax.imageio covers
  * PNG/BMP/GIF/JPEG only, and a 2026 web crawl is majority WebP, so
  * without this the visual near-dup lanes silently see a fraction of
  * the corpus). Implements the public "WebP Lossless Bitstream
  * Specification": RIFF chunk walk → VP8L header → optional transforms
  * (predictor / color / subtract-green / color-indexing with pixel
  * bundling) → meta prefix codes over an entropy image → canonical
  * prefix-coded literals, LZ77 backward references (2D distance map +
  * absolute distances) and the hashed color cache — then the inverse
  * transforms in reverse stream order.
  *
  * SCOPE, stated like the PDF CID bound: **lossy VP8 and animated
  * streams do not decode here** — [[decodeArgb]] returns None for them
  * (the chunk walk recognizes the container, the payload needs a DCT
  * codec that has no dependency-free one-file implementation, and
  * RFC 6386's default probability tables are not reproducible offline
  * without risking silent mis-decodes). The honest-stub degrade
  * applies, [[Multimodal.decodeCoverage]] makes the stubbed fraction
  * observable per kind, and the stance is MEASURED, not narrated:
  * [[graft.tools.MediaMixBench]] quantifies the near-dup recall the
  * stub costs at a realistic format mix (BASELINE.md r14 — the loss is
  * exactly the undecodable-twin share; every decodable lane holds
  * 100%). A real decoder (JNI libwebp, subprocess) replaces the stub
  * behind the same routedFeatures seam with no plan change.
  *
  * Trust nothing: every read is bounds-checked; any structural problem
  * (truncated stream, over-long code, bad transform tiling, palette
  * index overflow) returns None, never throws — the
  * [[graft.ingest.SafeTensors]] / Xlsx quarantine discipline applied to
  * a bitstream. Per-payload CPU inside mapPartitions; nothing here
  * touches plan shape or shuffle volume.
  */
object Webp {

  final case class Argb(width: Int, height: Int, argb: Array[Int])

  /** Container walk: "RIFF" size "WEBP", then chunks (fourcc, LE size,
    * even-padded payload). A top-level "VP8L" chunk — directly or
    * inside a "VP8X" extended file — decodes; "VP8 " (lossy) and
    * anything else returns None.
    */
  def decodeArgb(payload: Array[Byte]): Option[Argb] = {
    try {
      if (payload.length < 20) return None
      if (!fourcc(payload, 0, "RIFF") || !fourcc(payload, 8, "WEBP")) return None
      var off = 12
      while (off + 8 <= payload.length) {
        val size = le32(payload, off + 4)
        if (size < 0 || off + 8 + size > payload.length) return None
        if (fourcc(payload, off, "VP8L"))
          return decodeVp8l(payload, off + 8, size.toInt)
        // VP8X just wraps more chunks after its 10-byte payload — keep
        // walking; ANIM/ANMF/VP8 / ALPH are all "not lossless still".
        if (fourcc(payload, off, "VP8X")) {
          off += 8 + ((size.toInt + 1) & ~1)
        } else if (fourcc(payload, off, "VP8 ") || fourcc(payload, off, "ANIM") ||
            fourcc(payload, off, "ANMF")) {
          return None
        } else {
          off += 8 + ((size.toInt + 1) & ~1)
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def fourcc(b: Array[Byte], off: Int, tag: String): Boolean =
    b.length >= off + 4 && b(off) == tag.charAt(0).toByte &&
      b(off + 1) == tag.charAt(1).toByte && b(off + 2) == tag.charAt(2).toByte &&
      b(off + 3) == tag.charAt(3).toByte

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Structural failure inside the bitstream — caught at the [[decodeVp8l]]
    * boundary and turned into None (cheap, carries no stack trace).
    */
  private final class Bad extends scala.util.control.ControlThrowable

  private def bad(): Nothing = throw new Bad

  /** LSB-first bit reader over a byte slice (the VP8L convention). */
  private final class BitReader(bytes: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitPos = 0
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) bad()
        v |= ((bytes(pos) >> bitPos) & 1) << i
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readBit(): Int = readBits(1)
  }

  /** Canonical prefix code (the DEFLATE assignment: codes ordered by
    * length then symbol, walked MSB-first one bit at a time). Stored as
    * a flat binary tree in an int array: node i holds children at
    * 2i+1 / 2i+2 style indices via an explicit next-free allocator;
    * leaves store symbol, inner nodes store child indices.
    */
  private final class PrefixCode(lengths: Array[Int]) {
    // tree(n) = -1 unvisited; >= 0x40000000 leaf (symbol | flag);
    // else inner: tree(n) = left child index, right = left + 1.
    private val maxNodes = {
      var total = 2
      var i = 0
      while (i < lengths.length) { if (lengths(i) > 0) total += 2 * lengths(i); i += 1 }
      total + 2
    }
    private val tree = Array.fill(maxNodes)(-1)
    private var nextFree = 1
    private var nCodes = 0
    private var only = -1

    locally {
      // canonical code assignment
      val maxLen = lengths.foldLeft(0)(math.max)
      if (maxLen > 15) bad() // VP8L caps code lengths at 15
      val blCount = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) blCount(l) += 1)
      val nextCode = new Array[Int](maxLen + 2)
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + blCount(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      var over = false
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) {
          nCodes += 1; only = s
          val c = nextCode(len); nextCode(len) += 1
          if (c >> len != 0) over = true // over-subscribed
          // walk MSB → LSB
          var node = 0
          var bit = len - 1
          while (bit >= 0) {
            if (tree(node) >= 0x40000000) over = true // prefix collision
            else {
              if (tree(node) < 0) { tree(node) = nextFree; nextFree += 2 }
              node = tree(node) + ((c >> bit) & 1)
              if (node >= tree.length) bad()
            }
            bit -= 1
          }
          if (tree(node) != -1) over = true
          tree(node) = 0x40000000 | s
        }
        s += 1
      }
      if (over || nCodes == 0) bad()
    }

    def readSymbol(br: BitReader): Int = {
      if (nCodes == 1) return only // 0-bit code
      var node = 0
      while (tree(node) < 0x40000000) {
        if (tree(node) < 0) bad() // incomplete code reached a hole
        node = tree(node) + br.readBit()
      }
      tree(node) & 0x3fffffff
    }
  }

  /** Code-length-code symbol order (shared with DEFLATE's trick of
    * fronting the symbols most likely to be used).
    */
  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code over `alphabetSize` symbols: the simple
    * (1-2 symbol) form or the normal code-length-coded form with
    * 16/17/18 repeat codes.
    */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    val simple = br.readBit() == 1
    val lengths = new Array[Int](alphabetSize)
    if (simple) {
      val numSymbols = br.readBit() + 1
      val first8 = br.readBit() == 1
      val sym0 = br.readBits(if (first8) 8 else 1)
      if (sym0 >= alphabetSize) bad()
      lengths(sym0) = 1
      if (numSymbols == 2) {
        val sym1 = br.readBits(8)
        if (sym1 >= alphabetSize || sym1 == sym0) bad()
        lengths(sym1) = 1
      }
    } else {
      val numCodeLengths = 4 + br.readBits(4)
      if (numCodeLengths > CodeLengthOrder.length) bad()
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) {
        clLengths(CodeLengthOrder(i)) = br.readBits(3)
        i += 1
      }
      val clCode = new PrefixCode(clLengths)
      var maxSymbol =
        if (br.readBit() == 1) {
          val lengthNBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(lengthNBits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val clSym = clCode.readSymbol(br)
        if (clSym < 16) {
          lengths(symbol) = clSym
          symbol += 1
          if (clSym != 0) prevLen = clSym
        } else {
          val (repeat, repLen) = clSym match {
            case 16 => (3 + br.readBits(2), prevLen)
            case 17 => (3 + br.readBits(3), 0)
            case 18 => (11 + br.readBits(7), 0)
            case _ => bad()
          }
          var r = 0
          while (r < repeat) {
            if (symbol >= alphabetSize) bad()
            lengths(symbol) = repLen
            symbol += 1
            r += 1
          }
        }
      }
      ()
    }
    new PrefixCode(lengths)
  }

  /** One group of the five prefix codes: green+length+cache, red, blue,
    * alpha, distance.
    */
  private final class CodeGroup(br: BitReader, cacheSize: Int) {
    val green = readPrefixCode(br, 256 + 24 + cacheSize)
    val red = readPrefixCode(br, 256)
    val blue = readPrefixCode(br, 256)
    val alpha = readPrefixCode(br, 256)
    val dist = readPrefixCode(br, 40)
  }

  /** LZ77 prefix-coded value: codes 0-3 are 1-4 directly, above that an
    * exponential bucket with extra bits.
    */
  private def lz77Value(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }

  /** The spec's 2D distance map for distance codes 1..120: (dx, dy)
    * neighborhood offsets ordered by proximity; codes above 120 are
    * plain linear distances minus 120. Stored exactly as printed in the
    * bitstream specification.
    */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (0, 8), (8, 0), (1, 8), (-1, 8), (4, 7), (-4, 7), (7, 4), (-7, 4),
    (8, 1), (-8, 1), (2, 8), (-2, 8), (8, 2), (-8, 2), (6, 6), (-6, 6),
    (3, 8), (-3, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5))

  /** Distance code → linear distance: codes 1..120 map through the 2D
    * neighborhood ((dx, dy) with positive dx = to the LEFT — code 1 is
    * the pixel directly above, code 2 the previous pixel), clamped to
    * ≥ 1; codes above 120 are absolute distances minus 120.
    */
  private def planeDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistanceMap(code - 1)
      math.max(1, dy * xsize + dx)
    }

  /** One read transform, with the image dims AT READ TIME (bundled
    * color-indexing shrinks the working width for everything read after
    * it — the libwebp convention).
    */
  private sealed trait Transform { def w: Int; def h: Int }
  private final case class Predictor(w: Int, h: Int, sizeBits: Int,
      tiles: Array[Int]) extends Transform
  private final case class ColorXform(w: Int, h: Int, sizeBits: Int,
      tiles: Array[Int]) extends Transform
  private final case class SubtractGreen(w: Int, h: Int) extends Transform
  private final case class ColorIndexing(w: Int, h: Int, widthBits: Int,
      palette: Array[Int]) extends Transform

  private def divRoundUp(a: Int, shiftBits: Int): Int =
    (a + (1 << shiftBits) - 1) >> shiftBits

  /** Decode a VP8L stream (signature byte + header + image). */
  private[llmops] def decodeVp8l(bytes: Array[Byte], off: Int,
      len: Int): Option[Argb] = {
    try {
      if (len < 5 || (bytes(off) & 0xff) != 0x2f) return None
      val br = new BitReader(bytes, off + 1, off + len)
      val width = br.readBits(14) + 1
      val height = br.readBits(14) + 1
      br.readBit() // alpha hint
      if (br.readBits(3) != 0) return None // version must be 0
      if (width.toLong * height > (64L << 20)) return None // 64 Mpx guard
      Some(Argb(width, height, decodeImageStream(br, width, height, topLevel = true)))
    } catch {
      case _: Bad => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** The recursive image-stream decode: transforms (top level only) →
    * color cache → meta prefix codes → spatial decode, then inverse
    * transforms. Subimages (entropy image, transform tiles, palette)
    * recurse with topLevel = false.
    */
  private def decodeImageStream(br: BitReader, w0: Int, h0: Int,
      topLevel: Boolean): Array[Int] = {
    var w = w0
    val h = h0
    var transforms = List.empty[Transform]
    if (topLevel) {
      var seen = 0
      while (br.readBit() == 1) {
        val ttype = br.readBits(2)
        if ((seen & (1 << ttype)) != 0) bad() // each type at most once
        seen |= 1 << ttype
        val t = ttype match {
          case 0 =>
            val sizeBits = br.readBits(3) + 2
            val tw = divRoundUp(w, sizeBits)
            val th = divRoundUp(h, sizeBits)
            Predictor(w, h, sizeBits, decodeImageStream(br, tw, th, topLevel = false))
          case 1 =>
            val sizeBits = br.readBits(3) + 2
            val tw = divRoundUp(w, sizeBits)
            val th = divRoundUp(h, sizeBits)
            ColorXform(w, h, sizeBits, decodeImageStream(br, tw, th, topLevel = false))
          case 2 => SubtractGreen(w, h)
          case 3 =>
            val paletteSize = br.readBits(8) + 1
            val deltas = decodeImageStream(br, paletteSize, 1, topLevel = false)
            val palette = new Array[Int](paletteSize)
            var prev = 0
            var i = 0
            while (i < paletteSize) {
              // per-channel modular sum with the previous entry
              val d = deltas(i)
              val a = (((prev >>> 24) + (d >>> 24)) & 0xff) << 24
              val r = ((((prev >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff) << 16
              val g = ((((prev >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff) << 8
              val b = (((prev & 0xff) + (d & 0xff)) & 0xff)
              prev = a | r | g | b
              palette(i) = prev
              i += 1
            }
            val widthBits =
              if (paletteSize <= 2) 3
              else if (paletteSize <= 4) 2
              else if (paletteSize <= 16) 1
              else 0
            val ci = ColorIndexing(w, h, widthBits, palette)
            if (widthBits > 0) w = divRoundUp(w, widthBits)
            ci
        }
        transforms = t :: transforms // reverse order = application order
      }
    }
    val image = decodeSpatial(br, w, h, topLevel)
    // inverse transforms, most-recently-read first
    var out = image
    var curW = w
    transforms.foreach {
      case SubtractGreen(_, _) =>
        var i = 0
        while (i < out.length) {
          val p = out(i)
          val g = (p >> 8) & 0xff
          val r = (((p >> 16) & 0xff) + g) & 0xff
          val b = ((p & 0xff) + g) & 0xff
          out(i) = (p & 0xff000000) | (r << 16) | (p & 0xff00) | b
          i += 1
        }
      case ColorXform(tw, th, sizeBits, tiles) =>
        if (tw != curW) bad()
        applyInverseColorTransform(out, tw, th, sizeBits, tiles)
      case Predictor(tw, th, sizeBits, tiles) =>
        if (tw != curW) bad()
        applyInversePredictor(out, tw, th, sizeBits, tiles)
      case ColorIndexing(origW, th, widthBits, palette) =>
        out = applyColorIndexing(out, origW, th, curW, widthBits, palette)
        curW = origW
    }
    out
  }

  /** Spatial (entropy-coded) decode of a w×h ARGB image. */
  private def decodeSpatial(br: BitReader, w: Int, h: Int,
      topLevel: Boolean): Array[Int] = {
    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    if (cacheBits > 11) bad()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    // meta prefix codes (top-level images only)
    var metaBits = 0
    var entropyImage: Array[Int] = null
    var nGroups = 1
    if (topLevel && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      val ew = divRoundUp(w, metaBits)
      val eh = divRoundUp(h, metaBits)
      entropyImage = decodeImageStream(br, ew, eh, topLevel = false)
      var i = 0
      while (i < entropyImage.length) {
        val meta = ((entropyImage(i) >> 8) & 0xffff)
        if (meta + 1 > nGroups) nGroups = meta + 1
        i += 1
      }
    }
    val groups = Array.fill(nGroups)(new CodeGroup(br, cacheSize))
    val out = new Array[Int](w * h)
    var pos = 0
    val n = w * h
    while (pos < n) {
      val x = pos % w
      val y = pos / w
      val group =
        if (entropyImage == null) groups(0)
        else {
          val ei = (y >> metaBits) * divRoundUp(w, metaBits) + (x >> metaBits)
          groups((entropyImage(ei) >> 8) & 0xffff)
        }
      val s = group.green.readSymbol(br)
      if (s < 256) {
        val red = group.red.readSymbol(br)
        val blue = group.blue.readSymbol(br)
        val alpha = group.alpha.readSymbol(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null)
          cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(br, s - 256)
        val distCode = lz77Value(br, group.dist.readSymbol(br))
        val dist = planeDistance(distCode, w)
        if (pos - dist < 0 || pos + length > n) bad()
        var i = 0
        while (i < length) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null)
            cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
          pos += 1
          i += 1
        }
      } else {
        if (cache == null) bad()
        val idx = s - 256 - 24
        if (idx >= cacheSize) bad()
        out(pos) = cache(idx)
        pos += 1
      }
    }
    out
  }

  // ---- inverse transforms ----

  private def applyInversePredictor(img: Array[Int], w: Int, h: Int,
      sizeBits: Int, tiles: Array[Int]): Unit = {
    val tilesPerRow = divRoundUp(w, sizeBits)
    def avg2(a: Int, b: Int): Int = {
      (((((a >>> 24) + (b >>> 24)) / 2) & 0xff) << 24) |
        (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) << 16) |
        (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) << 8) |
        ((((a & 0xff) + (b & 0xff)) / 2))
    }
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val predicted: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) img(pos - 1) // top row: L
          else if (x == 0) img(pos - w) // left column: T
          else {
            val mode = (tiles((y >> sizeBits) * tilesPerRow + (x >> sizeBits)) >> 8) & 0xff
            val l = img(pos - 1)
            val t = img(pos - w)
            val tl = img(pos - w - 1)
            // rightmost column: TR wraps to the leftmost pixel of the
            // current row (the spec's exceptional addressing)
            val tr = if (x == w - 1) img(y * w) else img(pos - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => // Select
                val pa = (l >>> 24) + (t >>> 24) - (tl >>> 24)
                val pr = ((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)
                val pg = ((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)
                val pb = (l & 0xff) + (t & 0xff) - (tl & 0xff)
                val dl = math.abs(pa - (l >>> 24)) + math.abs(pr - ((l >> 16) & 0xff)) +
                  math.abs(pg - ((l >> 8) & 0xff)) + math.abs(pb - (l & 0xff))
                val dt = math.abs(pa - (t >>> 24)) + math.abs(pr - ((t >> 16) & 0xff)) +
                  math.abs(pg - ((t >> 8) & 0xff)) + math.abs(pb - (t & 0xff))
                if (dl < dt) l else t
              case 12 => // ClampAddSubtractFull
                (clamp((l >>> 24) + (t >>> 24) - (tl >>> 24)) << 24) |
                  (clamp(((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)) << 16) |
                  (clamp(((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)) << 8) |
                  clamp((l & 0xff) + (t & 0xff) - (tl & 0xff))
              case 13 => // ClampAddSubtractHalf
                val ave = avg2(l, t)
                def half(shift: Int): Int = {
                  val a = (ave >>> shift) & 0xff
                  val b = (tl >>> shift) & 0xff
                  clamp(a + (a - b) / 2)
                }
                (half(24) << 24) | (half(16) << 16) | (half(8) << 8) | half(0)
              case _ => bad()
            }
          }
        // add residual (stored pixel) per channel, mod 256
        val r = img(pos)
        img(pos) =
          ((((r >>> 24) + (predicted >>> 24)) & 0xff) << 24) |
            (((((r >> 16) & 0xff) + ((predicted >> 16) & 0xff)) & 0xff) << 16) |
            (((((r >> 8) & 0xff) + ((predicted >> 8) & 0xff)) & 0xff) << 8) |
            (((r & 0xff) + (predicted & 0xff)) & 0xff)
        x += 1
      }
      y += 1
    }
  }

  private def applyInverseColorTransform(img: Array[Int], w: Int, h: Int,
      sizeBits: Int, tiles: Array[Int]): Unit = {
    val tilesPerRow = divRoundUp(w, sizeBits)
    // cte delta: signed 3.5 fixed-point times signed channel, >> 5
    def delta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val cte = tiles((y >> sizeBits) * tilesPerRow + (x >> sizeBits))
        val greenToRed = cte & 0xff
        val greenToBlue = (cte >> 8) & 0xff
        val redToBlue = (cte >> 16) & 0xff
        val p = img(pos)
        val g = (p >> 8) & 0xff
        var r = (p >> 16) & 0xff
        var b = p & 0xff
        r = (r + delta(greenToRed, g)) & 0xff
        b = (b + delta(greenToBlue, g)) & 0xff
        b = (b + delta(redToBlue, r)) & 0xff
        img(pos) = (p & 0xff000000) | (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
  }

  private def applyColorIndexing(img: Array[Int], origW: Int, h: Int,
      packedW: Int, widthBits: Int, palette: Array[Int]): Array[Int] = {
    if (widthBits == 0) {
      // plain palette lookup on the green channel
      val out = new Array[Int](img.length)
      var i = 0
      while (i < img.length) {
        val idx = (img(i) >> 8) & 0xff
        out(i) = if (idx < palette.length) palette(idx) else 0
        i += 1
      }
      out
    } else {
      val bitsPerIndex = 8 >> widthBits
      val mask = (1 << bitsPerIndex) - 1
      val out = new Array[Int](origW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < origW) {
          val packed = img(y * packedW + (x >> widthBits))
          val shift = (x & ((1 << widthBits) - 1)) * bitsPerIndex
          val idx = ((packed >> 8) >> shift) & mask
          out(y * origW + x) = if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
