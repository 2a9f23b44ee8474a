package graft.llmops

/** Dependency-free FLAC frame codec — the decode path that makes
  * compressed audio PERCEPTUALLY visible ([[Multimodal.audioEnvelopeHash]]
  * previously saw WAV PCM only, so a FLAC re-encode of a recording was
  * invisible to acoustic near-dup; the VP8L-WebP precedent for images).
  * Public format: the FLAC bitstream specification (RFC 9639 /
  * xiph.org); no external library, the [[Webp]] discipline.
  *
  * Decode scope (stated): all four subframe types (constant, verbatim,
  * fixed orders 0–4, LPC orders 1–32), rice/rice2 residual partitions
  * including the escape (unencoded) form, wasted bits, all four channel
  * assignments (independent, left/side, right/side, mid/side), 4–32 bit
  * sample sizes, both blocking strategies. CRC-8/CRC-16 are NOT
  * verified — a torn or corrupt frame ends the decode with the parsed
  * prefix, the [[Multimodal.audioDims]] mp3-walk degrade contract
  * (verification guards transport, not semantics; transport integrity
  * is the reader quarantine's job).
  *
  * Encode scope: [[encodeVerbatim]] — a real (if size-naive) FLAC
  * writer emitting verbatim subframes, used as the lossless export path
  * and as the fixture builder the oracle/spec parity laws are built on
  * (a WAV and its FLAC re-encode must produce the identical envelope
  * signature).
  *
  * Scale: pure per-payload CPU inside the mapPartitions codec boundary —
  * no plan or shuffle impact; a crafted payload is bounded by the
  * [[MaxTotalSamples]] cap (decode stops with the prefix, never OOMs a
  * task).
  */
object Flac {

  /** Decoded PCM: per-CHANNEL sample arrays (planar), plus the stream
    * parameters the samples are scaled in.
    */
  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Array[Int]])

  /** Hard cap on decoded samples per payload (per channel): a crafted
    * stream of constant subframes yields ~65k samples per ~16 header
    * bytes, so the cap — not the payload length — bounds task memory.
    */
  private val MaxTotalSamples: Int = 1 << 26

  private final class BitReader(data: Array[Byte]) {
    private val endBits: Long = data.length.toLong * 8L
    var pos: Long = 0L
    def remaining: Long = endBits - pos
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = (pos >> 3).toInt
        val bitI = 7 - (pos & 7).toInt
        v = (v << 1) | ((data(byteI) >> bitI) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def u64(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val byteI = (pos >> 3).toInt
        val bitI = 7 - (pos & 7).toInt
        v = (v << 1) | ((data(byteI) >> bitI) & 1).toLong
        pos += 1
        i += 1
      }
      v
    }
    /** Sign-extended n-bit two's-complement read. */
    def s(n: Int): Int = {
      if (n == 0) return 0
      val v = u64(n)
      val sh = 64 - n
      ((v << sh) >> sh).toInt
    }
    /** Unary: zeros until the terminating 1 (the rice quotient). */
    def unary(): Int = {
      var q = 0
      while (u(1) == 0) q += 1
      q
    }
    def alignToByte(): Unit = pos = (pos + 7) & ~7L
  }

  /** Decode a FLAC payload to planar PCM. None when the magic or
    * STREAMINFO don't parse or no frame decodes; a mid-stream tear
    * returns the parsed prefix (the degrade contract).
    */
  def decode(payload: Array[Byte]): Option[FlacAudio] =
    try decodeImpl(payload)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(payload: Array[Byte]): Option[FlacAudio] = {
    if (payload.length < 42 ||
      new String(payload, 0, 4, "ISO-8859-1") != "fLaC") return None
    def u8(i: Int): Long = payload(i) & 0xffL
    // metadata block walk: STREAMINFO must be first (spec); the walk
    // skips the rest to the first audio frame
    var off = 4
    var last = false
    var rate = 0
    var channels = 0
    var bits = 0
    var total = 0L
    var first = true
    while (!last && off + 4 <= payload.length) {
      last = (u8(off) & 0x80L) != 0
      val tpe = (u8(off) & 0x7f).toInt
      val len = ((u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)).toInt
      if (off + 4 + len > payload.length) return None
      if (first) {
        if (tpe != 0 || len != 34) return None
        val p = off + 4
        rate = ((u8(p + 10) << 12) | (u8(p + 11) << 4) | (u8(p + 12) >> 4)).toInt
        channels = (((u8(p + 12) >> 1) & 0x7) + 1).toInt
        bits = ((((u8(p + 12) & 1) << 4) | (u8(p + 13) >> 4)) + 1).toInt
        total = ((u8(p + 13) & 0xf) << 32) | (u8(p + 14) << 24) |
          (u8(p + 15) << 16) | (u8(p + 16) << 8) | u8(p + 17)
        first = false
      }
      off += 4 + len
    }
    if (first || rate < 1 || channels < 1 || channels > 8 || bits < 4 ||
      bits > 32) return None
    val out = Array.fill(channels)(new scala.collection.mutable.ArrayBuffer[Int]())
    val br = new BitReader(payload)
    br.pos = off.toLong * 8
    var done = false
    while (!done) {
      decodeFrame(br, channels, bits) match {
        case Some(block) =>
          var c = 0
          while (c < channels) { out(c) ++= block(c); c += 1 }
          if (out(0).length >= MaxTotalSamples ||
            (total > 0 && out(0).length >= total)) done = true
        case None => done = true
      }
    }
    if (out(0).isEmpty) None
    else Some(FlacAudio(rate, channels, bits, out.map(_.toArray)))
  }

  /** One frame: header + one subframe per channel + inter-channel
    * reconstruction. None on sync loss / torn bits (ends the stream).
    */
  private def decodeFrame(br: BitReader, channels: Int,
      streamBits: Int): Option[Array[Array[Int]]] = {
    br.alignToByte()
    if (br.remaining < 32) return None
    if (br.u(14) != 0x3ffe) return None // sync 11111111111110
    br.u(1) // reserved
    br.u(1) // blocking strategy
    val bsCode = br.u(4)
    val srCode = br.u(4)
    val chAsgn = br.u(4)
    val ssCode = br.u(3)
    br.u(1) // reserved
    // UTF-8-coded frame/sample number: 1-7 bytes by leading-ones count
    val lead = br.u(8)
    var extra = 0
    var l = lead
    while ((l & 0x80) != 0) { extra += 1; l <<= 1 }
    if (extra == 1 || extra > 6) return None
    var i = 0
    while (i < math.max(0, extra - 1)) {
      if (br.u(2) != 2) return None // continuation 10xxxxxx
      br.u(6)
      i += 1
    }
    val blockSize = bsCode match {
      case 0 => return None // reserved
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.u(8) + 1
      case 7 => br.u(16) + 1
      case c => 256 << (c - 8)
    }
    srCode match { // rate comes from STREAMINFO; inline forms skip
      case 12 => br.u(8)
      case 13 | 14 => br.u(16)
      case 15 => return None
      case _ => 0
    }
    br.u(8) // CRC-8 (not verified — the degrade contract)
    val nCh = if (chAsgn <= 7) chAsgn + 1 else 2
    if (nCh != channels) return None
    val sampleBits = ssCode match {
      case 0 => streamBits
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return None
    }
    if (blockSize < 1 || blockSize > 65536) return None
    val chans = new Array[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      // side channels carry one extra bit: left/side -> ch1, right/side
      // -> ch0, mid/side -> ch1
      val extraBit =
        if ((chAsgn == 8 && c == 1) || (chAsgn == 9 && c == 0) ||
          (chAsgn == 10 && c == 1)) 1
        else 0
      chans(c) = decodeSubframe(br, blockSize, sampleBits + extraBit)
        .getOrElse(return None)
      c += 1
    }
    // inter-channel reconstruction (the libFLAC forms)
    chAsgn match {
      case 8 => // left/side: right = left - side
        var i2 = 0
        while (i2 < blockSize) {
          chans(1)(i2) = chans(0)(i2) - chans(1)(i2); i2 += 1
        }
      case 9 => // right/side: left = side + right
        var i2 = 0
        while (i2 < blockSize) {
          val side = chans(0)(i2)
          chans(0)(i2) = side + chans(1)(i2)
          i2 += 1
        }
      case 10 => // mid/side
        var i2 = 0
        while (i2 < blockSize) {
          val side = chans(1)(i2)
          var mid = chans(0)(i2) << 1
          mid |= (side & 1)
          chans(0)(i2) = (mid + side) >> 1
          chans(1)(i2) = (mid - side) >> 1
          i2 += 1
        }
      case _ =>
    }
    br.alignToByte()
    if (br.remaining < 16) return None
    br.u(16) // CRC-16 (not verified)
    Some(chans)
  }

  private def decodeSubframe(br: BitReader, n: Int,
      bps: Int): Option[Array[Int]] = {
    if (br.remaining < 8) return None
    if (br.u(1) != 0) return None // mandatory zero pad
    val tpe = br.u(6)
    var wasted = 0
    if (br.u(1) == 1) wasted = br.unary() + 1
    val eBps = bps - wasted
    if (eBps < 1 || eBps > 33) return None
    val out: Array[Int] =
      if (tpe == 0) { // constant: ONE value read, replicated
        if (br.remaining < eBps) return None
        val v = br.s(eBps)
        Array.fill(n)(v)
      } else if (tpe == 1) { // verbatim
        if (br.remaining < n.toLong * eBps) return None
        Array.fill(n)(br.s(eBps))
      } else if (tpe >= 8 && tpe <= 12) { // fixed, order = tpe - 8
        val order = tpe - 8
        if (order > n) return None
        val a = new Array[Int](n)
        var i = 0
        while (i < order) { a(i) = br.s(eBps); i += 1 }
        if (!decodeResiduals(br, a, n, order)) return None
        restoreFixed(a, n, order)
        a
      } else if (tpe >= 32) { // LPC, order = tpe - 31
        val order = tpe - 31
        if (order > n) return None
        val a = new Array[Int](n)
        var i = 0
        while (i < order) { a(i) = br.s(eBps); i += 1 }
        if (br.remaining < 9) return None
        val precCode = br.u(4)
        if (precCode == 15) return None
        val precision = precCode + 1
        val shift = br.s(5)
        if (shift < 0) return None
        val coefs = new Array[Int](order)
        if (br.remaining < order.toLong * precision) return None
        i = 0
        while (i < order) { coefs(i) = br.s(precision); i += 1 }
        if (!decodeResiduals(br, a, n, order)) return None
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * a(i - 1 - j); j += 1 }
          a(i) += (acc >> shift).toInt
          i += 1
        }
        a
      } else return None
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  /** Rice-coded residual partitions into a(order until n). */
  private def decodeResiduals(br: BitReader, a: Array[Int], n: Int,
      order: Int): Boolean = {
    if (br.remaining < 6) return false
    val method = br.u(2)
    if (method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = br.u(4)
    val partitions = 1 << po
    // spec: blockSize divides evenly into 2^po partitions of n >> po
    // samples; the first partition is short by the predictor order
    val perPart = n >> po
    if ((perPart << po) != n || perPart < 1 || perPart < order) return false
    var idx = order
    var p = 0
    while (p < partitions) {
      val cnt = perPart - (if (p == 0) order else 0)
      if (br.remaining < paramBits) return false
      val param = br.u(paramBits)
      if (param == escape) {
        if (br.remaining < 5) return false
        val raw = br.u(5)
        var i = 0
        while (i < cnt) {
          if (br.remaining < raw) return false
          a(idx) = if (raw == 0) 0 else br.s(raw)
          idx += 1
          i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          if (br.remaining < 1) return false
          val q = br.unary()
          if (br.remaining < param) return false
          val r = if (param == 0) 0 else br.u(param)
          val v = (q << param) | r
          a(idx) = (v >>> 1) ^ -(v & 1) // zigzag
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    idx == n
  }

  /** The spec-pinned fixed-predictor reconstruction, orders 0-4. */
  private def restoreFixed(a: Array[Int], n: Int, order: Int): Unit = {
    var i = order
    order match {
      case 0 =>
      case 1 => while (i < n) { a(i) += a(i - 1); i += 1 }
      case 2 => while (i < n) { a(i) += 2 * a(i - 1) - a(i - 2); i += 1 }
      case 3 => while (i < n) {
        a(i) += 3 * a(i - 1) - 3 * a(i - 2) + a(i - 3); i += 1
      }
      case 4 => while (i < n) {
        a(i) += 4 * a(i - 1) - 6 * a(i - 2) + 4 * a(i - 3) - a(i - 4); i += 1
      }
      case _ =>
    }
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def alignZero(): Unit = if (nbits > 0) put(0L, 8 - nbits)
    def bytes: Array[Byte] = { alignZero(); buf.toArray }
  }

  /** The spec CRC-8 (poly 0x07) over the frame header — readers that DO
    * verify (unlike [[decode]]) must accept [[encodeVerbatim]] output.
    */
  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** The spec CRC-16 (poly 0x8005) over the whole frame. */
  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Encode INTERLEAVED PCM as a spec-conformant FLAC: fLaC magic +
    * STREAMINFO + fixed-size frames of VERBATIM subframes (independent
    * channels, CRCs computed for real). Size-naive by design — verbatim
    * never compresses — but byte-valid: a conforming decoder (including
    * [[decode]]) reproduces the samples EXACTLY, which is the property
    * the envelope-parity law runs on. Samples must fit `bits`
    * (two's complement); channels interleave frame-major like WAV data.
    */
  def encodeVerbatim(samples: Array[Int], channels: Int, rate: Int,
      bits: Int, blockSize: Int = 4096): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(rate >= 1 && rate < (1 << 20))
    require(bits >= 4 && bits <= 32)
    require(blockSize >= 16 && blockSize <= 65536)
    require(samples.length % channels == 0)
    val frames = samples.length / channels
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes("ISO-8859-1"))
    // STREAMINFO (last-metadata flag set)
    bos.write(0x80); bos.write(0); bos.write(0); bos.write(34)
    val minMaxBs = math.min(blockSize, math.max(frames, 16))
    bos.write(minMaxBs >> 8); bos.write(minMaxBs & 0xff)
    bos.write(minMaxBs >> 8); bos.write(minMaxBs & 0xff)
    (0 until 6).foreach(_ => bos.write(0)) // min/max frame size unknown
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | frames.toLong
    (0 until 8).foreach(i => bos.write(((packed >> (8 * (7 - i))) & 0xff).toInt))
    (0 until 16).foreach(_ => bos.write(0)) // md5 unset (zeros = unknown)
    var frameNo = 0L
    var s0 = 0
    while (s0 < frames) {
      val n = math.min(blockSize, frames - s0)
      val bw = new BitWriter()
      bw.put(0x3ffeL, 14) // sync
      bw.put(0L, 1) // reserved
      bw.put(0L, 1) // fixed blocking
      bw.put(7L, 4) // block size: 16-bit n-1 follows the header
      bw.put(0L, 4) // rate: from STREAMINFO
      bw.put((channels - 1).toLong, 4) // independent channels
      bw.put(0L, 3) // sample size: from STREAMINFO
      bw.put(0L, 1) // reserved
      // UTF-8 frame number (fixed blocking: frame index)
      putUtf8(bw, frameNo)
      bw.put((n - 1).toLong, 16)
      val headerBytes = bw.bytes // byte-aligned by construction
      val withCrc8 = headerBytes :+ crc8(headerBytes, 0,
        headerBytes.length).toByte
      val body = new BitWriter()
      var c = 0
      while (c < channels) {
        body.put(0L, 1) // pad
        body.put(1L, 6) // verbatim
        body.put(0L, 1) // no wasted bits
        var i = 0
        while (i < n) {
          body.put((samples((s0 + i) * channels + c).toLong &
            ((1L << bits) - 1)), bits)
          i += 1
        }
        c += 1
      }
      val frameBytes = withCrc8 ++ body.bytes
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      bos.write(frameBytes, 0, frameBytes.length)
      bos.write(c16 >> 8); bos.write(c16 & 0xff)
      s0 += n
      frameNo += 1
    }
    bos.toByteArray
  }

  /** The FLAC frame-header UTF-8-style coded number (RFC 9639 §9.1.5). */
  private def putUtf8(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.put(v, 8)
    else if (v < 0x800) {
      bw.put(0xc0L | (v >> 6), 8); bw.put(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      bw.put(0xe0L | (v >> 12), 8)
      bw.put(0x80L | ((v >> 6) & 0x3f), 8)
      bw.put(0x80L | (v & 0x3f), 8)
    } else {
      bw.put(0xf0L | (v >> 18), 8)
      bw.put(0x80L | ((v >> 12) & 0x3f), 8)
      bw.put(0x80L | ((v >> 6) & 0x3f), 8)
      bw.put(0x80L | (v & 0x3f), 8)
    }
  }
}
