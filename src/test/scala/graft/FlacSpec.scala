package graft

import graft.llmops.{Flac, Multimodal}

/** Round-15 FLAC codec: the dependency-free frame decoder that makes
  * compressed audio perceptually visible, plus the verbatim encoder
  * both parity laws ride on. Fixtures are hand-assembled bit streams
  * per RFC 9639 (the WebpSpec BitWriter discipline) — every expected
  * sample is computed by hand from the spec's reconstruction formulas.
  */
class FlacSpec extends SparkTestBase {

  private def s(t: String): Array[Byte] = t.getBytes("ISO-8859-1")

  /** STREAMINFO-only prefix: rate/channels/bits/total, zero md5. */
  private def streamInfo(rate: Long, ch: Long, bits: Long,
      total: Long): Array[Byte] = {
    val packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    s("fLaC") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      Array[Byte](0x10, 0x00, 0x10, 0x00) ++ new Array[Byte](6) ++
      (0 until 8).map(i => ((packed >> (8 * (7 - i))) & 0xff).toByte).toArray ++
      new Array[Byte](16)
  }

  private final class BW {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def put(v: Long, bits: Int): BW = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i -= 1
      }
      this
    }
    def bytes: Array[Byte] = {
      if (n > 0) put(0L, 8 - n)
      buf.toArray
    }
  }

  /** One frame header: sync, fixed blocking, 8-bit blocksize form,
    * rate-from-streaminfo, the given channel assignment, size from
    * streaminfo, frame number 0, unverified CRC byte.
    */
  private def frameHeader(bw: BW, n: Int, chAsgn: Int): BW =
    bw.put(0x3ffeL, 14).put(0L, 1).put(0L, 1)
      .put(6L, 4).put(0L, 4)
      .put(chAsgn.toLong, 4).put(0L, 3).put(0L, 1)
      .put(0L, 8) // UTF-8 frame number 0
      .put((n - 1).toLong, 8)
      .put(0L, 8) // CRC-8 placeholder (decode does not verify)

  private def withCrc16(body: BW): Array[Byte] = body.put(0L, 16).bytes

  test("constant / verbatim / fixed / LPC subframes reconstruct the " +
      "hand-computed samples; rice, partitions, escape, wasted bits") {
    // constant: 4 samples of 7 (mono, 8-bit)
    val const = streamInfo(8000L, 1L, 8L, 4L) ++ withCrc16(
      frameHeader(new BW, 4, 0)
        .put(0L, 1).put(0L, 6).put(0L, 1) // pad, type constant, no wasted
        .put(7L, 8))
    assert(Flac.decode(const).map(_.samples(0).toSeq) === Some(Seq(7, 7, 7, 7)))
    // verbatim incl. a negative sample (two's complement)
    val verb = streamInfo(8000L, 1L, 8L, 3L) ++ withCrc16(
      frameHeader(new BW, 3, 0)
        .put(0L, 1).put(1L, 6).put(0L, 1)
        .put(5L, 8).put(0xfbL, 8).put(7L, 8)) // 5, -5, 7
    assert(Flac.decode(verb).map(_.samples(0).toSeq) === Some(Seq(5, -5, 7)))
    // fixed order 1, warmup 5, rice(param 1) residuals +1,+1,+1:
    // zigzag(1)=2 -> q=1 ("01") + r=0 -> "010" each
    val fixed = streamInfo(8000L, 1L, 8L, 4L) ++ withCrc16(
      frameHeader(new BW, 4, 0)
        .put(0L, 1).put(9L, 6).put(0L, 1) // type 001001 = fixed order 1
        .put(5L, 8) // warmup
        .put(0L, 2).put(0L, 4) // rice4 method, partition order 0
        .put(1L, 4) // rice param 1
        .put(2L, 3).put(2L, 3).put(2L, 3)) // "010" x3
    assert(Flac.decode(fixed).map(_.samples(0).toSeq) === Some(Seq(5, 6, 7, 8)))
    // fixed order 2: warmup 1, 2; residuals 0 -> a(i) = 2a(i-1) - a(i-2)
    // (the linear ramp) with param 0: zigzag(0)=0 -> unary "1"
    val fixed2 = streamInfo(8000L, 1L, 8L, 4L) ++ withCrc16(
      frameHeader(new BW, 4, 0)
        .put(0L, 1).put(10L, 6).put(0L, 1)
        .put(1L, 8).put(2L, 8)
        .put(0L, 2).put(0L, 4).put(0L, 4)
        .put(1L, 1).put(1L, 1)) // two zero residuals
    assert(Flac.decode(fixed2).map(_.samples(0).toSeq) === Some(Seq(1, 2, 3, 4)))
    // LPC order 1: coef 2, shift 1 -> pred = (2*prev)>>1 = prev;
    // precision code 4 -> 5-bit coefs; residuals +1 as above
    val lpc = streamInfo(8000L, 1L, 8L, 4L) ++ withCrc16(
      frameHeader(new BW, 4, 0)
        .put(0L, 1).put(32L, 6).put(0L, 1) // LPC order 1
        .put(5L, 8) // warmup
        .put(4L, 4) // precision 5
        .put(1L, 5) // shift 1
        .put(2L, 5) // coef 2
        .put(0L, 2).put(0L, 4).put(1L, 4)
        .put(2L, 3).put(2L, 3).put(2L, 3))
    assert(Flac.decode(lpc).map(_.samples(0).toSeq) === Some(Seq(5, 6, 7, 8)))
    // two rice partitions (order 1, n=4, pred order 1): partition 0
    // holds 1 residual, partition 1 holds 2, different params
    val part = streamInfo(8000L, 1L, 8L, 4L) ++ withCrc16(
      frameHeader(new BW, 4, 0)
        .put(0L, 1).put(9L, 6).put(0L, 1)
        .put(5L, 8)
        .put(0L, 2).put(1L, 4) // partition order 1
        .put(0L, 4).put(1L, 1) // p0: param 0, one zero residual
        .put(1L, 4).put(2L, 3).put(2L, 3)) // p1: param 1, +1 +1
    assert(Flac.decode(part).map(_.samples(0).toSeq) === Some(Seq(5, 5, 6, 7)))
    // escape partition: raw 4-bit residuals, fixed order 0 -> samples
    // ARE the residuals; -3 = 1101 two's complement
    val esc = streamInfo(8000L, 1L, 8L, 2L) ++ withCrc16(
      frameHeader(new BW, 2, 0)
        .put(0L, 1).put(8L, 6).put(0L, 1) // fixed order 0
        .put(0L, 2).put(0L, 4).put(15L, 4) // escape
        .put(4L, 5) // raw width 4
        .put(0xdL, 4).put(0xdL, 4))
    assert(Flac.decode(esc).map(_.samples(0).toSeq) === Some(Seq(-3, -3)))
    // wasted bits: flag 1, unary 0 -> wasted 1; constant 3 at 7 bits
    // reconstructs 3 << 1 = 6
    val wasted = streamInfo(8000L, 1L, 8L, 2L) ++ withCrc16(
      frameHeader(new BW, 2, 0)
        .put(0L, 1).put(0L, 6).put(1L, 1).put(1L, 1)
        .put(3L, 7))
    assert(Flac.decode(wasted).map(_.samples(0).toSeq) === Some(Seq(6, 6)))
  }

  test("inter-channel decorrelation: left/side, right/side, mid/side " +
      "reconstruct the hand-computed stereo pair; side carries bps+1") {
    val left = Seq(10, 12)
    val right = Seq(4, 6)
    val side = Seq(6, 6) // l - r
    val mid = Seq(7, 9) // (l + r) >> 1
    def verbatim(bw: BW, xs: Seq[Int], bits: Int): BW = {
      bw.put(0L, 1).put(1L, 6).put(0L, 1)
      xs.foreach(v => bw.put(v.toLong & ((1L << bits) - 1), bits))
      bw
    }
    // left/side (chAsgn 8): ch0 = left @8, ch1 = side @9
    val ls = streamInfo(8000L, 2L, 8L, 2L) ++ withCrc16(
      verbatim(verbatim(frameHeader(new BW, 2, 8), left, 8), side, 9))
    val lsGot = Flac.decode(ls).get
    assert(lsGot.samples(0).toSeq === left)
    assert(lsGot.samples(1).toSeq === right)
    // right/side (chAsgn 9): ch0 = side @9, ch1 = right @8
    val rs = streamInfo(8000L, 2L, 8L, 2L) ++ withCrc16(
      verbatim(verbatim(frameHeader(new BW, 2, 9), side, 9), right, 8))
    val rsGot = Flac.decode(rs).get
    assert(rsGot.samples(0).toSeq === left)
    assert(rsGot.samples(1).toSeq === right)
    // mid/side (chAsgn 10): ch0 = mid @8, ch1 = side @9
    val ms = streamInfo(8000L, 2L, 8L, 2L) ++ withCrc16(
      verbatim(verbatim(frameHeader(new BW, 2, 10), mid, 8), side, 9))
    val msGot = Flac.decode(ms).get
    assert(msGot.samples(0).toSeq === left)
    assert(msGot.samples(1).toSeq === right)
  }

  test("degrade contract: STREAMINFO-only -> None; a torn second frame " +
      "keeps the first frame's samples; garbage tail ends the walk") {
    assert(Flac.decode(streamInfo(8000L, 1L, 8L, 80L)).isEmpty)
    val one = withCrc16(frameHeader(new BW, 4, 0)
      .put(0L, 1).put(0L, 6).put(0L, 1).put(7L, 8))
    val full = streamInfo(8000L, 1L, 8L, 0L) ++ one ++ one
    assert(Flac.decode(full).map(_.samples(0).length) === Some(8))
    val torn = full.dropRight(3)
    assert(Flac.decode(torn).map(_.samples(0).toSeq) === Some(Seq(7, 7, 7, 7)))
    val garbage = streamInfo(8000L, 1L, 8L, 0L) ++ one ++ s("not a frame")
    assert(Flac.decode(garbage).map(_.samples(0).length) === Some(4))
  }

  test("encodeVerbatim round trip: multi-frame stereo 16-bit recovers " +
      "every sample exactly; a spec-conformant header walk accepts it") {
    val frames = 5000 // 2 frames at the 4096 default block size
    val samples = Array.tabulate(frames * 2)(i =>
      (math.sin(i * 0.01) * 12345).toInt)
    val flac = Flac.encodeVerbatim(samples, channels = 2, rate = 44100,
      bits = 16)
    assert(Multimodal.detectKind(flac) === "flac")
    val got = Flac.decode(flac).get
    assert(got.sampleRate === 44100)
    assert(got.channels === 2)
    assert(got.bits === 16)
    assert(got.samples(0).length === frames)
    var i = 0
    while (i < frames) {
      assert(got.samples(0)(i) === samples(2 * i), s"L frame $i")
      assert(got.samples(1)(i) === samples(2 * i + 1), s"R frame $i")
      i += 1
    }
    // the headers-only walk agrees with the decode
    val meta = Multimodal.audioDims(flac).get
    assert(meta.sample_rate === 44100L)
    assert(meta.channels === 2L)
    assert(meta.n_samples === frames.toLong)
  }

  test("ENVELOPE PARITY LAW: a FLAC re-encode of a WAV produces the " +
      "identical mono stream and the identical 64-bit envelope signature") {
    // a square wave with enough structure for a nonzero envelope
    val n = 4096
    val samples = Array.tabulate(n)(i => if ((i / 64) % 2 == 0) 9000 else -120)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def le16(v: Int): Unit = (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write(s("RIFF")); le32(4 + 24 + 8 + 2 * n); bos.write(s("WAVE"))
    bos.write(s("fmt ")); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    bos.write(s("data")); le32(2 * n)
    samples.foreach(le16)
    val wav = bos.toByteArray
    val flac = Flac.encodeVerbatim(samples, channels = 1, rate = 8000,
      bits = 16)
    val wavMono = Multimodal.wavMonoSamples(wav).get
    val flacMono = Multimodal.flacMonoSamples(flac).get
    assert(flacMono.toSeq === wavMono.toSeq, "lossless => identical stream")
    val hw = Multimodal.audioEnvelopeHash(wav)
    val hf = Multimodal.audioEnvelopeHash(flac)
    assert(hw.isDefined && hw != Some(0L))
    assert(hf === hw, "the envelope signature must survive re-encoding")
  }

  test("routedFeatures decodes flac FOR REAL (decoded=true) and the " +
      "coverage gauge flips; a frame-less STREAMINFO stays stubbed") {
    import spark.implicits._
    val real = Flac.encodeVerbatim(Array.tabulate(256)(i => i - 128),
      channels = 1, rate = 8000, bits = 16)
    val headerOnly = streamInfo(8000L, 1L, 16L, 80L)
    val media = Seq((1L, real), (2L, headerOnly)).toDF("media_id", "payload")
    val out = Multimodal.routedFeatures(media).collect()
      .map(r => r.media_id -> ((r.kind, r.decoded))).toMap
    assert(out(1L) === (("flac", true)))
    assert(out(2L) === (("flac", false)))
    val cov = Multimodal.decodeCoverage(media).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("stub_ppm")).toMap
    assert(cov === Map("flac" -> 500000L))
  }
}
