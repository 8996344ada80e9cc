package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec: lossless round-trip over the generator's signal space,
  * container structure (magic/STREAMINFO/MD5), corruption detection (the
  * invariant's failure path), and decoder GENERALITY via hand-crafted
  * streams exercising paths the encoder never emits (escaped partitions,
  * partition order > 0, wasted bits). */
class FlacCodecSpec extends AnyFunSuite {

  private def sine(freq: Double, durMs: Int, sr: Int) =
    WavCodec.synthSineSamples(freq, durMs, sr)

  test("round-trip is bit-exact across the generator's sample rates") {
    for (sr <- Seq(8000, 16000, 22050, 44100, 48000); freq <- Seq(220.0, 659.0, 1099.0)) {
      val s = sine(freq, 25, sr)
      val (gotSr, got) = FlacCodec.decode(FlacCodec.encode(sr, s))
      assert(gotSr === sr)
      assert(got === s, s"sr=$sr freq=$freq")
    }
  }

  test("round-trip is bit-exact for constant, ramp, and hash-noise signals") {
    val const = Array.fill[Short](200)(1234)
    val ramp = Array.tabulate[Short](500)(i => (i * 37 - 9000).toShort)
    val noise = Array.tabulate[Short](1000)(i =>
      (graft.io.ClipsGenerator.mix(i.toLong) & 0xFFFF).toShort)
    val extremes = Array.tabulate[Short](100)(i =>
      if (i % 2 == 0) Short.MaxValue else Short.MinValue)
    for (s <- Seq(const, ramp, noise, extremes)) {
      val (_, got) = FlacCodec.decode(FlacCodec.encode(16000, s))
      assert(got === s)
    }
  }

  test("compression is real on tonal input (not verbatim-in-disguise)") {
    val s = sine(440.0, 25, 48000) // 1200 samples = 2400 raw bytes
    val enc = FlacCodec.encode(48000, s)
    assert(enc.length < s.length * 2,
      s"flac ${enc.length}B not smaller than raw ${s.length * 2}B")
  }

  test("container structure: magic, STREAMINFO fields, raw-PCM MD5") {
    val s = sine(440.0, 25, 16000)
    val enc = FlacCodec.encode(16000, s)
    assert(new String(enc.slice(0, 4), "US-ASCII") === "fLaC")
    assert((enc(4) & 0xFF) === 0x80) // last-metadata-block, type STREAMINFO
    assert(enc(7) === 34) // STREAMINFO length
    // sample rate u20 starting at byte 8+10: bytes 18,19,20(top 4 bits)
    val sr = ((enc(18) & 0xFF) << 12) | ((enc(19) & 0xFF) << 4) | ((enc(20) & 0xFF) >> 4)
    assert(sr === 16000)
    // MD5 (bytes 26..41 of STREAMINFO) = MD5 of little-endian PCM
    val pcmLe = new Array[Byte](s.length * 2)
    s.indices.foreach { i =>
      pcmLe(2 * i) = (s(i) & 0xFF).toByte
      pcmLe(2 * i + 1) = ((s(i) >> 8) & 0xFF).toByte
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcmLe)
    assert(enc.slice(26, 42) === md5)
  }

  test("zeroed back half (the generator's corruption) fails decode loudly") {
    val s = sine(659.0, 25, 44100)
    val enc = FlacCodec.encode(44100, s)
    val corrupted = enc.clone()
    var k = 44 + (corrupted.length - 44) / 2 // ClipsGenerator.injectErrors shape
    while (k < corrupted.length) { corrupted(k) = 0; k += 1 }
    intercept[Exception](FlacCodec.decode(corrupted))
  }

  test("truncation and bad magic fail decode") {
    val enc = FlacCodec.encode(16000, sine(440.0, 25, 16000))
    intercept[Exception](FlacCodec.decode(enc.take(enc.length / 2)))
    intercept[Exception](FlacCodec.decode(Array[Byte](1, 2, 3)))
    val badMagic = enc.clone(); badMagic(0) = 'X'
    intercept[Exception](FlacCodec.decode(badMagic))
  }

  test("flipped payload bit is caught by the frame CRC") {
    val enc = FlacCodec.encode(16000, sine(440.0, 25, 16000))
    val flipped = enc.clone()
    flipped(enc.length - 10) = (flipped(enc.length - 10) ^ 0x10).toByte
    // either the CRC-16 rejects it or a decode guard trips — never a
    // silently-wrong success
    val r = scala.util.Try(FlacCodec.decode(flipped))
    assert(r.isFailure || r.get._2.sameElements(
      WavCodec.synthSineSamples(440.0, 25, 16000)) === false)
  }

  // ---- hand-crafted streams: decoder paths our encoder never emits ----

  /** Minimal big-endian bit writer for crafting test streams. */
  private final class Bits {
    val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (n != 0) put(0, 1)
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  private def streamInfo(b: Bits, blockSize: Int, sr: Int, total: Int): Unit = {
    b.put('f', 8); b.put('L', 8); b.put('a', 8); b.put('C', 8)
    b.put(1, 1); b.put(0, 7); b.put(34, 24) // last block, STREAMINFO, len
    b.put(blockSize.toLong, 16); b.put(blockSize.toLong, 16)
    b.put(0, 24); b.put(0, 24)
    b.put(sr.toLong, 20); b.put(0, 3); b.put(15, 5); b.put(total.toLong, 36)
    (1 to 16).foreach(_ => b.put(0, 8)) // MD5 unset (all zero = unknown)
  }

  private def frameHeader(b: Bits, blockSize: Int, frameStart: Int): Unit = {
    b.put(0x3FFE, 14); b.put(0, 1); b.put(0, 1)
    b.put(7, 4) // 16-bit block size follows
    b.put(0, 4) // sr from STREAMINFO
    b.put(0, 4) // mono
    b.put(4, 3) // 16-bit
    b.put(0, 1)
    b.put(0, 8) // frame number 0
    b.put((blockSize - 1).toLong, 16)
    val hdr = b.bytes
    b.put(FlacCodec.crc8(hdr, frameStart, hdr.length).toLong, 8)
  }

  private def finishFrame(b: Bits, frameStartByte: Int): Array[Byte] = {
    b.align()
    val soFar = b.bytes
    b.put(FlacCodec.crc16(soFar, frameStartByte, soFar.length).toLong, 16)
    b.bytes
  }

  test("decoder handles escaped (raw-binary) residual partitions") {
    val samples = Array.tabulate[Short](16)(i => (i * 1000 - 8000).toShort)
    val b = new Bits
    streamInfo(b, 16, 16000, 16)
    val frameStart = b.bytes.length
    frameHeader(b, 16, frameStart)
    // subframe: FIXED order 0, no wasted bits
    b.put(0, 1); b.put(8, 6); b.put(0, 1)
    // residual: method 0 (4-bit params), partition order 0, param 15 = ESCAPE
    b.put(0, 2); b.put(0, 4); b.put(15, 4)
    b.put(16, 5) // raw 16 bits per residual
    samples.foreach(s => b.put(s.toLong & 0xFFFF, 16))
    val stream = finishFrame(b, frameStart)
    val (sr, got) = FlacCodec.decode(stream)
    assert(sr === 16000)
    assert(got === samples)
  }

  test("decoder handles partition order > 0") {
    // FIXED order 1: warmup s(0); residuals r_i = s_i - s_{i-1}; 2 rice
    // partitions of (8-1) and 8 residuals, params 2 and 3
    val samples = Array.tabulate[Short](16)(i => (100 + 3 * i).toShort)
    val b = new Bits
    streamInfo(b, 16, 8000, 16)
    val frameStart = b.bytes.length
    frameHeader(b, 16, frameStart)
    b.put(0, 1); b.put(9, 6); b.put(0, 1) // FIXED order 1
    b.put(samples(0).toLong & 0xFFFF, 16) // warmup
    b.put(0, 2); b.put(1, 4) // method 0, partition order 1
    def rice(v: Long, k: Int): Unit = {
      val u = (v << 1) ^ (v >> 63)
      var q = (u >>> k).toInt
      while (q > 0) { b.put(0, 1); q -= 1 }
      b.put(1, 1)
      if (k > 0) b.put(u & ((1L << k) - 1), k)
    }
    b.put(2, 4) // partition 1 param
    (1 until 8).foreach(i => rice(samples(i) - samples(i - 1).toLong, 2))
    b.put(3, 4) // partition 2 param
    (8 until 16).foreach(i => rice(samples(i) - samples(i - 1).toLong, 3))
    val stream = finishFrame(b, frameStart)
    assert(FlacCodec.decode(stream)._2 === samples)
  }

  test("decoder handles LPC subframes") {
    // order-2 LPC, coefs (2, -1), shift 1: s[i] = r + ((2*s[i-1] - s[i-2]) >> 1)
    val n = 16
    val samples = new Array[Short](n)
    samples(0) = 100; samples(1) = 140
    val res = Array.tabulate(n - 2)(i => (i % 5 - 2).toLong)
    (2 until n).foreach { j =>
      samples(j) = (res(j - 2) + ((2 * samples(j - 1) - samples(j - 2)) >> 1)).toShort
    }
    val b = new Bits
    streamInfo(b, n, 8000, n)
    val frameStart = b.bytes.length
    frameHeader(b, n, frameStart)
    b.put(0, 1); b.put(32 + 1, 6); b.put(0, 1) // LPC, order = (type & 31) + 1 = 2
    b.put(samples(0).toLong & 0xFFFF, 16) // warmups
    b.put(samples(1).toLong & 0xFFFF, 16)
    b.put(4, 4) // precision - 1 = 4 → 5-bit coefficients
    b.put(1, 5) // shift = 1 (signed 5-bit, positive)
    b.put(2 & 0x1F, 5) // coef[0] = 2 (applies to s[i-1])
    b.put(-1 & 0x1F, 5) // coef[1] = -1 (applies to s[i-2])
    b.put(0, 2); b.put(0, 4); b.put(2, 4) // rice method 0, po 0, k=2
    res.foreach { v =>
      val u = (v << 1) ^ (v >> 63)
      var q = (u >>> 2).toInt
      while (q > 0) { b.put(0, 1); q -= 1 }
      b.put(1, 1)
      b.put(u & 3, 2)
    }
    val stream = finishFrame(b, frameStart)
    assert(FlacCodec.decode(stream)._2 === samples)
  }

  test("decoder honors wasted bits") {
    // CONSTANT subframe, 1 wasted bit: stored value 300 at 15 bits → 600
    val b = new Bits
    streamInfo(b, 16, 8000, 16)
    val frameStart = b.bytes.length
    frameHeader(b, 16, frameStart)
    b.put(0, 1); b.put(0, 6) // CONSTANT
    b.put(1, 1) // wasted-bits flag
    b.put(1, 1) // unary 0 → wasted = 1
    b.put(300, 15) // effective bps 15
    val stream = finishFrame(b, frameStart)
    val (_, got) = FlacCodec.decode(stream)
    assert(got === Array.fill[Short](16)(600))
  }

  test("AudioCodec dispatch: every label routes to its own real decoder") {
    val s = sine(330.0, 25, 22050)
    val flacBytes = FlacCodec.encode(22050, s)
    val (sr, got) = AudioCodec.decode(flacBytes, "flac")
    assert(sr === 22050 && got === s)
    // bytes of one codec under another codec's label must NOT parse —
    // each container/format check rejects foreign bytes loudly
    intercept[Exception](AudioCodec.decode(flacBytes, "pcm_mulaw"))
    intercept[Exception](AudioCodec.decode(flacBytes, "pcm_s16le"))
    intercept[Exception](
      AudioCodec.decode(G711Codec.encodeMuLaw(22050, s), "pcm_alaw"))
    intercept[Exception](
      AudioCodec.decode(WavCodec.synthSine(330.0, 25, 22050), "adpcm_ima"))
    // the retired stub labels are gone, not silently WAV-parsed
    intercept[IllegalArgumentException](
      AudioCodec.decode(WavCodec.synthSine(330.0, 25, 22050), "mp3"))
    intercept[IllegalArgumentException](
      AudioCodec.decode(WavCodec.synthSine(330.0, 25, 22050), "opus"))
  }

  test("fuzz: seeded-random signals round-trip bit-exact (300 cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // signal generator spanning the subframe space: constant / near-constant
    // (CONSTANT + low-k rice), smooth ramps+sines (FIXED orders), white
    // noise (high k / verbatim), extreme values, with lengths 16..4000
    val sigGen: Gen[Array[Short]] = for {
      n <- Gen.chooseNum(16, 4000)
      kind <- Gen.chooseNum(0, 4)
      base <- Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield kind match {
      case 0 => Array.fill[Short](n)(base.toShort)
      case 1 => Array.tabulate[Short](n)(i => (base + i % 7 - 3).toShort)
      case 2 => Array.tabulate[Short](n)(i =>
        (math.sin(i * 0.05 + base) * 12000).toShort)
      case 3 => Array.tabulate[Short](n)(i =>
        (graft.io.ClipsGenerator.mix(seed + i) & 0xFFFF).toShort)
      case 4 => Array.tabulate[Short](n)(i =>
        if ((graft.io.ClipsGenerator.mix(seed + i) & 1) == 0) Short.MinValue
        else Short.MaxValue)
    }
    (0 until 300).foreach { c =>
      sigGen.apply(Gen.Parameters.default, Seed(1234L + c)).foreach { s =>
        val (sr, got) = FlacCodec.decode(FlacCodec.encode(16000, s))
        assert(sr === 16000)
        assert(got === s, s"case $c len=${s.length}")
      }
    }
  }

  test("generator flac rows: real FLAC payload, lossless vs the reference PCM") {
    import graft.io.ClipsGenerator
    // find a few flac rows deterministically
    val flacRows = (0L until 2000L).filter(ClipsGenerator.codec(_) == "flac").take(5)
    assert(flacRows.nonEmpty)
    for (i <- flacRows) {
      val c = ClipsGenerator.clip(i, maxSynthMs = 25)
      assert(new String(c.bytes.slice(0, 4), "US-ASCII") === "fLaC")
      val (sr, decoded) = AudioCodec.decode(c.bytes, "flac")
      val (refSr, ref) = WavCodec.decodePcm16(
        ClipsGenerator.referenceBytes(i, maxSynthMs = 25))
      assert(sr === refSr)
      assert(WavCodec.snrDb(ref, decoded) === WavCodec.MaxSnrDb) // lossless
    }
  }
}
