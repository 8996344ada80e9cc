package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch lossy codecs: ITU-T G.711 µ-law/A-law and IMA 4-bit ADPCM
  * (round-4 verdict #3 — the invariant's sub-30 dB failure path was
  * previously only reachable via corrupt bytes; clean lossy rows now
  * exercise the finite-SNR region between threshold and cap). */
class LossyCodecsSpec extends AnyFunSuite {

  private def sine(f: Double, ms: Int, sr: Int) =
    WavCodec.synthSineSamples(f, ms, sr)

  // ---- G.711 canonical code points (ITU-T G.711 tables / the classic
  // public-domain reference implementation's values)

  test("µ-law canonical values: zero, full-scale, negative full-scale") {
    assert(G711Codec.linearToMuLaw(0) === 0xFF.toByte)
    assert(G711Codec.muLawToLinear(0xFF.toByte) === 0)
    assert(G711Codec.linearToMuLaw(Short.MaxValue) === 0x80.toByte)
    assert(G711Codec.muLawToLinear(0x80.toByte) === 32124)
    assert(G711Codec.linearToMuLaw(Short.MinValue) === 0x00.toByte)
    assert(G711Codec.muLawToLinear(0x00.toByte) === -32124)
  }

  test("A-law canonical values: zero code 0xD5, full-scale decode ±32256") {
    assert(G711Codec.linearToALaw(0) === 0xD5.toByte)
    // A-law is mid-riser: the zero code decodes to +8, not 0
    assert(G711Codec.aLawToLinear(0xD5.toByte) === 8)
    assert(G711Codec.aLawToLinear(0xAA.toByte) === 32256)
    assert(G711Codec.aLawToLinear(0x2A.toByte) === -32256)
    assert(G711Codec.linearToALaw(Short.MaxValue) === 0xAA.toByte)
  }

  test("µ-law code idempotence: encode(decode(b)) == b for all codes but -0") {
    // every decoded quantization level must re-encode to its own code —
    // the strongest self-consistency check of the segment/mantissa layout.
    // The one exception is 0x7F ("negative zero"), which decodes to 0 and
    // re-encodes to the positive zero code 0xFF (a G.711 fact, not a bug).
    (0 to 255).filter(_ != 0x7F).foreach { b =>
      val lvl = G711Codec.muLawToLinear(b.toByte)
      assert(G711Codec.linearToMuLaw(lvl) === b.toByte, s"code $b level $lvl")
    }
    assert(G711Codec.linearToMuLaw(G711Codec.muLawToLinear(0x7F.toByte)) ===
      0xFF.toByte)
  }

  test("A-law code idempotence: encode(decode(b)) == b for all 256 codes") {
    (0 to 255).foreach { b =>
      val lvl = G711Codec.aLawToLinear(b.toByte)
      assert(G711Codec.linearToALaw(lvl) === b.toByte, s"code $b level $lvl")
    }
  }

  // ---- SNR floors over the generator's parameter space (the q25 oracle
  // depends on every CLEAN row clearing the 30 dB invariant; full-space
  // sweep measured mins: µ-law 33.83 dB, A-law 34.94 dB, both at the
  // worst f/sr=0.125 combos — asserted here on the extreme corners)

  private val corners = for {
    sr <- Seq(8000, 16000, 22050, 44100, 48000)
    f <- Seq(220.0, 660.0, 997.0, 1000.0, 1099.0)
    cap <- Seq(25, 50)
  } yield (f, cap, sr)

  test("G.711 clean-signal SNR is finite, sub-cap, and above the 30 dB invariant") {
    corners.foreach { case (f, cap, sr) =>
      val ref = sine(f, cap, sr)
      val mu = WavCodec.snrDb(ref, G711Codec.decodeMuLaw(
        G711Codec.encodeMuLaw(sr, ref))._2)
      val al = WavCodec.snrDb(ref, G711Codec.decodeALaw(
        G711Codec.encodeALaw(sr, ref))._2)
      assert(mu >= 33.0 && mu < WavCodec.MaxSnrDb, s"mulaw f=$f sr=$sr: $mu dB")
      assert(al >= 34.0 && al < WavCodec.MaxSnrDb, s"alaw f=$f sr=$sr: $al dB")
    }
  }

  test("IMA ADPCM clean SNR clears its per-codec floor but not the global 30 dB") {
    // why adpcm_ima is validated under a PER-CODEC floor (8 dB, measured —
    // AdpcmBandSweep): at the generator's worst f/sr the codec's
    // step-adaptation lag lands far under the 30 dB global threshold, yet
    // comfortably above its own floor — a clean row is distinguishable
    // from corruption (<= 2.5 dB) only with the codec-appropriate bound
    val floor = graft.validate.AudioInvariantCheck
      .DefaultCodecThresholdsDb("adpcm_ima")
    val hard = sine(997.0, 25, 8000)
    val hardSnr = WavCodec.snrDb(hard,
      AdpcmCodec.decode(AdpcmCodec.encode(8000, hard))._2)
    assert(hardSnr < 30.0, s"expected sub-30 dB SNR at the hard corner, got $hardSnr")
    assert(hardSnr >= floor + 4.0,
      s"clean hard-corner SNR must clear the 8 dB floor with margin, got $hardSnr")
    // on easy (low f/sr) content it performs like the textbook codec it is
    val easy = sine(220.0, 50, 48000)
    val easySnr = WavCodec.snrDb(easy,
      AdpcmCodec.decode(AdpcmCodec.encode(48000, easy))._2)
    assert(easySnr >= 30.0 && easySnr < WavCodec.MaxSnrDb,
      s"expected >=30 dB on easy content, got $easySnr")
  }

  test("zeroed back half of an ADPCM payload collapses SNR far below its floor") {
    // the ClipsGenerator injection shape, at the hot dup-row rate: with
    // 65-sample blocks the zero region always lands in real nibble data
    // (never only in block padding — the reason BlockAlign is 36), so a
    // corrupt row can never decode clean
    for (sr <- Seq(8000, 16000, 22050, 48000)) {
      val ref = sine(440.0, 25, sr)
      val bytes = AdpcmCodec.encode(sr, ref)
      var k = 44 + (bytes.length - 44) / 2
      val bad = bytes.clone()
      while (k < bad.length) { bad(k) = 0; k += 1 }
      val snr = WavCodec.snrDb(ref, AdpcmCodec.decode(bad)._2)
      assert(snr < 4.0, s"sr=$sr: expected collapsed SNR, got $snr")
    }
  }

  // ---- container / geometry properties

  test("ADPCM multi-block round-trip with fact-count trim") {
    // 48 kHz × 50 ms = 2400 samples = 4 full blocks + a partial (505/block):
    // the fact chunk must trim the decoder to the exact sample count
    val ref = sine(440.0, 50, 48000)
    assert(ref.length === 2400)
    val (sr, got) = AdpcmCodec.decode(AdpcmCodec.encode(48000, ref))
    assert(sr === 48000)
    assert(got.length === ref.length)
    // first sample of every block is stored verbatim in the block header
    assert(got(0) === ref(0))
    assert(got(AdpcmCodec.SamplesPerBlock) === ref(AdpcmCodec.SamplesPerBlock))
  }

  test("ADPCM empty and single-sample signals round-trip") {
    assert(AdpcmCodec.decode(AdpcmCodec.encode(8000, Array.empty[Short]))._2
      === Array.empty[Short])
    assert(AdpcmCodec.decode(AdpcmCodec.encode(8000, Array[Short](1234)))._2
      === Array[Short](1234))
  }

  test("odd-sized G.711 data chunks carry the RIFF word-alignment pad byte") {
    val ref = sine(300.0, 25, 22050) // 22050·25/1000 = 551 samples → odd chunk
    assert(ref.length % 2 === 1)
    val bytes = G711Codec.encodeMuLaw(22050, ref)
    assert(bytes.length % 2 === 0, "RIFF files are word-aligned")
    assert(bytes.last === 0, "the pad byte is zero")
    val (sr, got) = G711Codec.decodeMuLaw(bytes)
    assert(sr === 22050 && got.length === ref.length)
  }

  test("G.711 containers carry sample rate and exact length") {
    for (sr <- Seq(8000, 48000)) {
      val ref = sine(300.0, 25, sr)
      val (gotSr, got) = G711Codec.decodeMuLaw(G711Codec.encodeMuLaw(sr, ref))
      assert(gotSr === sr && got.length === ref.length)
    }
  }

  // ---- corruption must fail loudly or collapse the SNR — never decode to
  // plausible silence (the generator's zero-back-half injection rides on
  // these properties)

  test("zeroed back half of a µ-law payload collapses SNR far below threshold") {
    val ref = sine(440.0, 25, 16000)
    val bytes = G711Codec.encodeMuLaw(16000, ref)
    var k = 44 + (bytes.length - 44) / 2 // the ClipsGenerator injection shape
    val bad = bytes.clone()
    while (k < bad.length) { bad(k) = 0; k += 1 }
    // µ-law 0x00 decodes to -32124: the zeroed tail is near-full-scale
    // garbage, not silence
    val snr = WavCodec.snrDb(ref, G711Codec.decodeMuLaw(bad)._2)
    assert(snr < 0.0, s"expected deeply negative SNR, got $snr")
  }

  test("foreign or mangled containers are rejected") {
    val ref = sine(440.0, 25, 16000)
    val mu = G711Codec.encodeMuLaw(16000, ref)
    // wrong codec's bytes
    intercept[Exception](G711Codec.decodeALaw(mu))
    intercept[Exception](AdpcmCodec.decode(mu))
    intercept[Exception](G711Codec.decodeMuLaw(WavCodec.synthSine(440.0, 25, 16000)))
    // truncated data chunk
    intercept[Exception](G711Codec.decodeMuLaw(mu.dropRight(7)))
    // not RIFF at all
    intercept[Exception](G711Codec.decodeMuLaw(Array[Byte](1, 2, 3)))
  }

  test("undersized fact chunk fails loudly instead of rewinding the walk") {
    // a 'fact' size < 4 used to make the skip REWIND the buffer and
    // re-parse misaligned bytes (round-5 advice): corrupt the fact chunk's
    // declared size field in a real container and require a loud failure
    val mu = G711Codec.encodeMuLaw(16000, sine(440.0, 25, 16000))
    def factOffset(b: Array[Byte]): Int = {
      var i = 12
      while (!(b(i) == 'f' && b(i + 1) == 'a' && b(i + 2) == 'c' && b(i + 3) == 't')) i += 1
      i
    }
    val off = factOffset(mu)
    val bad = mu.clone()
    bad(off + 4) = 2; bad(off + 5) = 0; bad(off + 6) = 0; bad(off + 7) = 0
    val e = intercept[Exception](G711Codec.decodeMuLaw(bad))
    assert(e.getMessage.contains("fact chunk too small"))
  }

  test("odd-sized fmt chunk keeps the walk word-aligned") {
    // hand-build a WAVE whose fmt chunk declares an odd size (17 = the
    // 16-byte body plus one junk byte) followed by its pad byte; the
    // parser must skip the pad like the fact/unknown branches do, or the
    // following chunk tag reads one byte early
    import java.nio.{ByteBuffer, ByteOrder}
    val data = Array[Byte](1, 2, 3, 4)
    val total = 12 + (8 + 17 + 1) + (8 + 4) + (8 + data.length)
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(17)
      .putShort(G711Codec.MuLawTag.toShort).putShort(1)
      .putInt(16000).putInt(16000).putShort(1).putShort(8)
      .put(0.toByte) // the odd 17th byte
      .put(0.toByte) // word-alignment pad (not part of the declared size)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(data.length)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    val (sr, out) = G711Codec.decodeMuLaw(buf.array())
    assert(sr === 16000)
    assert(out.length === data.length)
  }

  test("ADPCM malformed block headers are rejected") {
    val ref = sine(440.0, 25, 16000)
    val ok = AdpcmCodec.encode(16000, ref)
    // find the data chunk: last occurrence of 'data' tag
    def dataOffset(b: Array[Byte]): Int = {
      var i = b.length - 5
      while (!(b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')) i -= 1
      i + 8
    }
    val off = dataOffset(ok)
    // step index out of range (byte 2 of the block header)
    val badIdx = ok.clone(); badIdx(off + 2) = 99.toByte
    intercept[Exception](AdpcmCodec.decode(badIdx))
    // nonzero reserved byte
    val badRes = ok.clone(); badRes(off + 3) = 1.toByte
    intercept[Exception](AdpcmCodec.decode(badRes))
    // data no longer a whole number of blocks
    intercept[Exception] {
      val p = ok.dropRight(1)
      AdpcmCodec.decode(p)
    }
  }
}
