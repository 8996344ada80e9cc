package graft.audio

import java.nio.{ByteBuffer, ByteOrder}

/** Shared RIFF/WAVE plumbing for the non-PCM codec containers (IMA ADPCM
  * fmt tag 0x0011, G.711 µ-law 0x0007 / A-law 0x0006). Kept separate from
  * [[WavCodec]], whose parser deliberately accepts ONLY format-1 PCM.
  *
  * These are from-scratch implementations of publicly specified formats
  * (IMA "Recommended Practices for Enhancing Digital Audio Compatibility",
  * rev 3.00; ITU-T G.711; the Microsoft WAVE format registry for the
  * container fields) — the reference library has no audio code at all
  * (SURVEY.md §2.6); this is the north-rule decode-invariant extension.
  * Unlike the earlier WAV/FLAC paths these codecs are genuinely LOSSY:
  * clean rows decode at a finite SNR (≈30-40 dB, below the 120 dB cap), so
  * the invariant's 30 dB threshold finally discriminates on real decoded
  * error rather than only on decode success (round-4 verdict #3).
  */
private[audio] object RiffContainer {

  /** Assemble a WAVE file: fmt chunk (with optional extra bytes), an
    * optional fact chunk (required for compressed formats — it carries the
    * true sample count the data bytes alone cannot express), data chunk. */
  def build(formatTag: Int, srHz: Int, avgBytesPerSec: Int, blockAlign: Int,
      bitsPerSample: Int, fmtExtra: Array[Byte], factSamples: Int,
      data: Array[Byte]): Array[Byte] = {
    val fmtSize = 18 + fmtExtra.length
    // RIFF chunks are word-aligned: an odd-sized data chunk is followed by
    // one pad byte (counted in the RIFF size, NOT in the chunk size field).
    // Only G.711 can hit this (1 byte/sample; ADPCM blocks are even);
    // ByteBuffer.allocate zero-fills, so the pad byte is the required 0.
    val pad = data.length & 1
    val total = 12 + (8 + fmtSize) + 12 + (8 + data.length + pad)
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(fmtSize)
      .putShort(formatTag.toShort)
      .putShort(1) // mono
      .putInt(srHz)
      .putInt(avgBytesPerSec)
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .putShort(fmtExtra.length.toShort) // cbSize
      .put(fmtExtra)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(factSamples)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    buf.array()
  }

  final case class Parsed(formatTag: Int, srHz: Int, blockAlign: Int,
      bitsPerSample: Int, fmtExtra: Array[Byte], factSamples: Int,
      data: Array[Byte])

  /** Chunk-walking parse; `expectTag` guards against bytes of a different
    * codec being routed here (decode must fail loudly, not produce
    * plausible garbage). */
  def parse(wav: Array[Byte], expectTag: Int): Parsed = {
    require(wav.length >= 12, "not a RIFF file: too short")
    val buf = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt
    require(tag() == "WAVE", "not a WAVE file")
    var formatTag = -1; var srHz = -1; var blockAlign = -1; var bits = -1
    var fmtExtra = Array.emptyByteArray
    var fact = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8 && data == null) {
      val chunk = tag()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"corrupt chunk size $size in '$chunk'")
      chunk match {
        case "fmt " =>
          val start = buf.position()
          formatTag = buf.getShort & 0xffff
          require(formatTag == expectTag,
            f"expected WAVE format tag 0x$expectTag%04x, got 0x$formatTag%04x")
          val channels = buf.getShort
          require(channels == 1, s"expected mono, got $channels channels")
          srHz = buf.getInt
          buf.getInt // avg bytes/sec
          blockAlign = buf.getShort & 0xffff
          bits = buf.getShort & 0xffff
          if (size >= 18) {
            val cb = buf.getShort & 0xffff
            fmtExtra = new Array[Byte](cb); buf.get(fmtExtra)
          }
          // odd-size pad byte, same as the fact/unknown branches — an
          // odd-sized fmt chunk must not desynchronize the walk
          buf.position(start + size + (size & 1))
        case "fact" =>
          // a declared size < 4 would make the skip REWIND the buffer and
          // re-parse misaligned bytes — fail loudly instead
          require(size >= 4, s"fact chunk too small: $size bytes")
          fact = buf.getInt
          buf.position(buf.position() + size - 4 + (size & 1))
        case "data" =>
          require(srHz > 0, "data chunk before fmt chunk")
          data = new Array[Byte](size); buf.get(data)
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(data != null, "no data chunk found")
    require(fact >= 0, "no fact chunk: compressed WAVE requires a sample count")
    Parsed(formatTag, srHz, blockAlign, bits, fmtExtra, fact, data)
  }
}

/** IMA (DVI) ADPCM, 4 bits/sample, mono — the classic lossy speech/audio
  * codec of the IMA compatibility spec, carried in the standard WAVE
  * format-0x0011 container (block header = initial predictor + step index,
  * then nibble pairs, low nibble first; a `fact` chunk carries the true
  * sample count; wSamplesPerBlock in the fmt extra bytes).
  *
  * 4:1 compression vs s16 PCM; genuinely lossy — a sine at the generator's
  * parameters decodes at ≈30-50 dB SNR depending on f/sr (quantization +
  * step-adaptation lag), never at the lossless cap. */
object AdpcmCodec {

  val FormatTag = 0x0011

  /** Step-size table, 89 entries (IMA spec table 2). */
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index-adjustment table (IMA spec table 1; indexed by nibble & 7). */
  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Bytes per block (mono): 4-byte header + 32 nibble-pair bytes ⇒ 65
    * samples/block (the spec's `(blockAlign-4)*2+1` mono formula; any block
    * size is conformant — encoders pick it per application). Small blocks
    * are chosen deliberately: a 25 ms clip at 8 kHz is 200 samples, so a
    * 256-byte block would be ~60% padding and byte-range corruption (the
    * generator's zero-back-half injection) could land entirely in padding,
    * decoding clean — with 65-sample blocks the padding tail is < 1 block
    * and corruption always destroys real samples. The per-block verbatim
    * header sample also resets predictor drift more often, which is why
    * clean-signal SNR is measured per block size (AdpcmBandSweep). */
  val BlockAlign = 36
  val SamplesPerBlock: Int = (BlockAlign - 4) * 2 + 1

  private def clamp16(v: Int): Int =
    if (v > Short.MaxValue) Short.MaxValue
    else if (v < Short.MinValue) Short.MinValue else v

  /** Quantize one sample against (predictor, index); returns the nibble and
    * the updated state — encoder and decoder share [[reconstruct]] so the
    * encoder's predictor tracks exactly what the decoder will compute. */
  private def encodeSample(sample: Int, predictor: Int, index: Int): Int = {
    val step = StepTable(index)
    var diff = sample - predictor
    var nibble = 0
    if (diff < 0) { nibble = 8; diff = -diff }
    if (diff >= step) { nibble |= 4; diff -= step }
    if (diff >= (step >> 1)) { nibble |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) nibble |= 1
    nibble
  }

  /** Inverse quantizer (IMA spec §4.2; identical in encoder and decoder). */
  private def reconstruct(nibble: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var diffq = step >> 3
    if ((nibble & 4) != 0) diffq += step
    if ((nibble & 2) != 0) diffq += step >> 1
    if ((nibble & 1) != 0) diffq += step >> 2
    val p = clamp16(if ((nibble & 8) != 0) predictor - diffq else predictor + diffq)
    val i = math.max(0, math.min(88, index + IndexTable(nibble & 7)))
    (p, i)
  }

  /** Encode mono s16 PCM → WAVE/IMA-ADPCM bytes. The step index carries
    * across blocks (each block header snapshots the running state, so any
    * block still decodes standalone — the spec's seekability property). */
  def encode(srHz: Int, samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val nBlocks = math.max(1, (n + SamplesPerBlock - 1) / SamplesPerBlock)
    val data = new Array[Byte](nBlocks * BlockAlign)
    var index = 0
    var s = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * BlockAlign
      // block header: verbatim first sample (or a padding 0 past the end),
      // running step index, reserved 0
      val first = if (s < n) samples(s).toInt else 0
      data(base) = (first & 0xff).toByte
      data(base + 1) = ((first >> 8) & 0xff).toByte
      data(base + 2) = index.toByte
      data(base + 3) = 0
      var predictor = first
      s += 1
      var k = 0
      while (k < SamplesPerBlock - 1) {
        // past-the-end positions encode the last real sample again — the
        // predictor stays put and the decoder trims to the fact count
        val sample = if (s < n) samples(s).toInt
          else if (n > 0) samples(n - 1).toInt else 0
        val nib = encodeSample(sample, predictor, index)
        val st = reconstruct(nib, predictor, index)
        predictor = st._1; index = st._2
        val byte = base + 4 + (k >> 1)
        if ((k & 1) == 0) data(byte) = (nib & 0x0f).toByte // low nibble first
        else data(byte) = (data(byte) | ((nib & 0x0f) << 4)).toByte
        if (s < n) s += 1
        k += 1
      }
      b += 1
    }
    val avg = math.max(1, (srHz.toLong * BlockAlign / SamplesPerBlock).toInt)
    RiffContainer.build(FormatTag, srHz, avg, BlockAlign, 4,
      fmtExtra = Array((SamplesPerBlock & 0xff).toByte,
        ((SamplesPerBlock >> 8) & 0xff).toByte),
      factSamples = n, data = data)
  }

  /** Decode WAVE/IMA-ADPCM → (srHz, mono s16 PCM). Fails loudly on a wrong
    * format tag, malformed block geometry, or an out-of-range step index —
    * corrupt payloads must not decode to plausible garbage. */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    val p = RiffContainer.parse(bytes, FormatTag)
    require(p.bitsPerSample == 4, s"IMA ADPCM must be 4-bit, got ${p.bitsPerSample}")
    require(p.blockAlign >= 5, s"block align too small: ${p.blockAlign}")
    require(p.data.length % p.blockAlign == 0,
      s"data size ${p.data.length} not a multiple of blockAlign ${p.blockAlign}")
    val spb =
      if (p.fmtExtra.length >= 2)
        (p.fmtExtra(0) & 0xff) | ((p.fmtExtra(1) & 0xff) << 8)
      else (p.blockAlign - 4) * 2 + 1
    require(spb == (p.blockAlign - 4) * 2 + 1,
      s"inconsistent samplesPerBlock $spb for blockAlign ${p.blockAlign}")
    val nBlocks = p.data.length / p.blockAlign
    require(p.factSamples <= nBlocks * spb,
      s"fact count ${p.factSamples} exceeds data capacity ${nBlocks * spb}")
    val out = new Array[Short](p.factSamples)
    var s = 0
    var b = 0
    while (b < nBlocks && s < out.length) {
      val base = b * p.blockAlign
      var predictor = ((p.data(base) & 0xff) | (p.data(base + 1) << 8)).toShort.toInt
      var index = p.data(base + 2) & 0xff
      require(index <= 88, s"step index $index out of range in block $b")
      require(p.data(base + 3) == 0, s"nonzero reserved byte in block $b")
      out(s) = predictor.toShort
      s += 1
      var k = 0
      while (k < spb - 1 && s < out.length) {
        val byte = p.data(base + 4 + (k >> 1)) & 0xff
        val nib = if ((k & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
        val st = reconstruct(nib, predictor, index)
        predictor = st._1; index = st._2
        out(s) = predictor.toShort
        s += 1
        k += 1
      }
      b += 1
    }
    require(s == out.length, s"decoded $s of ${out.length} samples")
    (p.srHz, out)
  }
}

/** ITU-T G.711 companding codecs (µ-law and A-law), 8 bits/sample, in
  * their standard WAVE containers (format tags 0x0007 / 0x0006). The
  * logarithmic segment/mantissa layout follows the G.711 tables; the
  * encode path works in the 14-bit (µ) / 13-bit (A) domain of the spec
  * with the conventional 16-bit scaling. Memoryless — each byte decodes
  * independently — so SNR is frequency-independent: ≈37-38 dB for the
  * generator's half-scale sine regardless of f/sr (the textbook µ-law
  * SQNR plateau), comfortably above the invariant's 30 dB threshold and
  * far below the 120 dB lossless cap. */
object G711Codec {

  val MuLawTag = 0x0007
  val ALawTag = 0x0006

  private val SegUEnd = Array(0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
  private val SegAEnd = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
  private val Bias = 0x84

  private def segment(v: Int, ends: Array[Int]): Int = {
    var s = 0
    while (s < ends.length && v > ends(s)) s += 1
    s
  }

  /** 16-bit linear → µ-law byte (G.711 table 2a/2b layout). */
  def linearToMuLaw(pcm: Short): Byte = {
    var v = pcm >> 2 // 14-bit domain
    val mask = if (v < 0) { v = -v; 0x7F } else 0xFF
    if (v > 8159) v = 8159 // CLIP
    v += Bias >> 2
    val seg = segment(v, SegUEnd)
    val uval =
      if (seg >= 8) 0x7F
      else (seg << 4) | ((v >> (seg + 1)) & 0x0F)
    (uval ^ mask).toByte
  }

  /** µ-law byte → 16-bit linear. */
  def muLawToLinear(b: Byte): Short = {
    val u = ~b & 0xff
    var t = ((u & 0x0F) << 3) + Bias
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) Bias - t else t - Bias).toShort
  }

  /** 16-bit linear → A-law byte (G.711 table 1a/1b layout; even bits
    * inverted per the spec's 0x55 mask). */
  def linearToALaw(pcm: Short): Byte = {
    var v = pcm >> 3 // 13-bit domain
    val mask = if (v >= 0) 0xD5 else { v = -v - 1; 0x55 }
    val seg = segment(v, SegAEnd)
    val aval =
      if (seg >= 8) 0x7F
      else {
        val shift = if (seg < 2) 1 else seg
        (seg << 4) | ((v >> shift) & 0x0F)
      }
    (aval ^ mask).toByte
  }

  /** A-law byte → 16-bit linear. */
  def aLawToLinear(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    var t = (a & 0x0F) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  private def encodeWith(tag: Int, srHz: Int, samples: Array[Short],
      f: Short => Byte): Array[Byte] = {
    val data = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { data(i) = f(samples(i)); i += 1 }
    RiffContainer.build(tag, srHz, srHz, 1, 8, Array.emptyByteArray,
      samples.length, data)
  }

  private def decodeWith(tag: Int, bytes: Array[Byte],
      f: Byte => Short): (Int, Array[Short]) = {
    val p = RiffContainer.parse(bytes, tag)
    require(p.bitsPerSample == 8, s"G.711 must be 8-bit, got ${p.bitsPerSample}")
    require(p.factSamples == p.data.length,
      s"fact count ${p.factSamples} != data bytes ${p.data.length}")
    val out = new Array[Short](p.data.length)
    var i = 0
    while (i < out.length) { out(i) = f(p.data(i)); i += 1 }
    (p.srHz, out)
  }

  def encodeMuLaw(srHz: Int, samples: Array[Short]): Array[Byte] =
    encodeWith(MuLawTag, srHz, samples, linearToMuLaw)
  def decodeMuLaw(bytes: Array[Byte]): (Int, Array[Short]) =
    decodeWith(MuLawTag, bytes, muLawToLinear)

  def encodeALaw(srHz: Int, samples: Array[Short]): Array[Byte] =
    encodeWith(ALawTag, srHz, samples, linearToALaw)
  def decodeALaw(bytes: Array[Byte]): (Int, Array[Short]) =
    decodeWith(ALawTag, bytes, aLawToLinear)
}
