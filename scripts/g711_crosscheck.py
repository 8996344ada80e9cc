#!/usr/bin/env python3
"""Independent G.711 cross-check (driver-side verification tooling).

CPython's `audioop` module carries an independent C implementation of the
ITU-T G.711 mu-law/A-law companders (the classic Sun reference tables) —
a second implementation sharing no code with `graft.audio.G711Codec`.
This script verifies, for every pcm_mulaw/pcm_alaw row of the
materialized oracle clips table:

  1. byte-exact ENCODE parity: the row's data chunk equals
     audioop.lin2ulaw/lin2alaw of the re-derived reference signal —
     the Scala encoder emits exactly the bytes the canonical tables
     prescribe, for every sample of every row;
  2. independent DECODE + SNR bands: audioop.ulaw2lin/alaw2lin of the
     payload, scored against the reference, lands where the q40 oracle
     predicts — clean rows in [30, 120) dB (really lossy, really above
     the invariant threshold), corruption-injected rows far below 30;
  3. container sanity: WAVE format tag 0x0007/0x0006, mono, 8-bit,
     fact count == data bytes (parsed here independently).

Usage:
  scripts/g711_crosscheck.py
No arguments: picks the newest/largest materialized oracle clips table
under /root/repo/target/graft-oracle/ (written by OracleTables.ensure —
run Verify or any clips query first).
"""
import glob
import math
import struct
import sys

import audioop  # deprecated in 3.12, present through 3.12; sandbox has 3.11


def parse_wave(payload: bytes, expect_tag: int):
    """Minimal independent RIFF/WAVE chunk walk (no shared code with the
    Scala parser)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos = 12
    fmt = fact = data = None
    while pos + 8 <= len(payload) and data is None:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    tag, channels, sr, _avg, block_align, bits = fmt
    if tag != expect_tag:
        raise ValueError(f"format tag 0x{tag:04x} != 0x{expect_tag:04x}")
    if channels != 1 or bits != 8 or block_align != 1:
        raise ValueError("expected mono 8-bit G.711")
    if fact is None or fact != len(data):
        raise ValueError("fact count missing or != data bytes")
    return sr, data


def reference_pcm(i: int, max_synth_ms: int):
    """Re-derive the generator's reference signal (ClipsGenerator recipe;
    same derivation the flac cross-check uses)."""
    sr = 16000 if i % 10 < 6 else [8000, 22050, 44100, 48000][(i // 10) % 4]
    dur = min(200 + (i * 37) % 9800, max_synth_ms)
    freq = 220.0 + (i % 880)
    ns = sr * dur // 1000
    scale = 0.5 * 32767

    def rnd(v):  # JVM Math.round = floor(x + 0.5)
        return math.floor(v + 0.5)

    return sr, [int(rnd(math.sin(2 * math.pi * freq * k / sr) * scale))
                for k in range(ns)]


def snr_db(ref, got):
    sig = sum(v * v for v in ref)
    err = sum((a - b) ** 2 for a, b in zip(ref, got))
    err += sum(v * v for v in (ref[len(got):] or got[len(ref):]))
    if err == 0:
        return 120.0
    if sig == 0:
        return float("-inf")
    return 10.0 * math.log10(sig / err)


def main():
    import pyarrow.parquet as pq

    def key(d):  # newest generator version, then largest table
        tag = d.split("/")[-2]
        return (int(tag.split("-")[0][1:]), int(tag.split("-n")[1]))

    dirs = sorted(glob.glob("/root/repo/target/graft-oracle/v*/clips"), key=key)
    if not dirs:
        print("no materialized oracle clips found — run Verify first")
        sys.exit(1)
    clips_dir = dirs[-1]
    max_synth_ms = int(clips_dir.split("/")[-2].split("-ms")[1].split("-")[0])
    print(f"checking {clips_dir} (maxSynthMs={max_synth_ms})")

    codecs = {
        "pcm_mulaw": (0x0007, audioop.lin2ulaw, audioop.ulaw2lin),
        "pcm_alaw": (0x0006, audioop.lin2alaw, audioop.alaw2lin),
    }
    checked = failed = 0
    min_clean = 120.0
    max_clean = float("-inf")
    for f in glob.glob(f"{clips_dir}/*.parquet"):
        t = pq.read_table(f, columns=["clip_id", "bytes", "codec"])
        for cid, payload, codec in zip(
            t["clip_id"].to_pylist(), t["bytes"].to_pylist(),
            t["codec"].to_pylist()
        ):
            if codec not in codecs:
                continue
            i = int(cid[5:])
            m = i % 5000
            if m == 10:
                # dup-id injection target: rows i and i+1 share this clip_id
                # and one carries the other's payload by design — ambiguous
                continue
            expect_tag, enc, dec = codecs[codec]
            sr, data = parse_wave(payload, expect_tag)
            ref_sr, ref = reference_pcm(i, max_synth_ms)
            ref_bytes = struct.pack(f"<{len(ref)}h", *ref)
            got = struct.unpack(f"<{len(data)}h", dec(data, 2))
            checked += 1
            if m == 17:
                # corruption-injected (zeroed back half): the zeroed tail
                # decodes to garbage (mu-law 0x00 -> -32124, SNR deeply
                # negative; A-law 0x00 -> -688, SNR low-positive) — either
                # way far below the 30 dB invariant the engine flags on
                s = snr_db(ref, got)
                if not s < 30.0:
                    failed += 1
                    print(f"CORRUPT ROW SCORED {s:.1f} dB {cid}")
                continue
            problems = []
            if sr != ref_sr or len(data) != len(ref):
                problems.append(f"geometry sr={sr}/{ref_sr} n={len(data)}/{len(ref)}")
            elif data != enc(ref_bytes, 2):
                problems.append("encode bytes differ from audioop")
            s = snr_db(ref, got)
            if not (30.0 <= s < 120.0):
                problems.append(f"SNR {s:.2f} dB outside [30, 120)")
            else:
                min_clean = min(min_clean, s)
                max_clean = max(max_clean, s)
            if problems:
                failed += 1
                print(f"MISMATCH {cid} ({codec}): {'; '.join(problems)}")
    print(f"g711 cross-check: {checked} clips checked against audioop "
          f"(byte-exact encode + independent decode), {failed} mismatches; "
          f"clean SNR range [{min_clean:.2f}, {max_clean:.2f}] dB")
    sys.exit(1 if failed or not checked else 0)


if __name__ == "__main__":
    main()
