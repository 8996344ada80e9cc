#!/usr/bin/env python3
"""Independent q42 tone-census cross-check (driver-side verification tooling).

Replays the frequency-domain content check end-to-end with NO graft code:
decodes every payload of the materialized oracle clips table through
independent decoders (CPython `audioop` for G.711, the independently
written pure-Python FLAC decoder from flac_crosscheck.py, a local RIFF
walk for PCM), projects each decoded signal onto the tone its clip_id
claims (numpy least-squares, Hann window), and verifies that the banding
at the 0.75 threshold reproduces the q42 oracle's injection-rule
prediction row by row:

  match        <=> not corrupt           (id % 5000 != 17)
  anomaly      <=> corrupt and not flac  (half-garbage decodes)
  decode_fail  <=> corrupt flac          (frame CRC mismatch)

Also reports the empirical margins (min legit ratio / max corrupt ratio)
the threshold rests on.

Usage: scripts/tone_crosscheck.py
No arguments: picks the newest/largest materialized oracle clips table
under /root/repo/target/graft-oracle/ (run Verify or any clips query
first).
"""
import glob
import importlib.util
import math
import struct
import sys

import audioop  # deprecated in 3.12, present through 3.12; sandbox has 3.11
import numpy as np

_spec = importlib.util.spec_from_file_location(
    "flac_crosscheck", __file__.rsplit("/", 1)[0] + "/flac_crosscheck.py")
flacmod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(flacmod)


def parse_wave(payload: bytes, expect_tags):
    """Minimal independent RIFF/WAVE chunk walk."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload) and data is None:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    tag, channels, sr, _avg, _ba, bits = fmt
    if tag not in expect_tags or channels != 1:
        raise ValueError(f"unexpected fmt 0x{tag:04x} ch={channels}")
    return tag, sr, bits, data


def decode(payload: bytes, codec: str):
    """(sr, int16 numpy array) via a codec-appropriate independent path."""
    if codec == "flac":
        sr, samples = flacmod.decode(payload)  # CRC-verifying; raises on corruption
        return sr, np.asarray(samples, dtype=np.int64)
    if codec == "pcm_s16le":
        _tag, sr, bits, data = parse_wave(payload, {0x0001})
        if bits != 16:
            raise ValueError("expected 16-bit PCM")
        return sr, np.frombuffer(data[:len(data) & ~1], dtype="<i2").astype(np.int64)
    lin = {"pcm_mulaw": audioop.ulaw2lin, "pcm_alaw": audioop.alaw2lin}[codec]
    _tag, sr, _bits, data = parse_wave(payload, {0x0007, 0x0006})
    return sr, np.frombuffer(lin(data, 2), dtype="<i2").astype(np.int64)


def tone_ratio(x: np.ndarray, sr: int, freq: float) -> float:
    """Fraction of the Hann-windowed signal's energy explained by a tone
    at `freq`: least-squares onto span{cos, sin} (same definition as
    Spectral.toneMatchRatio, reimplemented on the numpy stack)."""
    n = len(x)
    if n < 8:
        return float("nan")
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    v = x * w
    ang = 2.0 * np.pi * freq * np.arange(n) / sr
    c = np.cos(ang) * w
    s = np.sin(ang) * w
    xx = float(v @ v)
    if xx == 0.0:
        return 0.0
    g = np.array([[c @ c, c @ s], [c @ s, s @ s]])
    rhs = np.array([v @ c, v @ s])
    if abs(np.linalg.det(g)) < 1e-9:
        return 0.0
    ab = np.linalg.solve(g, rhs)
    return float(max(0.0, min(1.0, (ab @ rhs) / xx)))


def main():
    import pyarrow.parquet as pq

    def key(d):
        tag = d.split("/")[-2]
        return (int(tag.split("-")[0][1:]), int(tag.split("-n")[1]))

    dirs = sorted(glob.glob("/root/repo/target/graft-oracle/v*/clips"), key=key)
    if not dirs:
        print("no materialized oracle clips found — run Verify first")
        sys.exit(1)
    clips_dir = dirs[-1]
    print(f"checking {clips_dir}")

    checked = mismatches = 0
    legit_min, corrupt_max = 1.0, 0.0
    bands = {"match": 0, "anomaly": 0, "decode_fail": 0}
    for f in sorted(glob.glob(clips_dir + "/*.parquet")):
        t = pq.read_table(f, columns=["clip_id", "bytes", "codec"])
        for cid, payload, codec in zip(
                t.column("clip_id").to_pylist(),
                t.column("bytes").to_pylist(),
                t.column("codec").to_pylist()):
            i = int(cid[5:])
            corrupt = i % 5000 == 17
            expected_band = ("decode_fail" if codec == "flac" else "anomaly") \
                if corrupt else "match"
            freq = 220.0 + (i % 880)
            try:
                sr, x = decode(payload, codec)
                r = tone_ratio(x, sr, freq)
                band = "match" if (not math.isnan(r) and r >= 0.75) else "anomaly"
                if corrupt:
                    corrupt_max = max(corrupt_max, r)
                else:
                    legit_min = min(legit_min, r)
            except Exception:
                band = "decode_fail"
            bands[band] += 1
            checked += 1
            if band != expected_band:
                mismatches += 1
                if mismatches <= 5:
                    print(f"  MISMATCH {cid} codec={codec} "
                          f"band={band} expected={expected_band}")
    print(f"tone cross-check: {checked} clips decoded independently, "
          f"{mismatches} band mismatches; bands={bands}")
    print(f"margins: legit min ratio {legit_min:.5f}, "
          f"corrupt decodable max ratio {corrupt_max:.4f} (threshold 0.75)")
    sys.exit(0 if mismatches == 0 else 1)


if __name__ == "__main__":
    main()
