#!/usr/bin/env python3
"""Independent FLAC cross-check (driver-side verification tooling).

No FLAC library or tool exists in this sandbox, so this is a second,
independently-written decoder — Python, structured from the public FLAC
format spec (RFC 9639), sharing no code with the Scala implementation —
used to verify that `graft.audio.FlacCodec.encode` emits streams another
implementation reads back to the exact PCM. It decodes the subset the
encoder emits (mono 16-bit, CONSTANT/VERBATIM/FIXED subframes, Rice
partition order 0) and verifies the sync code, CRC-8, CRC-16, and the
STREAMINFO MD5 of the decoded samples.

Usage:
  scripts/flac_crosscheck.py
No arguments: it finds the newest/largest materialized oracle clips table
under /root/repo/target/graft-oracle/ (written by OracleTables.ensure —
run Verify or any clips query first), decodes every flac row, and compares
against the re-derived reference signal. Corruption-injected rows must be
REJECTED by the CRC checks to count as passing.
"""
import glob
import hashlib
import struct
import sys


class Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.d):
                raise ValueError("truncated")
            v = (v << 1) | ((self.d[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if n and (v >> (n - 1)) & 1:
            v -= 1 << n
        return v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 20:
                raise ValueError("bad unary")
        return n

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def decode(data: bytes):
    if data[:4] != b"fLaC":
        raise ValueError("bad magic")
    r = Bits(data, 4)
    # metadata
    sr = bps = total = None
    md5_expect = None
    while True:
        last = r.read(1)
        btype = r.read(7)
        blen = r.read(24)
        if btype == 0:
            r.read(16), r.read(16), r.read(24), r.read(24)
            sr = r.read(20)
            assert r.read(3) + 1 == 1, "mono only"
            bps = r.read(5) + 1
            assert bps == 16
            total = r.read(36)
            md5_expect = data[r.pos:r.pos + 16]
            r.pos += 16
        else:
            r.pos += blen
        if last:
            break
    out = []
    while len(out) < total:
        fstart = r.pos
        assert r.read(14) == 0x3FFE, "bad sync"
        r.read(1), r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        assert r.read(4) == 0, "mono only"
        ss_code = r.read(3)
        r.read(1)
        b0 = r.read(8)
        if b0 & 0x80:
            ones = 0
            while (b0 << ones) & 0x80:
                ones += 1
            for _ in range(ones - 1):
                assert r.read(8) & 0xC0 == 0x80
        if bs_code == 6:
            n = r.read(8) + 1
        elif bs_code == 7:
            n = r.read(16) + 1
        elif bs_code == 1:
            n = 192
        elif 2 <= bs_code <= 5:
            n = 576 << (bs_code - 2)
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        assert ss_code in (0, 4), "16-bit only"
        assert r.read(8) == crc8(data[fstart:r.pos - 1]), "crc8 mismatch"
        # subframe
        assert r.read(1) == 0
        stype = r.read(6)
        wasted = (r.unary() + 1) if r.read(1) else 0
        eff = 16 - wasted
        if stype == 0:
            s = [r.read_signed(eff)] * n
        elif stype == 1:
            s = [r.read_signed(eff) for _ in range(n)]
        elif 8 <= stype <= 12:
            order = stype - 8
            s = [r.read_signed(eff) for _ in range(order)]
            method = r.read(2)
            pbits = 4 if method == 0 else 5
            esc = (1 << pbits) - 1
            po = r.read(4)
            res = []
            for p in range(1 << po):
                cnt = (n >> po) - (order if p == 0 else 0)
                k = r.read(pbits)
                if k == esc:
                    raw = r.read(5)
                    res += [r.read_signed(raw) for _ in range(cnt)]
                else:
                    for _ in range(cnt):
                        q = r.unary()
                        u = (q << k) | (r.read(k) if k else 0)
                        res.append((u >> 1) ^ -(u & 1))
            for i, rv in enumerate(res):
                j = order + i
                if order == 0:
                    p = 0
                elif order == 1:
                    p = s[j - 1]
                elif order == 2:
                    p = 2 * s[j - 1] - s[j - 2]
                elif order == 3:
                    p = 3 * s[j - 1] - 3 * s[j - 2] + s[j - 3]
                else:
                    p = 4 * s[j - 1] - 6 * s[j - 2] + 4 * s[j - 3] - s[j - 4]
                s.append(rv + p)
        else:
            raise ValueError(f"subframe type {stype} not in encoder subset")
        s = [v << wasted for v in s]
        r.align()
        assert r.read(16) == crc16(data[fstart:r.pos - 2]), "crc16 mismatch"
        out += s
    md5 = hashlib.md5(struct.pack(f"<{len(out)}h", *out)).digest()
    assert md5 == md5_expect, "STREAMINFO MD5 mismatch"
    return sr, out


def reference_pcm(i: int, max_synth_ms: int = 25):
    """Re-derive the generator's reference signal (ClipsGenerator recipe)."""
    import math

    def mix(x):
        z = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E9B5) & (1 << 64) - 1
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
        return z ^ (z >> 31)

    sr = 16000 if i % 10 < 6 else [8000, 22050, 44100, 48000][(i // 10) % 4]
    dur = min(200 + (i * 37) % 9800, max_synth_ms)
    freq = 220.0 + (i % 880)
    ns = sr * dur // 1000
    scale = 0.5 * 32767

    def rnd(v):  # JVM Math.round = floor(x + 0.5)
        return math.floor(v + 0.5)

    return sr, [int(rnd(math.sin(2 * math.pi * freq * k / sr) * scale)) for k in range(ns)]


def main():
    import pyarrow.parquet as pq

    def key(d):  # newest generator version, then largest table
        tag = d.split("/")[-2]  # v<ver>-ms<cap>-n<n>
        ver = int(tag.split("-")[0][1:])
        n = int(tag.split("-n")[1])
        return (ver, n)

    dirs = sorted(glob.glob("/root/repo/target/graft-oracle/v*/clips"), key=key)
    if not dirs:
        print("no materialized oracle clips found — run Verify first")
        sys.exit(1)
    clips_dir = dirs[-1]
    # the dir tag carries the synth cap so the reference recipe can never
    # silently diverge from the materialized bytes
    max_synth_ms = int(clips_dir.split("/")[-2].split("-ms")[1].split("-")[0])
    print(f"checking {clips_dir} (maxSynthMs={max_synth_ms})")
    checked = failed = 0
    for f in glob.glob(f"{clips_dir}/*.parquet"):
        t = pq.read_table(f, columns=["clip_id", "bytes", "codec"])
        for cid, payload, codec in zip(
            t["clip_id"].to_pylist(), t["bytes"].to_pylist(), t["codec"].to_pylist()
        ):
            if codec != "flac":
                continue
            i = int(cid[5:])
            m = i % 5000
            if m == 10:
                # dup-id injection target: rows i and i+1 share this clip_id
                # and one carries the other's payload by design — ambiguous
                continue
            try:
                sr, got = decode(payload)
            except Exception:
                if m == 17:
                    checked += 1  # corruption-injected: rejection IS the pass
                    continue
                raise
            if m == 17:
                checked += 1
                failed += 1  # corrupted payload decoded without error
                print(f"CORRUPT ROW DECODED CLEANLY {cid}")
                continue
            ref_sr, ref = reference_pcm(i, max_synth_ms)
            ok = sr == ref_sr and got == ref
            checked += 1
            failed += 0 if ok else 1
            if not ok:
                print(f"MISMATCH {cid}: sr {sr} vs {ref_sr}, "
                      f"first-diff {next((k for k in range(min(len(got), len(ref))) if got[k] != ref[k]), 'len')}")
    print(f"flac cross-check: {checked} clips decoded by the independent "
          f"Python decoder, {failed} mismatches")
    sys.exit(1 if failed or not checked else 0)


if __name__ == "__main__":
    main()
