#!/usr/bin/env python3
"""Independent pure-Python FLAC encoder for interop fixtures.

Re-derives the FLAC format (RFC 9639 / xiph spec) with no code shared
with the Scala decoder: STREAMINFO + frames with fixed/LPC/verbatim
subframes, rice method 0/1 residuals incl. escape partitions, wasted
bits, all four channel assignments, tabled/8-bit/16-bit block-size
codes, end-of-header sample-rate codes, UTF-8-style frame numbers,
CRC-8/CRC-16, and the PCM MD5 in STREAMINFO.

Writes src/main/resources/graft/flac/fixture_*.flac. The PCM formula
and the FIXTURES table mirror graft.operators.FlacFixtures — keep
both in sync.
"""
import hashlib
import os
import sys

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "main", "resources", "graft", "flac")


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bit(self, v):
        self.acc = (self.acc << 1) | (v & 1)
        self.n += 1
        if self.n == 8:
            self.buf.append(self.acc)
            self.acc = 0
            self.n = 0

    def bits(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bit((v >> k) & 1)

    def unary(self, q):
        for _ in range(q):
            self.bit(0)
        self.bit(1)

    def align(self):
        while self.n:
            self.bit(0)

    def bytes(self):
        assert self.n == 0
        return bytes(self.buf)


def crc8(data):
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data):
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def streaminfo(rate, ch, bps, total, bs, md5):
    w = BitWriter()
    w.bits(bs, 16)
    w.bits(bs, 16)
    w.bits(0, 24)
    w.bits(0, 24)
    w.bits(rate, 20)
    w.bits(ch - 1, 3)
    w.bits(bps - 1, 5)
    w.bits(total, 36)
    body = w.bytes() + md5
    assert len(body) == 34
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + body


def coded_number(w, v):
    if v < 0x80:
        w.bits(v, 8)
        return
    ncont = 1
    while ncont < 6 and v >= (1 << (6 + 5 * ncont)):
        ncont += 1
    lead_payload = 6 - ncont
    # lead byte: ncont+1 ones, one zero, then the high payload bits
    lead = 0
    for _ in range(ncont + 1):
        lead = (lead << 1) | 1
    lead <<= 1
    lead = (lead << lead_payload) | ((v >> (6 * ncont)) & ((1 << lead_payload) - 1))
    w.bits(lead, 8)
    for j in range(ncont - 1, -1, -1):
        w.bits(0x80 | ((v >> (6 * j)) & 0x3F), 8)


BS_TABLE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
            1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
SR_TABLE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
            24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
BPS_TABLE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}


def fixed_residual(s, order):
    res = list(s)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    # res now has len(s)-order entries = residuals for i >= order
    return res


def wasted_of(vals):
    """Common trailing-zero bits over all non-zero samples (0 if any
    sample is odd or all are zero)."""
    w = 32
    any_nz = False
    for v in vals:
        if v == 0:
            continue
        any_nz = True
        t = 0
        while (v >> t) & 1 == 0:
            t += 1
        w = min(w, t)
    return w if any_nz and w < 32 else 0


def write_subframe(w, s, bps, mode, rice_method, part_order, lpc=None,
                   use_wasted=False):
    w.bit(0)  # pad
    wasted = wasted_of(s) if use_wasted else 0
    if wasted:
        s = [v >> wasted for v in s]
    ebps = bps - wasted
    n = len(s)

    def header(type_bits):
        w.bits(type_bits, 6)
        if wasted:
            w.bit(1)
            w.unary(wasted - 1)
        else:
            w.bit(0)

    def put_signed(v, nbits):
        w.bits(v & ((1 << nbits) - 1), nbits)

    if mode == "verbatim":
        header(1)
        for v in s:
            put_signed(v, ebps)
        return
    if mode == "constant":
        assert all(v == s[0] for v in s)
        header(0)
        put_signed(s[0], ebps)
        return
    if mode.startswith("fixed"):
        order = int(mode[5:])
        header(0x08 | order)
        for i in range(order):
            put_signed(s[i], ebps)
        res = fixed_residual(s, order)
    elif mode == "lpc":
        coefs, shift, precision = lpc
        order = len(coefs)
        header(0x20 | (order - 1))
        for i in range(order):
            put_signed(s[i], ebps)
        w.bits(precision - 1, 4)
        w.bits(shift & 0x1F, 5)
        for c in coefs:
            put_signed(c, precision)
        res = []
        for i in range(order, n):
            acc = sum(coefs[j] * s[i - 1 - j] for j in range(order))
            res.append(s[i] - (acc >> shift))
    else:
        raise ValueError(mode)

    write_residual(w, res, order, n, rice_method, part_order)


def write_residual(w, res, order, n, method, po):
    if n % (1 << po) != 0 or (n >> po) < order:
        po = 0
    w.bits(method, 2)
    w.bits(po, 4)
    param_bits = 4 if method == 0 else 5
    escape = 15 if method == 0 else 31
    idx = 0
    for p in range(1 << po):
        cnt = (n >> po) - (order if p == 0 else 0)
        part = res[idx:idx + cnt]
        idx += cnt
        tot = sum(abs(v) for v in part)
        k = 0
        while k < 28 and (max(1, len(part)) << k) < tot:
            k += 1
        if k >= escape:
            width = 1
            for v in part:
                need = max(1, v.bit_length() + 1)
                width = max(width, need)
            w.bits(escape, param_bits)
            w.bits(width, 5)
            for v in part:
                w.bits(v & ((1 << width) - 1), width)
        else:
            w.bits(k, param_bits)
            for v in part:
                u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
                w.unary(u >> k)
                if k:
                    w.bits(u & ((1 << k) - 1), k)


def encode(rate, ch, bps, samples, bs, stereo="independent",
           mode="fixed2", rice_method=0, part_order=0, lpc=None,
           use_wasted=False, force_sr_code=None):
    total = len(samples) // ch
    bytes_per = (bps + 7) // 8
    md = hashlib.md5()
    for v in samples:
        md.update(int(v).to_bytes(bytes_per, "little", signed=True))
    out = bytearray(streaminfo(rate, ch, bps, total, bs, md.digest()))

    start = 0
    frame_idx = 0
    while start < total:
        n = min(bs, total - start)
        w = BitWriter()
        w.bits(0xFF, 8)
        w.bits(0x3E, 6)
        w.bit(0)
        w.bit(0)  # fixed blocking
        if n in BS_TABLE:
            bs_code = BS_TABLE[n]
        elif n <= 256:
            bs_code = 6
        else:
            bs_code = 7
        w.bits(bs_code, 4)
        sr_code = force_sr_code if force_sr_code is not None \
            else SR_TABLE.get(rate, 0)
        w.bits(sr_code, 4)
        if ch == 2 and stereo != "independent":
            ch_code = {"leftside": 8, "rightside": 9, "midside": 10}[stereo]
        else:
            ch_code = ch - 1
        w.bits(ch_code, 4)
        w.bits(BPS_TABLE.get(bps, 0), 3)
        w.bit(0)
        coded_number(w, frame_idx)
        if bs_code == 6:
            w.bits(n - 1, 8)
        elif bs_code == 7:
            w.bits(n - 1, 16)
        if sr_code == 12:
            w.bits(rate // 1000, 8)
        elif sr_code == 13:
            w.bits(rate, 16)
        elif sr_code == 14:
            w.bits(rate // 10, 16)
        w.align()
        head = w.bytes()
        w2 = BitWriter()
        for byte in head:
            w2.bits(byte, 8)
        w2.bits(crc8(head), 8)

        planes = [[samples[(start + i) * ch + c] for i in range(n)]
                  for c in range(ch)]
        if ch == 2 and stereo == "leftside":
            chans = [planes[0],
                     [planes[0][i] - planes[1][i] for i in range(n)]]
            boosts = [0, 1]
        elif ch == 2 and stereo == "rightside":
            chans = [[planes[0][i] - planes[1][i] for i in range(n)],
                     planes[1]]
            boosts = [1, 0]
        elif ch == 2 and stereo == "midside":
            chans = [[(planes[0][i] + planes[1][i]) >> 1 for i in range(n)],
                     [planes[0][i] - planes[1][i] for i in range(n)]]
            boosts = [0, 1]
        else:
            chans = planes
            boosts = [0] * ch
        for c in range(len(chans)):
            write_subframe(w2, chans[c], bps + boosts[c], mode,
                           rice_method, part_order, lpc, use_wasted)
        w2.align()
        body = w2.bytes()
        w3 = BitWriter()
        for byte in body:
            w3.bits(byte, 8)
        w3.bits(crc16(body), 16)
        out += w3.bytes()
        frame_idx += 1
        start += n
    return bytes(out)


def formula_pcm(n_frames, ch, amp, salt, scale):
    out = []
    for frame in range(n_frames):
        for c in range(ch):
            v = ((frame + 7) * (salt + 3) * 2203 + c * 911) % (2 * amp + 1) - amp
            out.append(v * scale)
    return out


# name, rate, ch, bps, n_frames, amp, salt, scale, encoder kwargs
FIXTURES = [
    ("fixture_0.flac", 8000, 1, 16, 600, 9000, 1, 1,
     dict(bs=192, mode="fixed2")),
    ("fixture_1.flac", 16000, 2, 16, 500, 7000, 2, 1,
     dict(bs=128, mode="fixed1", stereo="midside", part_order=2)),
    ("fixture_2.flac", 8000, 1, 8, 300, 120, 3, 1,
     dict(bs=96, mode="lpc", lpc=([3, -1], 1, 4), part_order=1,
          force_sr_code=13)),
    ("fixture_3.flac", 44100, 2, 24, 256, 8000000, 4, 1,
     dict(bs=256, mode="fixed3", stereo="leftside")),
    ("fixture_4.flac", 8000, 1, 16, 400, 4000, 5, 8,
     dict(bs=100, mode="fixed1", use_wasted=True)),
    ("fixture_5.flac", 8000, 1, 16, 256, 32000, 6, 1,
     dict(bs=64, mode="fixed4", part_order=1)),
    ("fixture_6.flac", 22050, 2, 16, 700, 5000, 7, 1,
     dict(bs=144, mode="fixed1", stereo="rightside", rice_method=1)),
    ("fixture_7.flac", 8000, 1, 12, 350, 1800, 8, 1,
     dict(bs=175, mode="verbatim")),
    ("fixture_8.flac", 8000, 1, 16, 3000, 100, 9, 1,
     dict(bs=16, mode="fixed0")),
]


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, rate, ch, bps, nf, amp, salt, scale, kw in FIXTURES:
        pcm = formula_pcm(nf, ch, amp, salt, scale)
        blob = encode(rate, ch, bps, pcm, **kw)
        with open(os.path.join(OUT_DIR, name), "wb") as f:
            f.write(blob)
        print(f"{name}: {len(blob)} bytes, {nf} frames x {ch} ch @ {bps} bps")
    print("done")


if __name__ == "__main__":
    sys.exit(main())
