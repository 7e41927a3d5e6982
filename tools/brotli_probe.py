#!/usr/bin/env python3
"""Dev-time probe of the system brotli libraries, used to:

1. extract RFC 7932's normative data — the static dictionary
   (Appendix A, 122,784 bytes + size_bits_by_length) and the 121
   word transforms (Appendix B) — via the PUBLIC BrotliGetDictionary /
   BrotliGetTransforms APIs, writing them as resources for the Scala
   decoder;
2. extract the four literal-context lookup tables (RFC 7932 §7.1)
   from libbrotlidec's rodata, anchored on the arithmetically-known
   LSB6+MSB6 prefix (the same empirical-extraction recipe as the VP8
   tables from libwebp);
3. serve as the encode bridge for BrotliSpec's fuzz interop:
   `brotli_probe.py encode <quality> <lgwin>` compresses stdin with
   BrotliEncoderCompress and writes the stream to stdout.
"""
import ctypes
import os
import sys

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "brotli")

common = ctypes.CDLL("libbrotlicommon.so.1")
enc = ctypes.CDLL("libbrotlienc.so.1")


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


def extract_dictionary():
    common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = common.BrotliGetDictionary().contents
    data = bytes(ctypes.cast(d.data,
                             ctypes.POINTER(ctypes.c_uint8 * d.size)).contents)
    bits = bytes(d.size_bits_by_length)
    offs = list(d.offsets_by_length)
    print("dictionary size:", d.size)
    print("size_bits_by_length:", list(bits))
    print("offsets:", offs)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "dictionary.bin"), "wb") as f:
        f.write(bits)                       # 32 bytes
        for o in offs:                      # 32 * 4 bytes LE
            f.write(o.to_bytes(4, "little"))
        f.write(data)                       # 122,784 bytes
    return d.size


def extract_transforms():
    common.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    t = common.BrotliGetTransforms().contents
    n = t.num_transforms
    pss = t.prefix_suffix_size
    ps = bytes(ctypes.cast(t.prefix_suffix,
                           ctypes.POINTER(ctypes.c_uint8 * pss)).contents)
    pmap = list(ctypes.cast(t.prefix_suffix_map,
                            ctypes.POINTER(ctypes.c_uint16 * 256)).contents)
    tr = bytes(ctypes.cast(t.transforms,
                           ctypes.POINTER(ctypes.c_uint8 * (n * 3))).contents)
    # triples: (prefix_idx, transform_type, suffix_idx); prefix/suffix
    # strings are length-prefixed in prefix_suffix at map offsets
    def piece(idx):
        off = pmap[idx]
        ln = ps[off]
        return ps[off + 1: off + 1 + ln]
    print("num_transforms:", n)
    with open(os.path.join(OUT, "transforms.txt"), "wb") as f:
        for i in range(n):
            p = piece(tr[i * 3])
            typ = tr[i * 3 + 1]
            s = piece(tr[i * 3 + 2])
            f.write(p.hex().encode() + b" " + str(typ).encode() + b" " +
                    s.hex().encode() + b"\n")
    return n


def extract_context_luts():
    # the 2048-byte kContextLookup: modes LSB6, MSB6, UTF8, SIGNED,
    # each 512 bytes (Lut for p1 then p2). The first 1024 bytes are
    # arithmetically known -> anchor, then slice UTF8+SIGNED.
    lsb6 = bytes((i & 0x3f) for i in range(256)) + bytes(256)
    msb6 = bytes((i >> 2) for i in range(256)) + bytes(256)
    anchor = lsb6 + msb6
    at = -1
    for path in ("/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1",
                 "/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1"):
        blob = open(path, "rb").read()
        at = blob.find(anchor)
        if at >= 0:
            break
    assert at >= 0, "context LUT anchor not found in brotli libraries"
    luts = blob[at: at + 2048]
    with open(os.path.join(OUT, "context_luts.bin"), "wb") as f:
        f.write(luts)
    print("context LUTs at", at)
    # sanity: each mode's halves OR together into a 6-bit context id:
    # UTF8 p1 is pre-shifted <<2 (p2 contributes 2 low bits); SIGNED
    # p1 is pre-shifted <<3 (p2 contributes 3 low bits)
    utf8 = luts[1024:1536]
    assert max(utf8[:256]) < 64 and max(utf8[256:]) < 4
    signed = luts[1536:2048]
    assert max(signed[:256]) < 64 and max(signed[256:]) < 8
    return at


def encode_stdin(quality, lgwin):
    data = sys.stdin.buffer.read()
    enc.BrotliEncoderCompress.restype = ctypes.c_int
    enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    out_size = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    out = ctypes.create_string_buffer(out_size.value)
    # mode 0 = GENERIC
    r = enc.BrotliEncoderCompress(quality, lgwin, 0, len(data), data,
                                  ctypes.byref(out_size), out)
    assert r == 1, "BrotliEncoderCompress failed"
    sys.stdout.buffer.write(out.raw[:out_size.value])


def compress(data, quality, lgwin):
    enc.BrotliEncoderCompress.restype = ctypes.c_int
    enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    out_size = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    out = ctypes.create_string_buffer(out_size.value)
    r = enc.BrotliEncoderCompress(quality, lgwin, 0, len(data), data,
                                  ctypes.byref(out_size), out)
    assert r == 1
    return out.raw[:out_size.value]


def gate_line(k, i):
    """Mirrored in q_brotli_ingest's oracle SQL — keep in sync."""
    words = " ".join(f"b{(k * 37 + i * 19 + j * 11) % 89}"
                     for j in range(4 + i % 5))
    return f"page{k * 100 + i} {words}\n"


def gate_fixtures():
    """fixture_k.br for k in 0..7: libbrotli-encoded deterministic
    lines (quality sweeps 1..11) for the q_brotli_ingest gate."""
    os.makedirs(OUT, exist_ok=True)
    for k in range(8):
        data = "".join(gate_line(k, i) for i in range(15 + 3 * k)).encode()
        q = [1, 4, 6, 9, 11, 5, 10, 2][k]
        with open(os.path.join(OUT, f"fixture_{k}.br"), "wb") as f:
            f.write(compress(data, q, 22))
        print("fixture", k, "quality", q)


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "encode":
        encode_stdin(int(sys.argv[2]), int(sys.argv[3]))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "fixtures":
        gate_fixtures()
        return
    extract_dictionary()
    extract_transforms()
    extract_context_luts()


if __name__ == "__main__":
    sys.exit(main())
