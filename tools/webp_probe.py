#!/usr/bin/env python3
"""Dev-time probe of libwebp (system libwebp.so.7) used to:

1. empirically extract the VP8L LZ77 distance-code -> (dx, dy) plane
   mapping (the 120-entry table from the WebP Lossless Bitstream
   Specification) by crafting minimal VP8L streams that emit one
   backward reference per distance code and observing which pixel
   libwebp copies — at two widths, so dx/dy separate;
2. generate lossless interop fixtures (WebPEncodeLosslessRGBA) for
   WebpSpec.

Craft-side stream layout: literal-only huffman codes (green uniform
9-bit over 256 literals + length-prefix-0 at 1 bit; r/b/a simple
1-symbol codes; distance a simple 1-symbol prefix code + raw extra
bits), no transforms, no color cache, no meta huffman.
"""
import ctypes, sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]


class W:
    def __init__(self):
        self.bits = []

    def b(self, v, n):  # n-bit value, LSB-first
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, v, n):  # huffman code, MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def riff(vp8l):
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def dist_extra(v):
    """distance value -> (prefix_symbol, extra_bits_count, extra_value)"""
    if v <= 4:
        return v - 1, 0, 0
    for s in range(4, 40):
        eb = (s - 2) >> 1
        off = (2 + (s & 1)) << eb
        if off + 1 <= v <= off + (1 << eb):
            return s, eb, v - off - 1
    raise ValueError(v)


def craft(w, h, dist_code_value):
    """literals 0..n-2 (distinct greens), one length-1 backref at the
    end with the given DISTANCE CODE value (1..120 => plane codes)."""
    o = W()
    o.b(w - 1, 14); o.b(h - 1, 14); o.b(0, 1); o.b(0, 3)
    o.b(0, 1)  # no more transforms
    o.b(0, 1)  # no color cache
    o.b(0, 1)  # no meta huffman
    # GREEN normal code: 256 literals @9 bits, symbol 256 @1 bit
    o.b(0, 1)          # not simple
    o.b(19 - 4, 4)     # all 19 code-length-code slots
    # order = [17,18,0,1,...,15,16]; lengths: {9:1, 16:2, 1:3, 18:3}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    cl_len = {9: 1, 16: 2, 1: 3, 18: 3}
    for s in order:
        o.b(cl_len.get(s, 0), 3)
    o.b(0, 1)  # no max_symbol
    # canonical CL codes: 9->0(1b); 16->10(2b); 1->110(3b), 18->111(3b)
    cl_code = {9: (0, 1), 16: (2, 2), 1: (6, 3), 18: (7, 3)}
    def cl(sym):
        c, n = cl_code[sym]
        o.code(c, n)
    cl(9)              # first literal length 9
    left = 255
    while left > 0:    # 16 = repeat prev 3..6 (2 extra bits)
        take = min(6, left) if left not in (1, 2, 7, 8) else 3
        if left < 3:
            for _ in range(left):
                cl(9)
            left = 0
            continue
        cl(16); o.b(take - 3, 2); left -= take
    cl(1)              # symbol 256: length-prefix 0, 1-bit code
    cl(18); o.b(23 - 11, 7)  # 23 zeros for symbols 257..279
    # RED/BLUE/ALPHA: simple 1-symbol codes
    for v in (7, 9, 255):
        o.b(1, 1); o.b(0, 1); o.b(1, 1); o.b(v, 8)
    # DISTANCE: simple 1-symbol code = the prefix symbol of our value
    s, eb, ev = dist_extra(dist_code_value)
    o.b(1, 1); o.b(0, 1); o.b(1, 1); o.b(s, 8)
    # pixels: n-1 literals, then one backref (length 1)
    n = w * h
    for i in range(n - 1):
        o.code(256 + (i & 0xff), 9)  # green literal i (canonical code)
    o.code(0, 1)                     # green symbol 256 -> length 1
    o.b(ev, eb)                      # distance extra bits
    return riff(b"\x2f" + o.bytes())


def decode(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    out = bytes(p[0:w.value * h.value * 4])
    return w.value, h.value, out


def probe_lut():
    rows = []
    for code in range(1, 121):
        ds = []
        for w, h in ((16, 10), (24, 8)):
            r = decode(craft(w, h, code))
            assert r, f"decode failed for code {code} w={w}"
            _, _, px = r
            n = w * h
            g = px[(n - 1) * 4 + 1]  # green of the last pixel
            ds.append((n - 1) - g)
        d16, d24 = ds
        dy = (d24 - d16) // 8
        dx = d16 - 16 * dy
        rows.append((dx, dy))
    return rows


def fixture(seed, w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(seed * 7 + x * 3 + y * 11) % 256,
                         (seed * 13 + x * 5 + y * 2) % 256,
                         (seed * 3 + x * 9 + y * 17) % 256, 255])
    out = ctypes.POINTER(ctypes.c_ubyte)()
    size = lib.WebPEncodeLosslessRGBA(bytes(px), w, h, w * 4,
                                      ctypes.byref(out))
    assert size > 0
    data = bytes(out[0:size])
    # verify round-trip through libwebp itself
    rw, rh, back = decode(data)
    assert (rw, rh, back) == (w, h, bytes(px)), "libwebp round-trip"
    return data


if __name__ == "__main__":
    if sys.argv[1:] == ["lut"]:
        lut = probe_lut()
        print("// (dx, dy) for distance codes 1..120, empirically")
        print("// extracted from libwebp 7.1.5 decode behavior")
        items = ", ".join(f"({dx}, {dy})" for dx, dy in lut)
        print(f"Array({items})")
    elif sys.argv[1:2] == ["fixture"]:
        seed, w, h = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print(fixture(seed, w, h).hex())
    elif sys.argv[1:2] == ["encode"]:
        # RGBA bytes on stdin -> lossless webp hex on stdout
        w, h = int(sys.argv[2]), int(sys.argv[3])
        px = sys.stdin.buffer.read()
        assert len(px) == w * h * 4, f"want {w*h*4} bytes, got {len(px)}"
        out = ctypes.POINTER(ctypes.c_ubyte)()
        size = lib.WebPEncodeLosslessRGBA(px, w, h, w * 4, ctypes.byref(out))
        assert size > 0, "libwebp encode failed"
        print(bytes(out[0:size]).hex())
    elif sys.argv[1:2] == ["encode-vp8"]:
        # RGBA on stdin -> LOSSY webp hex; args: w h quality
        # filter_strength segments partitions_log2
        w, h = int(sys.argv[2]), int(sys.argv[3])
        quality = float(sys.argv[4])
        fstr = int(sys.argv[5]); segs = int(sys.argv[6])
        plog = int(sys.argv[7]) if len(sys.argv) > 7 else 0
        px = sys.stdin.buffer.read()
        assert len(px) == w * h * 4
        import struct as st
        ABI = 0x200
        cfg = ctypes.create_string_buffer(512)
        assert lib.WebPConfigInitInternal(cfg, 0, ctypes.c_float(quality), ABI) == 1
        st.pack_into('<i', cfg, 24, segs)        # segments
        st.pack_into('<i', cfg, 32, fstr)        # filter_strength
        st.pack_into('<i', cfg, 44, 0)           # autofilter off
        st.pack_into('<i', cfg, 72, plog)        # partitions
        if len(sys.argv) > 8:                    # alpha_compression
            st.pack_into('<i', cfg, 48, int(sys.argv[8]))
        if len(sys.argv) > 9:                    # alpha_filtering
            st.pack_into('<i', cfg, 52, int(sys.argv[9]))
        pic = ctypes.create_string_buffer(512)
        assert lib.WebPPictureInitInternal(pic, ABI) == 1
        st.pack_into('<i', pic, 0, 1)            # use_argb
        st.pack_into('<i', pic, 8, w)
        st.pack_into('<i', pic, 12, h)
        assert lib.WebPPictureImportRGBA(pic, px, w * 4) == 1
        mw = ctypes.create_string_buffer(64)
        lib.WebPMemoryWriterInit(mw)
        WR = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
                              ctypes.c_size_t, ctypes.c_void_p)
        memwrite = WR(('WebPMemoryWrite', lib))
        st.pack_into('<Q', pic, 96,
                     ctypes.cast(memwrite, ctypes.c_void_p).value)
        st.pack_into('<Q', pic, 104, ctypes.addressof(mw))
        assert lib.WebPEncode(cfg, pic) == 1, \
            f"encode error {st.unpack_from('<i', pic, 136)[0]}"
        mem, size = st.unpack_from('<QQ', mw, 0)
        out = ctypes.string_at(mem, size)
        lib.WebPPictureFree(pic)
        print(out.hex())
    elif sys.argv[1:2] == ["decode-yuv"]:
        # webp on stdin -> "w h yhex uhex vhex" (planes cropped to
        # w / ceil(w/2) columns)
        data = sys.stdin.buffer.read()
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        w = ctypes.c_int(); h = ctypes.c_int()
        up = ctypes.POINTER(ctypes.c_ubyte)()
        vp = ctypes.POINTER(ctypes.c_ubyte)()
        stride = ctypes.c_int(); uvs = ctypes.c_int()
        yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                               ctypes.byref(h), ctypes.byref(up),
                               ctypes.byref(vp), ctypes.byref(stride),
                               ctypes.byref(uvs))
        assert yp, "libwebp yuv decode failed"
        W, H, S, US = w.value, h.value, stride.value, uvs.value
        uw, uh = (W + 1) // 2, (H + 1) // 2
        yb = b"".join(bytes(yp[r * S:r * S + W]) for r in range(H))
        ub = b"".join(bytes(up[r * US:r * US + uw]) for r in range(uh))
        vb = b"".join(bytes(vp[r * US:r * US + uw]) for r in range(uh))
        print(W, H, yb.hex(), ub.hex(), vb.hex())
    elif sys.argv[1:2] == ["decode"]:
        # webp bytes on stdin -> "w h rgbahex" on stdout
        data = sys.stdin.buffer.read()
        r = decode(data)
        assert r, "libwebp decode failed"
        w, h, px = r
        print(w, h, px.hex())
    else:
        print("usage: webp_probe.py lut | fixture <seed> <w> <h> | "
              "encode <w> <h> | decode")
