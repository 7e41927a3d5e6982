#!/usr/bin/env python3
"""Dev-time fixture generator for TiffSpec, driving the SYSTEM libtiff
(libtiff.so.6) via ctypes — the same interop pattern as
tools/webp_probe.py (libwebp) and the Pgp gpg pinning.

Writes src/main/resources/graft/tiff/fixture_N.tif for a matrix of
compressions/layouts, then re-decodes every fixture with libtiff's own
TIFFReadRGBAImageOriented and records dims + per-channel sums in
expected.txt. TiffSpec asserts (a) our Scala decode matches the
deterministic generator patterns EXACTLY (everything here is lossless)
and (b) the channel sums match libtiff's own decode — so a
fixture-staging mistake in this script cannot go unnoticed.

Pixel patterns are mirrored in TiffSpec — keep in sync:
  gray(x,y)        = (x*7 + y*13) % 256
  rgb(x,y,c)       = (x*3 + y*11 + c*97) % 256
  alpha(x,y)       = (x*5 + y*7) % 256
  palIdx(x,y)      = (x + y*5) % 256 ; pal r=i, g=255-i, b=(i*3)%256
  bit(x,y)         = (x//5 + y//3) % 2 == 0     (True = black ink)
  page p gray      = (x*7 + y*13 + p*17) % 256
  sweepRuns(i)     = run-length sweep exercising EVERY T.4 codeword
"""
import ctypes
import os
import sys

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "tiff")

lib = ctypes.CDLL("libtiff.so.6")
lib.TIFFOpen.restype = ctypes.c_void_p
lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
lib.TIFFClose.argtypes = [ctypes.c_void_p]
lib.TIFFWriteScanline.restype = ctypes.c_int
lib.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_uint32, ctypes.c_uint16]
lib.TIFFWriteEncodedTile.restype = ctypes.c_longlong
lib.TIFFWriteEncodedTile.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                     ctypes.c_void_p, ctypes.c_longlong]
lib.TIFFWriteDirectory.restype = ctypes.c_int
lib.TIFFWriteDirectory.argtypes = [ctypes.c_void_p]
lib.TIFFReadDirectory.restype = ctypes.c_int
lib.TIFFReadDirectory.argtypes = [ctypes.c_void_p]
lib.TIFFSetField.restype = ctypes.c_int
lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
lib.TIFFReadRGBAImageOriented.argtypes = [
    ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
    ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int]

T = dict(WIDTH=256, LENGTH=257, BITS=258, COMPRESSION=259, PHOTO=262,
         FILLORDER=266, ORIENTATION=274, SAMPLES=277, RPS=278,
         PLANAR=284, T4OPTS=292, TILEW=322, TILEL=323, PREDICTOR=317,
         COLORMAP=320)


def sf(tif, tag, *vals):
    r = lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), *vals)
    assert r == 1, f"TIFFSetField({tag}) failed"


def gray(x, y):
    return (x * 7 + y * 13) % 256


def rgb(x, y, c):
    return (x * 3 + y * 11 + c * 97) % 256


def alpha(x, y):
    return (x * 5 + y * 7) % 256


def pal_idx(x, y):
    return (x + y * 5) % 256


def bit(x, y):  # True = black ink (stored as 1 under MinIsWhite)
    return (x // 5 + y // 3) % 2 == 0


def sweep_runs(i):
    """Alternating white/black run lengths for sweep row i (remainder
    white). Covers terminating 0-63 both colours, every make-up
    64..2560 both colours, multi-make-up runs, and all-white/all-black
    rows. W = 2880."""
    if i < 64:
        return [i, 64 - i]
    if i < 103:
        return [64 * (i - 63), 5]
    if i < 142:
        return [1, 64 * (i - 102)]
    if i == 142:
        return [2623, 7]       # max single-make-up white run
    if i == 143:
        return [1, 2623]       # max single-make-up black run
    if i == 144:
        return []              # all white
    if i == 145:
        return [0, 2880]       # all black (multi-make-up: 2560+256+64t?)
    raise ValueError(i)


SWEEP_W, SWEEP_H = 2880, 146


def sweep_bit(x, i):
    runs = sweep_runs(i)
    pos, black = 0, False
    for r in runs:
        if pos <= x < pos + r:
            return black
        pos += r
        black = not black
    return False  # remainder white


def open_out(name):
    os.makedirs(OUT, exist_ok=True)
    return lib.TIFFOpen(os.path.join(OUT, name).encode(), b"w")


def write_rows(tif, height, rowbytes, rowfn):
    buf = ctypes.create_string_buffer(rowbytes)
    for y in range(height):
        row = rowfn(y)
        assert len(row) == rowbytes
        ctypes.memmove(buf, row, rowbytes)
        assert lib.TIFFWriteScanline(ctypes.c_void_p(tif), buf, y, 0) == 1


def gray_fixture(name, w, h, comp, pred=None, rps=16, be=False, orient=None):
    tif = open_out(name)
    sf(tif, T["WIDTH"], ctypes.c_uint32(w))
    sf(tif, T["LENGTH"], ctypes.c_uint32(h))
    sf(tif, T["BITS"], ctypes.c_int(8))
    sf(tif, T["SAMPLES"], ctypes.c_int(1))
    sf(tif, T["COMPRESSION"], ctypes.c_int(comp))
    sf(tif, T["PHOTO"], ctypes.c_int(1))
    sf(tif, T["PLANAR"], ctypes.c_int(1))
    sf(tif, T["RPS"], ctypes.c_uint32(rps))
    if pred:
        sf(tif, T["PREDICTOR"], ctypes.c_int(pred))
    if orient:
        sf(tif, T["ORIENTATION"], ctypes.c_int(orient))
    write_rows(tif, h, w, lambda y: bytes(gray(x, y) for x in range(w)))
    lib.TIFFClose(ctypes.c_void_p(tif))


def rgb_fixture(name, w, h, comp, pred=None, rps=8, samples=3):
    tif = open_out(name)
    sf(tif, T["WIDTH"], ctypes.c_uint32(w))
    sf(tif, T["LENGTH"], ctypes.c_uint32(h))
    sf(tif, T["BITS"], ctypes.c_int(8))
    sf(tif, T["SAMPLES"], ctypes.c_int(samples))
    sf(tif, T["COMPRESSION"], ctypes.c_int(comp))
    sf(tif, T["PHOTO"], ctypes.c_int(2))
    sf(tif, T["PLANAR"], ctypes.c_int(1))
    sf(tif, T["RPS"], ctypes.c_uint32(rps))
    if samples == 4:
        # one unassociated-alpha extra sample
        arr = (ctypes.c_uint16 * 1)(2)
        sf(tif, 338, ctypes.c_int(1), arr)
    if pred:
        sf(tif, T["PREDICTOR"], ctypes.c_int(pred))

    def row(y):
        out = bytearray()
        for x in range(w):
            out += bytes(rgb(x, y, c) for c in range(3))
            if samples == 4:
                out.append(alpha(x, y))
        return bytes(out)
    write_rows(tif, h, w * samples, row)
    lib.TIFFClose(ctypes.c_void_p(tif))


def bilevel_rows(w):
    stride = (w + 7) // 8

    def row(y):
        r = bytearray(stride)
        for x in range(w):
            if bit(x, y):
                r[x // 8] |= 0x80 >> (x % 8)
        return bytes(r)
    return stride, row


def fax_fixture(name, w, h, comp, photo=0, t4opts=None, fillorder=None,
                rowfn=None, stride=None):
    tif = open_out(name)
    sf(tif, T["WIDTH"], ctypes.c_uint32(w))
    sf(tif, T["LENGTH"], ctypes.c_uint32(h))
    sf(tif, T["BITS"], ctypes.c_int(1))
    sf(tif, T["SAMPLES"], ctypes.c_int(1))
    sf(tif, T["COMPRESSION"], ctypes.c_int(comp))
    sf(tif, T["PHOTO"], ctypes.c_int(photo))
    sf(tif, T["RPS"], ctypes.c_uint32(h))
    if t4opts is not None:
        sf(tif, T["T4OPTS"], ctypes.c_int(t4opts))
    if fillorder is not None:
        sf(tif, T["FILLORDER"], ctypes.c_int(fillorder))
    if rowfn is None:
        stride, rowfn = bilevel_rows(w)
    write_rows(tif, h, stride, rowfn)
    lib.TIFFClose(ctypes.c_void_p(tif))


def main():
    # 0-1: gray strips
    gray_fixture("fixture_0.tif", 61, 37, comp=1, rps=7)
    gray_fixture("fixture_1.tif", 61, 37, comp=5, pred=2, rps=16)
    # 2: rgb uncompressed big-endian
    # (libtiff can't choose byte order per file easily post-3.x via
    #  TIFFOpen mode flag "wb" -> big-endian)
    tif = lib.TIFFOpen(os.path.join(OUT, "fixture_2.tif").encode(), b"wb")
    sf(tif, T["WIDTH"], ctypes.c_uint32(40))
    sf(tif, T["LENGTH"], ctypes.c_uint32(25))
    sf(tif, T["BITS"], ctypes.c_int(8))
    sf(tif, T["SAMPLES"], ctypes.c_int(3))
    sf(tif, T["COMPRESSION"], ctypes.c_int(1))
    sf(tif, T["PHOTO"], ctypes.c_int(2))
    sf(tif, T["RPS"], ctypes.c_uint32(5))
    write_rows(tif, 25, 120,
               lambda y: bytes(rgb(x, y, c) for x in range(40) for c in range(3)))
    lib.TIFFClose(ctypes.c_void_p(tif))
    # 3-4: rgb LZW without/with predictor
    rgb_fixture("fixture_3.tif", 53, 29, comp=5)
    rgb_fixture("fixture_4.tif", 53, 29, comp=5, pred=2)
    # 5: rgb deflate predictor TILES
    W, H, TW, TH = 50, 30, 32, 16
    tif = open_out("fixture_5.tif")
    sf(tif, T["WIDTH"], ctypes.c_uint32(W))
    sf(tif, T["LENGTH"], ctypes.c_uint32(H))
    sf(tif, T["BITS"], ctypes.c_int(8))
    sf(tif, T["SAMPLES"], ctypes.c_int(3))
    sf(tif, T["COMPRESSION"], ctypes.c_int(8))
    sf(tif, T["PHOTO"], ctypes.c_int(2))
    sf(tif, T["PLANAR"], ctypes.c_int(1))
    sf(tif, T["TILEW"], ctypes.c_uint32(TW))
    sf(tif, T["TILEL"], ctypes.c_uint32(TH))
    sf(tif, T["PREDICTOR"], ctypes.c_int(2))
    tileno = 0
    for ty in range(0, H, TH):
        for tx in range(0, W, TW):
            t = bytearray(TW * TH * 3)
            for yy in range(TH):
                for xx in range(TW):
                    x, y = tx + xx, ty + yy
                    for c in range(3):
                        t[(yy * TW + xx) * 3 + c] = \
                            rgb(x, y, c) if (x < W and y < H) else 0
            b = ctypes.create_string_buffer(bytes(t), TW * TH * 3)
            assert lib.TIFFWriteEncodedTile(
                ctypes.c_void_p(tif), tileno, b, TW * TH * 3) > 0
            tileno += 1
    lib.TIFFClose(ctypes.c_void_p(tif))
    # 6: rgb packbits
    rgb_fixture("fixture_6.tif", 47, 31, comp=32773, rps=6)
    # 7: RGBA LZW predictor
    rgb_fixture("fixture_7.tif", 33, 21, comp=5, pred=2, samples=4)
    # 8: palette uncompressed
    tif = open_out("fixture_8.tif")
    W, H = 45, 27
    sf(tif, T["WIDTH"], ctypes.c_uint32(W))
    sf(tif, T["LENGTH"], ctypes.c_uint32(H))
    sf(tif, T["BITS"], ctypes.c_int(8))
    sf(tif, T["SAMPLES"], ctypes.c_int(1))
    sf(tif, T["COMPRESSION"], ctypes.c_int(1))
    sf(tif, T["PHOTO"], ctypes.c_int(3))
    sf(tif, T["RPS"], ctypes.c_uint32(H))
    rmap = (ctypes.c_uint16 * 256)(*[i * 257 for i in range(256)])
    gmap = (ctypes.c_uint16 * 256)(*[(255 - i) * 257 for i in range(256)])
    bmap = (ctypes.c_uint16 * 256)(*[((i * 3) % 256) * 257 for i in range(256)])
    sf(tif, T["COLORMAP"], rmap, gmap, bmap)
    write_rows(tif, H, W, lambda y: bytes(pal_idx(x, y) for x in range(W)))
    lib.TIFFClose(ctypes.c_void_p(tif))
    # 9-11: bilevel fax family
    fax_fixture("fixture_9.tif", 80, 40, comp=4)            # G4
    fax_fixture("fixture_10.tif", 80, 40, comp=3, t4opts=0)  # G3 1D
    fax_fixture("fixture_11.tif", 80, 40, comp=2)            # MH-RLE
    # 12: bilevel uncompressed MinIsBlack
    fax_fixture("fixture_12.tif", 80, 40, comp=1, photo=1)
    # 13: gray LZW predictor big-endian
    tif = lib.TIFFOpen(os.path.join(OUT, "fixture_13.tif").encode(), b"wb")
    sf(tif, T["WIDTH"], ctypes.c_uint32(61))
    sf(tif, T["LENGTH"], ctypes.c_uint32(37))
    sf(tif, T["BITS"], ctypes.c_int(8))
    sf(tif, T["SAMPLES"], ctypes.c_int(1))
    sf(tif, T["COMPRESSION"], ctypes.c_int(5))
    sf(tif, T["PHOTO"], ctypes.c_int(1))
    sf(tif, T["RPS"], ctypes.c_uint32(16))
    sf(tif, T["PREDICTOR"], ctypes.c_int(2))
    write_rows(tif, 37, 61, lambda y: bytes(gray(x, y) for x in range(61)))
    lib.TIFFClose(ctypes.c_void_p(tif))
    # 14: rgb legacy deflate code 32946
    rgb_fixture("fixture_14.tif", 53, 29, comp=32946)
    # 15-16: T.4 codeword sweep, G4 and MH-RLE
    stride = (SWEEP_W + 7) // 8

    def sweep_row(i):
        r = bytearray(stride)
        for x in range(SWEEP_W):
            if sweep_bit(x, i):
                r[x // 8] |= 0x80 >> (x % 8)
        return bytes(r)
    fax_fixture("fixture_15.tif", SWEEP_W, SWEEP_H, comp=4,
                rowfn=sweep_row, stride=stride)
    fax_fixture("fixture_16.tif", SWEEP_W, SWEEP_H, comp=2,
                rowfn=sweep_row, stride=stride)
    # 17: 3-page gray LZW
    tif = open_out("fixture_17.tif")
    for p in range(3):
        sf(tif, T["WIDTH"], ctypes.c_uint32(61))
        sf(tif, T["LENGTH"], ctypes.c_uint32(37))
        sf(tif, T["BITS"], ctypes.c_int(8))
        sf(tif, T["SAMPLES"], ctypes.c_int(1))
        sf(tif, T["COMPRESSION"], ctypes.c_int(5))
        sf(tif, T["PHOTO"], ctypes.c_int(1))
        sf(tif, T["RPS"], ctypes.c_uint32(16))
        write_rows(tif, 37, 61,
                   lambda y, p=p: bytes((gray(x, y) + p * 17) % 256
                                        for x in range(61)))
        assert lib.TIFFWriteDirectory(ctypes.c_void_p(tif)) == 1
    lib.TIFFClose(ctypes.c_void_p(tif))
    # 18: G3 with 2D encoding enabled
    fax_fixture("fixture_18.tif", 80, 40, comp=3, t4opts=1)
    # 19: MH-RLE with FillOrder 2 (LSB-first bytes)
    fax_fixture("fixture_19.tif", 80, 40, comp=2, fillorder=2)
    # 20: gray uncompressed with Orientation=3 (180deg; sums invariant)
    gray_fixture("fixture_20.tif", 61, 37, comp=1, rps=37, orient=3)

    # ---- expected manifest: libtiff's OWN decode of each fixture ----
    lines = []
    for i in range(21):
        path = os.path.join(OUT, f"fixture_{i}.tif")
        tif = lib.TIFFOpen(path.encode(), b"r")
        assert tif, path
        # dims via TIFFGetField
        lib.TIFFGetField.restype = ctypes.c_int
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        assert lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(256),
                                ctypes.byref(w)) == 1
        assert lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(257),
                                ctypes.byref(h)) == 1
        W, H = w.value, h.value
        raster = (ctypes.c_uint32 * (W * H))()
        # request ORIENTATION_TOPLEFT(1); libtiff folds in the file's
        # own Orientation tag
        assert lib.TIFFReadRGBAImageOriented(
            ctypes.c_void_p(tif), W, H, raster, 1, 1) == 1, path
        npages = 1
        while lib.TIFFReadDirectory(ctypes.c_void_p(tif)) == 1:
            npages += 1
        lib.TIFFClose(ctypes.c_void_p(tif))
        rs = gs = bs = as_ = 0
        for v in raster:
            rs += v & 0xff
            gs += (v >> 8) & 0xff
            bs += (v >> 16) & 0xff
            as_ += (v >> 24) & 0xff
        lines.append(f"{i} {W} {H} {npages} {rs} {gs} {bs} {as_}")
        print(lines[-1])
    with open(os.path.join(OUT, "expected.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
