package graft.functions

/** pHash — DCT perceptual image hash (the classic 64-bit pHash:
  * low-frequency 8x8 corner of a 32x32 DCT, bits = coefficient above
  * the AC median) in EXACT fixed-point integer arithmetic, so the
  * driver oracle replays every bit from the generator formula and the
  * SAME quantized cosine table (interpolated into the SQL from this
  * object — one source of truth, zero float-trig drift between
  * engines).
  *
  * Versus aHash (`operators/Multimodal.aHashBmp`), pHash keys on
  * spatial frequency STRUCTURE rather than per-cell brightness: a
  * uniform brightness shift moves (almost) only the DC coefficient —
  * every odd-frequency basis row sums to exactly zero even after
  * quantization (the table is rounded sign-symmetrically) — so
  * re-graded copies collapse to tiny hamming distances that aHash
  * spreads. Same 64-bit output contract, so near-dup rides the same
  * `Similarity.hammingPairs64` banded shuffle.
  *
  * Arithmetic bounds: gray cell values are 2x2-or-larger box SUMS of
  * r+g+b bytes (division-free). With the 2^14 table scale, the
  * two-pass transform peaks at 32 * 32 * gmax * 2^28; inputs up to
  * 4096x4096 keep every intermediate under 2^62 — exact longs, no
  * wraparound.
  */
object PerceptualHash {

  val Scale: Long = 1L << 14

  /** Quantized DCT-II basis, rows u = 0..7 over x = 0..31:
    * `C(u,x) = round(cos(pi * (2x+1) * u / 64) * 2^14)`, rounded
    * half-away-from-zero (sign-symmetric, so the exact identity
    * `C(u, 31-x) = -C(u, x)` for odd u survives quantization and
    * uniform-brightness energy cancels). StrictMath: reproducible on
    * every JVM.
    */
  val Dct: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    val c = StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 64.0)
    (math.signum(c) * math.floor(math.abs(c) * Scale + 0.5)).toLong
  }

  /** The table as a DuckDB list-of-lists literal — oracle SQL builders
    * interpolate this so both engines share the identical constants.
    */
  def dctSqlLiteral: String =
    Dct.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** 64-bit pHash of a 32x32 grayscale grid `g` (row-major, g(y*32+x),
    * exact non-negative longs). Two-pass separable DCT keeps it
    * O(8*32*32); bits are MSB-first in (u,v) raster order — bit 63 is
    * the excluded DC slot, always 0 — and each bit is
    * `F(u,v) > median` where median is the 32nd-smallest (index 31)
    * of the 63 AC coefficients, the standard pHash threshold.
    */
  def phash64Gray32(g: Array[Long]): Long = {
    require(g.length == 1024, s"phash expects 32x32 grid, got ${g.length}")
    // pass 1: T(u,y) = sum_x g(x,y) * C(u,x)
    val t = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      val row = Dct(u)
      var y = 0
      while (y < 32) {
        var acc = 0L
        var x = 0
        while (x < 32) { acc += g(y * 32 + x) * row(x); x += 1 }
        t(u)(y) = acc
        y += 1
      }
      u += 1
    }
    // pass 2: F(u,v) = sum_y T(u,y) * C(v,y); collect the 63 AC terms
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var y = 0
        while (y < 32) { acc += t(u)(y) * Dct(v)(y); y += 1 }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(f, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    var i = 1
    while (i < 64) {
      if (f(i) > med) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }
}
