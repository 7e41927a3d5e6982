package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM bzip2 codec — the compression wrapper legacy corpus drops
  * and tarballs (.tar.bz2, .warc.bz2 era crawls) actually arrive in.
  * Built from the public bzip2 format (the BWT + MTF + RLE2 + Huffman
  * layout documented in the bzip2 sources and the community format
  * spec); interop-pinned BOTH directions against the system `bzip2`
  * CLI in Bzip2Spec. Reference semantics: the reference handles
  * gzip-wrapped text sources
  * (`gobblin-core/.../source/extractor/filebased/GZIPFileDownloader.java`)
  * but has no bzip2 path; this closes that gap for the LLM-curation
  * ingest tier.
  *
  * Decoder: multi-stream, multi-block, block+stream CRCs verified,
  * bomb-guarded, loud id-tagged failures. Randomized blocks (a
  * deprecated bzip2-0.9.0 misfeature no modern encoder emits) are
  * rejected by name.
  *
  * Encoder: correctness-first (rank-doubling rotation sort, true
  * depth-capped Huffman, 2 identical groups) — built for gate/fixture
  * synthesis and verified byte-level by the system bunzip2.
  */
object Bzip2Codec {

  private val BlockMagic = 0x314159265359L
  private val FooterMagic = 0x177245385090L

  def isBzip2(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9'

  // ------------------------------------------------------------------
  // bzip2's CRC-32 (poly 0x04c11db7, MSB-first, init/final 0xffffffff)
  // ------------------------------------------------------------------
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private final class Crc {
    private var v = 0xffffffff
    def update(b: Byte): Unit =
      v = (v << 8) ^ crcTable(((v >>> 24) ^ (b & 0xff)) & 0xff)
    def update(bs: Array[Byte], from: Int, until: Int): Unit = {
      var i = from
      while (i < until) { update(bs(i)); i += 1 }
    }
    def value: Int = ~v
  }

  // ------------------------------------------------------------------
  // bit IO (MSB-first)
  // ------------------------------------------------------------------
  private final class BitRd(b: Array[Byte], id: Long) {
    private var pos = 0L
    private val total = b.length.toLong * 8
    def bit(): Int = {
      require(pos < total, s"media $id: bzip2 stream truncated")
      val v = (b((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def bitsL(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def alignByte(): Unit = { pos = (pos + 7) & ~7L }
    def exhaustedAfterAlign: Boolean = { alignByte(); pos >= total }
    def bytePos: Int = (pos >> 3).toInt
  }

  private final class BitWr {
    private val out = new ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def bit(v: Int): Unit = {
      acc = (acc << 1) | (v & 1)
      nAcc += 1
      if (nAcc == 8) { out.write((acc & 0xff).toInt); acc = 0; nAcc = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit((v >> k) & 1); k -= 1 }
    }
    def bitsL(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit(((v >> k) & 1).toInt); k -= 1 }
    }
    def result(): Array[Byte] = {
      while (nAcc != 0) bit(0) // pad final byte with zeros
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------
  /** Decompress a (possibly multi-stream) bzip2 payload. Verifies
    * every block CRC and each stream's combined CRC; `maxBytes` is
    * the decompression-bomb guard.
    */
  def decompress(id: Long, bytes: Array[Byte], maxBytes: Long = 512L * 1024 * 1024): Array[Byte] = {
    require(isBzip2(bytes), s"media $id: not a bzip2 stream (bad magic)")
    val out = new ByteArrayOutputStream()
    val r = new BitRd(bytes, id)
    var more = true
    while (more) {
      // stream header
      require(r.bits(8) == 'B' && r.bits(8) == 'Z' && r.bits(8) == 'h',
        s"media $id: bzip2 stream header corrupt")
      val level = r.bits(8) - '0'
      require(level >= 1 && level <= 9, s"media $id: bzip2 level $level invalid")
      val maxBlock = level * 100000
      var streamCrc = 0
      var footer = false
      while (!footer) {
        val magic = r.bitsL(48)
        if (magic == FooterMagic) {
          val sc = r.bits(32)
          require(sc == streamCrc,
            s"media $id: bzip2 stream CRC mismatch (got ${Integer.toHexString(sc)}, computed ${Integer.toHexString(streamCrc)})")
          footer = true
        } else {
          require(magic == BlockMagic,
            s"media $id: bzip2 block magic corrupt (0x${java.lang.Long.toHexString(magic)})")
          val blockCrc = r.bits(32)
          require(r.bit() == 0,
            s"media $id: bzip2 randomized blocks (deprecated 0.9.0 misfeature) unsupported")
          val origPtr = r.bits(24)
          val block = decodeBlock(id, r, maxBlock, origPtr)
          // RLE1 expansion with CRC + bomb guard
          val crc = new Crc()
          var i = 0
          while (i < block.length) {
            val b = block(i)
            var run = 1
            while (run < 4 && i + run < block.length && block(i + run) == b) run += 1
            if (run == 4) {
              require(i + 4 < block.length, s"media $id: bzip2 RLE1 run missing count")
              val extra = block(i + 4) & 0xff
              val total = 4 + extra
              require(out.size().toLong + total <= maxBytes,
                s"media $id: bzip2 output exceeds $maxBytes-byte guard")
              var k = 0
              while (k < total) { out.write(b); crc.update(b); k += 1 }
              i += 5
            } else {
              require(out.size().toLong + run <= maxBytes,
                s"media $id: bzip2 output exceeds $maxBytes-byte guard")
              var k = 0
              while (k < run) { out.write(b); crc.update(b); k += 1 }
              i += run
            }
          }
          require(crc.value == blockCrc,
            s"media $id: bzip2 block CRC mismatch")
          streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
        }
      }
      more = !r.exhaustedAfterAlign &&
        r.bytePos + 4 <= bytes.length && bytes(r.bytePos) == 'B' &&
        bytes(r.bytePos + 1) == 'Z' && bytes(r.bytePos + 2) == 'h'
    }
    out.toByteArray
  }

  /** Decode one block's Huffman + MTF + RLE2 + inverse-BWT to the
    * pre-RLE1 bytes.
    */
  private def decodeBlock(id: Long, r: BitRd, maxBlock: Int, origPtr: Int): Array[Byte] = {
    // symbol map
    val used = new Array[Boolean](256)
    val ranges = r.bits(16)
    var nUsed = 0
    var i = 0
    while (i < 16) {
      if ((ranges & (0x8000 >> i)) != 0) {
        val m = r.bits(16)
        var j = 0
        while (j < 16) {
          if ((m & (0x8000 >> j)) != 0) { used(i * 16 + j) = true; nUsed += 1 }
          j += 1
        }
      }
      i += 1
    }
    require(nUsed > 0, s"media $id: bzip2 block uses no symbols")
    val seqToByte = new Array[Byte](nUsed)
    var si = 0
    i = 0
    while (i < 256) { if (used(i)) { seqToByte(si) = i.toByte; si += 1 }; i += 1 }
    val alpha = nUsed + 2 // RUNA, RUNB, MTF 1..nUsed-1, EOB

    val nGroups = r.bits(3)
    require(nGroups >= 2 && nGroups <= 6, s"media $id: bzip2 nGroups $nGroups invalid")
    val nSelectors = r.bits(15)
    require(nSelectors > 0, s"media $id: bzip2 zero selectors")
    // selectors, MTF-coded in unary
    val selMtf = Array.tabulate(nGroups)(identity)
    val selectors = new Array[Int](nSelectors)
    i = 0
    while (i < nSelectors) {
      var j = 0
      while (r.bit() == 1) {
        j += 1
        require(j < nGroups, s"media $id: bzip2 selector out of range")
      }
      val v = selMtf(j)
      while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
      selMtf(0) = v
      selectors(i) = v
      i += 1
    }

    // per-group canonical tables from delta-coded lengths
    val lens = Array.ofDim[Int](nGroups, alpha)
    var g = 0
    while (g < nGroups) {
      var l = r.bits(5)
      var s = 0
      while (s < alpha) {
        var cont = true
        while (cont) {
          require(l >= 1 && l <= 20, s"media $id: bzip2 code length $l out of range")
          if (r.bit() == 0) cont = false
          else if (r.bit() == 0) l += 1
          else l -= 1
        }
        lens(g)(s) = l
        s += 1
      }
      g += 1
    }
    // canonical decode tables: limit/base/perm per group
    val limit = Array.ofDim[Int](nGroups, 22)
    val base = Array.ofDim[Int](nGroups, 22)
    val perm = Array.ofDim[Int](nGroups, alpha)
    val minLens = new Array[Int](nGroups)
    g = 0
    while (g < nGroups) {
      val ls = lens(g)
      var minLen = 20
      var maxLen = 1
      var s = 0
      while (s < alpha) {
        if (ls(s) < minLen) minLen = ls(s)
        if (ls(s) > maxLen) maxLen = ls(s)
        s += 1
      }
      minLens(g) = minLen
      var pp = 0
      var l = minLen
      while (l <= maxLen) {
        s = 0
        while (s < alpha) { if (ls(s) == l) { perm(g)(pp) = s; pp += 1 }; s += 1 }
        l += 1
      }
      val cnt = new Array[Int](22)
      s = 0
      while (s < alpha) { cnt(ls(s) + 1) += 1; s += 1 }
      var k = 1
      while (k < 22) { cnt(k) += cnt(k - 1); k += 1 }
      var vec = 0
      l = minLen
      while (l <= maxLen) {
        vec += cnt(l + 1) - cnt(l)
        limit(g)(l) = vec - 1
        vec <<= 1
        l += 1
      }
      l = minLen + 1
      while (l <= maxLen) {
        base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
        l += 1
      }
      g += 1
    }

    def readSym(g: Int): Int = {
      var l = minLens(g)
      var v = r.bits(l)
      while (l <= 20 && v > limit(g)(l)) { v = (v << 1) | r.bit(); l += 1 }
      require(l <= 20, s"media $id: bzip2 Huffman decode desync")
      val idx = v - base(g)(l)
      require(idx >= 0 && idx < alpha, s"media $id: bzip2 Huffman symbol out of range")
      perm(g)(idx)
    }

    // MTF + RLE2 main decode
    val mtf = new Array[Byte](nUsed)
    System.arraycopy(seqToByte, 0, mtf, 0, nUsed)
    val bwt = new Array[Byte](maxBlock)
    var n = 0
    var groupPos = 0
    var groupCount = 0
    var eob = false
    var run = 0
    var runBit = 0
    val eobSym = alpha - 1
    def curGroup(): Int = {
      if (groupCount == 0) {
        require(groupPos < nSelectors, s"media $id: bzip2 ran out of selectors")
        groupCount = 50
        groupPos += 1
      }
      groupCount -= 1
      selectors(groupPos - 1)
    }
    def flushRun(): Unit = if (run > 0) {
      require(n + run <= maxBlock, s"media $id: bzip2 block overruns declared size")
      java.util.Arrays.fill(bwt, n, n + run, mtf(0))
      n += run
      run = 0
      runBit = 0
    }
    while (!eob) {
      val sym = readSym(curGroup())
      if (sym == 0) { run += 1 << runBit; runBit += 1 }      // RUNA
      else if (sym == 1) { run += 2 << runBit; runBit += 1 } // RUNB
      else {
        flushRun()
        if (sym == eobSym) eob = true
        else {
          // MTF value sym-1
          val j0 = sym - 1
          require(j0 < nUsed, s"media $id: bzip2 MTF index out of range")
          val v = mtf(j0)
          var j = j0
          while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
          mtf(0) = v
          require(n < maxBlock, s"media $id: bzip2 block overruns declared size")
          bwt(n) = v
          n += 1
        }
      }
    }
    require(origPtr >= 0 && origPtr < n, s"media $id: bzip2 origPtr $origPtr out of range ($n)")

    // inverse BWT (last-column walk)
    val counts = new Array[Int](256)
    i = 0
    while (i < n) { counts(bwt(i) & 0xff) += 1; i += 1 }
    val starts = new Array[Int](256)
    var tot = 0
    i = 0
    while (i < 256) { starts(i) = tot; tot += counts(i); i += 1 }
    val next = new Array[Int](n)
    i = 0
    while (i < n) {
      val b = bwt(i) & 0xff
      next(starts(b)) = i
      starts(b) += 1
      i += 1
    }
    val outBlock = new Array[Byte](n)
    var p = next(origPtr)
    i = 0
    while (i < n) { outBlock(i) = bwt(p); p = next(p); i += 1 }
    outBlock
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------
  /** Compress with declared level 1..9. Blocks are split so the
    * post-RLE1 payload stays under the declared block size.
    */
  def compress(data: Array[Byte], level: Int = 1): Array[Byte] = {
    require(level >= 1 && level <= 9, s"bzip2 level $level invalid")
    val maxBlock = level * 100000 - 20
    val w = new BitWr
    w.bits('B', 8); w.bits('Z', 8); w.bits('h', 8); w.bits('0' + level, 8)
    var streamCrc = 0
    var off = 0
    // empty input: header + footer with streamCrc 0, no blocks —
    // bzip2's own convention
    while (off < data.length) {
      // RLE1-encode until the block fills
      val rle = new ByteArrayOutputStream()
      val crc = new Crc()
      val start = off
      while (off < data.length && rle.size() < maxBlock - 5) {
        val b = data(off)
        var run = 1
        while (run < 255 && off + run < data.length && data(off + run) == b) run += 1
        if (run >= 4) {
          rle.write(b); rle.write(b); rle.write(b); rle.write(b)
          rle.write(run - 4)
        } else {
          var k = 0
          while (k < run) { rle.write(b); k += 1 }
        }
        off += run
      }
      crc.update(data, start, off)
      val blockCrc = crc.value
      streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
      w.bitsL(BlockMagic, 48)
      w.bits(blockCrc, 32)
      w.bit(0) // not randomized
      encodeBlock(w, rle.toByteArray)
    }
    w.bitsL(FooterMagic, 48)
    w.bits(streamCrc, 32)
    w.result()
  }

  /** Rotation sort by rank doubling — O(n log^2 n), worst-case safe. */
  private def bwtIndices(s: Array[Byte]): Array[Integer] = {
    val n = s.length
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s(i) & 0xff; i += 1 }
    val idx = Array.tabulate[Integer](n)(Integer.valueOf)
    var k = 1
    var done = false
    while (!done && k < n) {
      val r = rank
      val kk = k
      val cmp = new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int = {
          val c = java.lang.Integer.compare(r(a), r(b))
          if (c != 0) c
          else java.lang.Integer.compare(r((a + kk) % n), r((b + kk) % n))
        }
      }
      java.util.Arrays.sort(idx, cmp)
      val nr = new Array[Int](n)
      nr(idx(0)) = 0
      i = 1
      while (i < n) {
        nr(idx(i)) = nr(idx(i - 1)) +
          (if (cmp.compare(idx(i - 1), idx(i)) != 0) 1 else 0)
        i += 1
      }
      rank = nr
      if (rank(idx(n - 1)) == n - 1) done = true
      k <<= 1
    }
    idx
  }

  /** True Huffman lengths from frequencies, depth-capped at `cap`. */
  private def huffLengths(freq: Array[Int], cap: Int): Array[Int] = {
    val nSym = freq.length
    // (weight, node) heap; internal nodes track children
    val parent = new Array[Int](2 * nSym)
    val weight = new Array[Long](2 * nSym)
    val pq = new java.util.PriorityQueue[Integer](nSym,
      new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int =
          java.lang.Long.compare(weight(a), weight(b))
      })
    var i = 0
    while (i < nSym) {
      weight(i) = math.max(1, freq(i)).toLong
      pq.add(Integer.valueOf(i))
      i += 1
    }
    var nextNode = nSym
    while (pq.size() > 1) {
      val a = pq.poll().intValue()
      val b = pq.poll().intValue()
      weight(nextNode) = weight(a) + weight(b)
      parent(a) = nextNode
      parent(b) = nextNode
      pq.add(Integer.valueOf(nextNode))
      nextNode += 1
    }
    val root = nextNode - 1
    val lens = new Array[Int](nSym)
    i = 0
    while (i < nSym) {
      var d = 0
      var p = i
      while (p != root && nSym > 1) { p = parent(p); d += 1 }
      lens(i) = math.max(1, d)
      i += 1
    }
    // depth cap: repeatedly flatten (rare at gate scales; correctness
    // over optimality — raise an over-deep leaf's ancestor)
    var over = lens.exists(_ > cap)
    while (over) {
      // crude but valid: assign balanced lengths
      val l = math.max(1, 32 - Integer.numberOfLeadingZeros(nSym - 1))
      require(l <= cap, s"alphabet $nSym cannot fit depth cap $cap")
      // complete the code: some symbols at l-1 so Kraft sums to 1
      val atL = 2 * nSym - (1 << l)
      i = 0
      while (i < nSym) { lens(i) = if (i < nSym - atL) l - 1 else l; i += 1 }
      over = false
    }
    lens
  }

  private def encodeBlock(w: BitWr, rle: Array[Byte]): Unit = {
    val n = rle.length
    // BWT
    val (bwt, origPtr) =
      if (n == 0) (Array.emptyByteArray, 0)
      else {
        val idx = bwtIndices(rle)
        val out = new Array[Byte](n)
        var op = 0
        var i = 0
        while (i < n) {
          if (idx(i) == 0) op = i
          out(i) = rle((idx(i) + n - 1) % n)
          i += 1
        }
        (out, op)
      }
    w.bits(origPtr, 24)
    // symbol map
    val used = new Array[Boolean](256)
    bwt.foreach(b => used(b & 0xff) = true)
    if (n == 0) used(0) = true // at least one symbol for a well-formed map
    val byteToSeq = new Array[Int](256)
    var nUsed = 0
    var i = 0
    while (i < 256) { if (used(i)) { byteToSeq(i) = nUsed; nUsed += 1 }; i += 1 }
    var ranges = 0
    i = 0
    while (i < 16) {
      var any = false
      var j = 0
      while (j < 16) { if (used(i * 16 + j)) any = true; j += 1 }
      if (any) ranges |= 0x8000 >> i
      i += 1
    }
    w.bits(ranges, 16)
    i = 0
    while (i < 16) {
      if ((ranges & (0x8000 >> i)) != 0) {
        var m = 0
        var j = 0
        while (j < 16) { if (used(i * 16 + j)) m |= 0x8000 >> j; j += 1 }
        w.bits(m, 16)
      }
      i += 1
    }
    val alpha = nUsed + 2
    val eobSym = alpha - 1

    // MTF + RLE2
    val mtf = new Array[Int](nUsed)
    var mi = 0
    i = 0
    while (i < 256) { if (used(i)) { mtf(mi) = i; mi += 1 }; i += 1 }
    val syms = new java.util.ArrayList[Integer](n + 8)
    var zeroRun = 0
    def flushZeros(): Unit = {
      var r = zeroRun
      while (r > 0) {
        if ((r & 1) == 1) { syms.add(Integer.valueOf(0)); r = (r - 1) >> 1 } // RUNA
        else { syms.add(Integer.valueOf(1)); r = (r - 2) >> 1 }              // RUNB
      }
      zeroRun = 0
    }
    i = 0
    while (i < n) {
      val b = bwt(i) & 0xff
      var j = 0
      while (mtf(j) != b) j += 1
      if (j == 0) zeroRun += 1
      else {
        flushZeros()
        syms.add(Integer.valueOf(j + 1))
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = b
      }
      i += 1
    }
    flushZeros()
    syms.add(Integer.valueOf(eobSym))

    // one real Huffman table, emitted as 2 identical groups
    val freq = new Array[Int](alpha)
    i = 0
    while (i < syms.size()) { freq(syms.get(i).intValue()) += 1; i += 1 }
    val lens = huffLengths(freq, 17)
    // canonical codes in (length, symbol) order — the decoder's order
    val codes = new Array[Int](alpha)
    var code = 0
    var l = lens.min
    val maxLen = lens.max
    while (l <= maxLen) {
      var s = 0
      while (s < alpha) {
        if (lens(s) == l) { codes(s) = code; code += 1 }
        s += 1
      }
      code <<= 1
      l += 1
    }

    val nGroups = 2
    val nSelectors = (syms.size() + 49) / 50
    w.bits(nGroups, 3)
    w.bits(nSelectors, 15)
    i = 0
    while (i < nSelectors) { w.bit(0); i += 1 } // all select group 0
    var g = 0
    while (g < nGroups) {
      var cur = lens(0)
      w.bits(cur, 5)
      var s = 0
      while (s < alpha) {
        while (cur < lens(s)) { w.bit(1); w.bit(0); cur += 1 }
        while (cur > lens(s)) { w.bit(1); w.bit(1); cur -= 1 }
        w.bit(0)
        s += 1
      }
      g += 1
    }
    i = 0
    while (i < syms.size()) {
      val s = syms.get(i).intValue()
      w.bits(codes(s), lens(s))
      i += 1
    }
  }
}
