package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM XZ (.xz / LZMA2) decoder — the compression wrapper modern
  * public corpus drops actually ship in (Wikipedia dumps, OSCAR,
  * many HF datasets are .xz). Built from the public xz file-format
  * specification and the LZMA specification (Igor Pavlov's public
  * reference description); interop-pinned against the system `xz`
  * CLI across presets, lc/lp/pb variants, multi-block and
  * multi-stream files in XzSpec.
  *
  * Coverage: stream header/footer, block headers with optional sizes,
  * the LZMA2 filter (all chunk kinds, state/props/dict resets),
  * checks none/CRC32/CRC64/SHA-256 (verified, not skipped), index
  * parsing, stream padding and concatenated streams. BCJ filters are
  * rejected loudly by name (text corpora never carry them). Decoder
  * only by design — encoding stays with the system tool; gates use
  * committed fixtures over generator-deterministic content.
  */
object XzCodec {

  def isXz(b: Array[Byte]): Boolean =
    b.length >= 6 && (b(0) & 0xff) == 0xfd && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0

  // ------------------------------------------------------------------
  // CRC64 (ECMA-182 reflected, the xz default check)
  // ------------------------------------------------------------------
  private val crc64Table: Array[Long] = {
    val poly = 0xC96C5795D7870F42L
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1L) != 0) (c >>> 1) ^ poly else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc64(b: Array[Byte], from: Int, until: Int): Long = {
    var c = ~0L
    var i = from
    while (i < until) {
      c = (c >>> 8) ^ crc64Table(((c ^ b(i)) & 0xff).toInt)
      i += 1
    }
    ~c
  }

  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, from, until - from)
    c.getValue
  }

  // ------------------------------------------------------------------
  // container walk
  // ------------------------------------------------------------------
  private final class Rd(val b: Array[Byte], id: Long) {
    var pos = 0
    def u8(): Int = {
      require(pos < b.length, s"media $id: xz stream truncated at $pos")
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def u16be(): Int = (u8() << 8) | u8()
    def u32le(): Long = {
      var v = 0L
      var k = 0
      while (k < 4) { v |= u8().toLong << (8 * k); k += 1 }
      v
    }
    def u64le(): Long = {
      var v = 0L
      var k = 0
      while (k < 8) { v |= u8().toLong << (8 * k); k += 1 }
      v
    }
    def vli(): Long = {
      var v = 0L
      var shift = 0
      var cont = true
      while (cont) {
        require(shift < 63, s"media $id: xz VLI overlong")
        val x = u8()
        v |= (x & 0x7f).toLong << shift
        shift += 7
        cont = (x & 0x80) != 0
      }
      v
    }
    def skip(n: Int): Unit = {
      require(pos + n <= b.length, s"media $id: xz stream truncated (skip $n at $pos)")
      pos += n
    }
    def remaining: Int = b.length - pos
  }

  /** Decompress a (possibly multi-stream) .xz payload; every block's
    * integrity check is verified. `maxBytes` bounds the output.
    */
  def decompress(id: Long, bytes: Array[Byte],
      maxBytes: Long = 512L * 1024 * 1024): Array[Byte] = {
    require(isXz(bytes), s"media $id: not an xz stream (bad magic)")
    val out = new ByteArrayOutputStream()
    val r = new Rd(bytes, id)
    while (r.remaining > 0) {
      // stream padding between streams: 4-byte zero runs
      if (bytes(r.pos) == 0) {
        require(r.remaining >= 4 && bytes(r.pos + 1) == 0 &&
          bytes(r.pos + 2) == 0 && bytes(r.pos + 3) == 0,
          s"media $id: xz stream padding not 4-aligned zeros")
        r.skip(4)
      } else {
        decodeStream(id, r, out, maxBytes)
      }
    }
    out.toByteArray
  }

  /** Decode the legacy `.lzma` "alone" format (the pre-xz wrapper the
    * early Wikipedia-dump era used): 1 props byte, 4-byte dict size,
    * 8-byte uncompressed size (all-FF = unknown, terminated by the
    * LZMA end-of-stream marker), then a single LZMA1 stream. There is
    * NO magic and NO checksum — callers route explicitly by name,
    * never via content sniffing.
    */
  def decompressLzmaAlone(id: Long, bytes: Array[Byte],
      maxBytes: Long = 512L * 1024 * 1024): Array[Byte] = {
    require(bytes.length >= 14, s"media $id: .lzma payload too short")
    val props = bytes(0) & 0xff
    require(props < 9 * 5 * 5, s"media $id: .lzma props byte $props invalid")
    var size = 0L
    var k = 0
    while (k < 8) { size |= (bytes(5 + k) & 0xffL) << (8 * k); k += 1 }
    val known = size != -1L
    require(!known || size <= maxBytes,
      s"media $id: .lzma declared size $size exceeds $maxBytes-byte guard")
    require(!known || size <= Int.MaxValue - 8,
      s"media $id: .lzma declared size $size too large for one buffer")
    val dict = new Dict(maxBytes, id)
    val rc = new RangeDec(bytes, 13, bytes.length - 13, id)
    val st = new LzmaState(props)
    st.decode(rc, dict,
      if (known) size.toInt else Int.MaxValue, allowEndMarker = true)
    val out = dict.result()
    require(!known || out.length.toLong == size,
      s"media $id: .lzma produced ${out.length} of declared $size bytes")
    out
  }

  private def decodeStream(id: Long, r: Rd, out: ByteArrayOutputStream,
      maxBytes: Long): Unit = {
    // stream header
    require(r.remaining >= 12, s"media $id: xz stream header truncated")
    require(isXz(java.util.Arrays.copyOfRange(r.b, r.pos, r.pos + 6)),
      s"media $id: xz stream magic corrupt")
    r.skip(6)
    val flagsPos = r.pos
    val f0 = r.u8()
    val checkType = r.u8()
    require(f0 == 0 && (checkType & 0xf0) == 0,
      s"media $id: xz reserved stream flags set")
    val hdrCrc = r.u32le()
    require(hdrCrc == crc32(r.b, flagsPos, flagsPos + 2),
      s"media $id: xz stream header CRC mismatch")
    val checkSize = checkType match {
      case 0x00 => 0
      case 0x01 => 4  // CRC32
      case 0x04 => 8  // CRC64
      case 0x0a => 32 // SHA-256
      case other => throw new IllegalArgumentException(
        s"media $id: xz check type 0x${Integer.toHexString(other)} unsupported")
    }

    var inIndex = false
    while (!inIndex) {
      val hdrStart = r.pos
      val sizeByte = r.u8()
      if (sizeByte == 0) {
        // index indicator: parse + verify shape, then footer
        inIndex = true
        val nRecords = r.vli()
        var k = 0L
        while (k < nRecords) { r.vli(); r.vli(); k += 1 }
        // index padding to 4-align (relative to index start = hdrStart)
        while ((r.pos - hdrStart) % 4 != 0) {
          require(r.u8() == 0, s"media $id: xz index padding nonzero")
        }
        val idxCrc = r.u32le()
        require(idxCrc == crc32(r.b, hdrStart, r.pos - 4),
          s"media $id: xz index CRC mismatch")
        // stream footer: crc32, backward size, flags, "YZ"
        val ftCrc = r.u32le()
        val ftBody = r.pos
        r.skip(4) // backward size
        val ff0 = r.u8(); val ffCheck = r.u8()
        require(ff0 == 0 && ffCheck == checkType,
          s"media $id: xz footer flags disagree with header")
        require(ftCrc == crc32(r.b, ftBody, ftBody + 6),
          s"media $id: xz footer CRC mismatch")
        require(r.u8() == 'Y' && r.u8() == 'Z',
          s"media $id: xz footer magic corrupt")
      } else {
        // block header
        val hdrSize = (sizeByte + 1) * 4
        val blockFlags = r.u8()
        val nFilters = (blockFlags & 0x03) + 1
        require((blockFlags & 0x3c) == 0, s"media $id: xz reserved block flags set")
        val hasCompSize = (blockFlags & 0x40) != 0
        val hasUncompSize = (blockFlags & 0x80) != 0
        if (hasCompSize) r.vli()
        val declaredUncomp = if (hasUncompSize) Some(r.vli()) else None
        var dictSize = 0L
        var sawLzma2 = false
        var fi = 0
        while (fi < nFilters) {
          val fid = r.vli()
          val propsLen = r.vli().toInt
          if (fid == 0x21L) {
            require(propsLen == 1, s"media $id: xz LZMA2 props length $propsLen")
            val p = r.u8()
            require((p & 0xc0) == 0, s"media $id: xz LZMA2 dict-size byte reserved bits set")
            dictSize = if (p == 40) 0xffffffffL
            else (2L | (p & 1L)) << (p / 2 + 11)
            sawLzma2 = true
          } else {
            throw new IllegalArgumentException(
              s"media $id: xz filter 0x${java.lang.Long.toHexString(fid)} unsupported (LZMA2 only; BCJ/delta rejected by name)")
          }
          fi += 1
        }
        require(sawLzma2, s"media $id: xz block without LZMA2 filter")
        // header padding + CRC
        while (r.pos - hdrStart < hdrSize - 4) {
          require(r.u8() == 0, s"media $id: xz block header padding nonzero")
        }
        val bhCrc = r.u32le()
        require(bhCrc == crc32(r.b, hdrStart, hdrStart + hdrSize - 4),
          s"media $id: xz block header CRC mismatch")

        // block data: LZMA2 chunks
        val data = decodeLzma2(id, r, maxBytes - out.size())
        declaredUncomp.foreach(d => require(d == data.length,
          s"media $id: xz block uncompressed size mismatch (${data.length} vs declared $d)"))
        // block padding to 4-align (relative to block start)
        while ((r.pos - hdrStart) % 4 != 0) {
          require(r.u8() == 0, s"media $id: xz block padding nonzero")
        }
        // integrity check over this block's decompressed bytes
        checkSize match {
          case 0 =>
          case 4 =>
            val got = r.u32le()
            require(got == crc32(data, 0, data.length),
              s"media $id: xz block CRC32 mismatch")
          case 8 =>
            val got = r.u64le()
            require(got == crc64(data, 0, data.length),
              s"media $id: xz block CRC64 mismatch")
          case 32 =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            md.update(data)
            val want = md.digest()
            val got = new Array[Byte](32)
            var k = 0
            while (k < 32) { got(k) = r.u8().toByte; k += 1 }
            require(java.util.Arrays.equals(got, want),
              s"media $id: xz block SHA-256 mismatch")
        }
        out.write(data)
      }
    }
  }

  // ------------------------------------------------------------------
  // LZMA2 chunk layer
  // ------------------------------------------------------------------
  /** Decode one block's LZMA2 chunk sequence; returns the block's
    * decompressed bytes (which double as the LZMA dictionary — the
    * window persists across chunks until a dict-reset chunk).
    */
  private def decodeLzma2(id: Long, r: Rd, maxBytes: Long): Array[Byte] = {
    val dict = new Dict(maxBytes, id)
    var lzma: LzmaState = null
    var props = -1
    var done = false
    while (!done) {
      val control = r.u8()
      if (control == 0x00) done = true
      else if (control == 0x01 || control == 0x02) {
        // uncompressed chunk; 0x01 resets the dictionary
        if (control == 0x01) dict.reset()
        val size = r.u16be() + 1
        require(r.remaining >= size, s"media $id: xz uncompressed chunk truncated")
        var k = 0
        while (k < size) { dict.put(r.u8().toByte); k += 1 }
        // an uncompressed chunk invalidates LZMA state: the next LZMA
        // chunk must carry a state reset
        lzma = null
      } else {
        require(control >= 0x80, s"media $id: xz LZMA2 control byte 0x${Integer.toHexString(control)} invalid")
        val unpacked = ((control & 0x1f) << 16) + r.u16be() + 1
        val packed = r.u16be() + 1
        val resetMode = (control >> 5) & 0x3
        if (resetMode == 3) dict.reset()
        if (resetMode >= 2) {
          props = r.u8()
          require(props < 9 * 5 * 5, s"media $id: xz LZMA props byte $props invalid")
        }
        require(props >= 0, s"media $id: xz LZMA chunk before any props byte")
        require(resetMode >= 1 || lzma != null,
          s"media $id: xz LZMA chunk continues state that was never initialized")
        if (resetMode >= 1) lzma = new LzmaState(props)
        require(r.remaining >= packed, s"media $id: xz LZMA chunk truncated")
        val rc = new RangeDec(r.b, r.pos, packed, id)
        lzma.decode(rc, dict, unpacked)
        r.skip(packed)
      }
    }
    dict.result()
  }

  /** Block output buffer doubling as the LZMA dictionary; `startPos`
    * marks the last dictionary reset (matches cannot reach behind it).
    */
  private final class Dict(maxBytes: Long, id: Long) {
    private var buf = new Array[Byte](1 << 16)
    private var n = 0
    private var startPos = 0
    def reset(): Unit = { startPos = n }
    def pos: Int = n - startPos // position since dict reset (LZMA2 contract)
    def put(b: Byte): Unit = {
      require(n < maxBytes, s"media $id: xz output exceeds $maxBytes-byte guard")
      if (n == buf.length) {
        require(n.toLong * 2 <= Int.MaxValue - 8,
          s"media $id: xz output too large for one buffer")
        buf = java.util.Arrays.copyOf(buf, n * 2)
      }
      buf(n) = b
      n += 1
    }
    def copyMatch(dist: Int, len0: Int): Unit = {
      require(dist >= 1 && dist <= pos,
        s"media $id: xz match distance $dist out of window ($pos)")
      var len = len0
      var src = n - dist
      while (len > 0) {
        put(buf(src))
        src += 1
        len -= 1
      }
    }
    def byteAt(dist: Int): Byte = {
      require(dist >= 1 && dist <= pos, s"media $id: xz match byte out of window")
      buf(n - dist)
    }
    def lastByte: Int = if (n == 0 || pos == 0) 0 else buf(n - 1) & 0xff
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  // ------------------------------------------------------------------
  // LZMA range decoder
  // ------------------------------------------------------------------
  private final class RangeDec(b: Array[Byte], off: Int, len: Int, id: Long) {
    private var pos = off
    private val end = off + len
    var range: Long = 0xffffffffL
    var code: Long = 0L
    require((b(pos) & 0xff) == 0, s"media $id: xz LZMA range coder first byte nonzero")
    pos += 1
    var k = 0
    while (k < 4) { code = (code << 8) | (b(pos) & 0xff); pos += 1; k += 1 }

    private def nextByte(): Int = {
      require(pos < end, s"media $id: xz LZMA range coder ran past chunk")
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def normalize(): Unit =
      if (range < 0x1000000L) {
        range <<= 8
        code = ((code << 8) | nextByte()) & 0xffffffffL
      }
    def decodeBit(probs: Array[Short], i: Int): Int = {
      val p = probs(i) & 0xffff
      val bound = (range >>> 11) * p
      if (code < bound) {
        range = bound
        probs(i) = (p + ((2048 - p) >> 5)).toShort
        normalize()
        0
      } else {
        range -= bound
        code -= bound
        probs(i) = (p - (p >> 5)).toShort
        normalize()
        1
      }
    }
    def decodeDirect(nBits: Int): Int = {
      var v = 0
      var k = nBits
      while (k > 0) {
        range >>>= 1
        code -= range
        // if the (unsigned 32-bit) subtraction borrowed, the bit is 0
        val neg = code < 0
        if (neg) code += range
        v = (v << 1) | (if (neg) 0 else 1)
        normalize()
        k -= 1
      }
      v
    }
    def bitTree(probs: Array[Short], base: Int, nBits: Int): Int = {
      var m = 1
      var k = 0
      while (k < nBits) { m = (m << 1) | decodeBit(probs, base + m); k += 1 }
      m - (1 << nBits)
    }
    def bitTreeReverse(probs: Array[Short], base: Int, nBits: Int): Int = {
      var m = 1
      var sym = 0
      var k = 0
      while (k < nBits) {
        val bit = decodeBit(probs, base + m)
        m = (m << 1) | bit
        sym |= bit << k
        k += 1
      }
      sym
    }
    def finishedCleanly: Boolean = code == 0
    def exhausted: Boolean = pos == end
  }

  // ------------------------------------------------------------------
  // LZMA decoder state (persists across LZMA2 chunks with reset bits)
  // ------------------------------------------------------------------
  private final class LzmaState(props0: Int) {
    private var lc = 0
    private var lp = 0
    private var pb = 0
    setProps(props0)

    def setProps(p: Int): Unit = {
      var x = p
      lc = x % 9; x /= 9
      lp = x % 5; pb = x / 5
      require(lc + lp <= 8, s"LZMA lc+lp > 8 unsupported ($lc+$lp)")
    }

    // probability arrays (fresh per state reset — this class is
    // re-instantiated on reset, so initialization here is the reset)
    private def fresh(n: Int) = Array.fill[Short](n)(1024)
    private val isMatch = fresh(12 << 4)
    private val isRep = fresh(12)
    private val isRepG0 = fresh(12)
    private val isRepG1 = fresh(12)
    private val isRepG2 = fresh(12)
    private val isRep0Long = fresh(12 << 4)
    private val posSlot = fresh(4 * 64)
    private val specPos = fresh(115)
    private val align = fresh(16)
    // length coders: [choice, choice2, low 16*8, mid 16*8, high 256]
    private val lenProbs = fresh(2 + 16 * 8 + 16 * 8 + 256)
    private val repLenProbs = fresh(2 + 16 * 8 + 16 * 8 + 256)
    private val literals = fresh(0x300 << (lc + lp))

    private var state = 0
    private var rep0 = 0
    private var rep1 = 0
    private var rep2 = 0
    private var rep3 = 0

    private def decodeLen(rc: RangeDec, probs: Array[Short], posState: Int): Int =
      if (rc.decodeBit(probs, 0) == 0)
        2 + rc.bitTree(probs, 2 + (posState << 3), 3)
      else if (rc.decodeBit(probs, 1) == 0)
        10 + rc.bitTree(probs, 2 + 128 + (posState << 3), 3)
      else
        18 + rc.bitTree(probs, 2 + 256, 8)

    def decode(rc: RangeDec, dict: Dict, unpacked: Int,
        allowEndMarker: Boolean = false): Unit = {
      val posMask = (1 << pb) - 1
      val litPosMask = (1 << lp) - 1
      var remaining = unpacked
      var ended = false
      while (remaining > 0 && !ended) {
        val posState = dict.pos & posMask
        if (rc.decodeBit(isMatch, (state << 4) + posState) == 0) {
          // literal
          val prev = dict.lastByte
          val litState = ((dict.pos & litPosMask) << lc) + (prev >>> (8 - lc))
          val base = 0x300 * litState
          var sym = 1
          if (state >= 7) {
            var matchByte = dict.byteAt(rep0 + 1) & 0xff
            var break = false
            while (!break && sym < 0x100) {
              val matchBit = (matchByte >> 7) & 1
              matchByte <<= 1
              val bit = rc.decodeBit(literals, base + ((1 + matchBit) << 8) + sym)
              sym = (sym << 1) | bit
              if (matchBit != bit) break = true
            }
          }
          while (sym < 0x100) sym = (sym << 1) | rc.decodeBit(literals, base + sym)
          dict.put((sym - 0x100).toByte)
          remaining -= 1
          state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
        } else if (rc.decodeBit(isRep, state) == 0) {
          // new match
          rep3 = rep2; rep2 = rep1; rep1 = rep0
          val len = decodeLen(rc, lenProbs, posState)
          val lenToPosState = math.min(len - 2, 3)
          val slot = rc.bitTree(posSlot, lenToPosState << 6, 6)
          if (slot < 4) rep0 = slot
          else {
            val numDirect = (slot >> 1) - 1
            var dist = (2 | (slot & 1)) << numDirect
            if (slot < 14)
              dist += rc.bitTreeReverse(specPos, dist - slot, numDirect)
            else {
              dist += rc.decodeDirect(numDirect - 4) << 4
              dist += rc.bitTreeReverse(align, 0, 4)
            }
            rep0 = dist
          }
          if (rep0 == -1) { // 0xFFFFFFFF end-of-stream marker
            if (!allowEndMarker) throw new IllegalArgumentException(
              "xz LZMA end marker inside LZMA2 chunk")
            rep0 = rep1 // restore (marker never becomes a distance)
            ended = true
          }
          if (!ended) {
            state = if (state < 7) 7 else 10
            require(len <= remaining, s"xz LZMA match overruns chunk ($len > $remaining)")
            dict.copyMatch(rep0 + 1, len)
            remaining -= len
          }
        } else {
          // rep match
          if (rc.decodeBit(isRepG0, state) == 0) {
            if (rc.decodeBit(isRep0Long, (state << 4) + posState) == 0) {
              // short rep: one byte at rep0
              state = if (state < 7) 9 else 11
              dict.copyMatch(rep0 + 1, 1)
              remaining -= 1
            } else {
              val len = decodeLen(rc, repLenProbs, posState)
              state = if (state < 7) 8 else 11
              require(len <= remaining, "xz LZMA rep overruns chunk")
              dict.copyMatch(rep0 + 1, len)
              remaining -= len
            }
          } else {
            // rep1/rep2/rep3: chosen distance rotates to the front
            val dist =
              if (rc.decodeBit(isRepG1, state) == 0) rep1
              else if (rc.decodeBit(isRepG2, state) == 0) { val d = rep2; rep2 = rep1; d }
              else { val d = rep3; rep3 = rep2; rep2 = rep1; d }
            rep1 = rep0
            rep0 = dist
            val len = decodeLen(rc, repLenProbs, posState)
            state = if (state < 7) 8 else 11
            require(len <= remaining, "xz LZMA rep overruns chunk")
            dict.copyMatch(rep0 + 1, len)
            remaining -= len
          }
        }
      }
    }
  }
}
