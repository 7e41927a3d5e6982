package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM Brotli decoder (RFC 7932) — the `Content-Encoding: br`
  * payloads a modern web crawl carries (plus .br corpus sidecars).
  * Built from the public RFC: window/meta-block framing, simple and
  * complex prefix codes with the fixed code-length-code, block
  * categories with type/length switch trees, context modes and
  * context maps (RLE + inverse-MTF), the insert©/distance command
  * machinery with the 4-slot distance ring, and the STATIC DICTIONARY
  * with all 121 word transforms — the dictionary bytes, transform
  * table and literal-context lookup tables are RFC 7932's own
  * normative appendix data, extracted from the system brotli library
  * by tools/brotli_probe.py (the same spec-data recipe as the VP8
  * tables) and verified by fuzz interop against BrotliEncoderCompress
  * across qualities and window sizes in BrotliSpec.
  *
  * Reference semantics: the reference handles gzip only
  * (`gobblin-core/.../filebased/GZIPFileDownloader.java`); brotli is
  * part of this engine's crawl-ingest tier. Decoder only by design —
  * encoding stays with the system library.
  */
object BrotliCodec {

  // ------------------------------------------------------------------
  // RFC 7932 normative data (resources; see tools/brotli_probe.py)
  // ------------------------------------------------------------------
  private lazy val (dictSizeBits, dictOffsets, dictData): (Array[Int], Array[Int], Array[Byte]) = {
    val in = getClass.getResourceAsStream("/graft/brotli/dictionary.bin")
    require(in != null, "missing brotli dictionary resource")
    val all = try in.readAllBytes() finally in.close()
    val bits = Array.tabulate(32)(i => all(i).toInt & 0xff)
    val offs = Array.tabulate(32) { i =>
      val o = 32 + i * 4
      (all(o) & 0xff) | ((all(o + 1) & 0xff) << 8) |
        ((all(o + 2) & 0xff) << 16) | ((all(o + 3) & 0xff) << 24)
    }
    (bits, offs, java.util.Arrays.copyOfRange(all, 160, all.length))
  }

  /** (prefix, transformType, suffix) per RFC Appendix B. */
  private lazy val transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    val in = getClass.getResourceAsStream("/graft/brotli/transforms.txt")
    require(in != null, "missing brotli transforms resource")
    val txt = try new String(in.readAllBytes(), "ISO-8859-1") finally in.close()
    def unhex(s: String): Array[Byte] =
      if (s.isEmpty) Array.emptyByteArray
      else s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    txt.linesIterator.filter(_.nonEmpty).map { l =>
      val p = l.split(" ", -1)
      (unhex(p(0)), p(1).toInt, unhex(p(2)))
    }.toArray
  }

  /** 2048-byte context lookup: mode*512 + (p1 | 256+p2). */
  private lazy val contextLut: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/brotli/context_luts.bin")
    require(in != null, "missing brotli context LUT resource")
    try in.readAllBytes() finally in.close()
  }

  // block-length codes (alphabet 26)
  private val BlockLenBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81,
    97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
    8433, 16625)
  private val BlockLenExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  // insert / copy length codes
  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  private val ClCodeOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  def isCandidate(b: Array[Byte]): Boolean = b.nonEmpty // no magic by design

  // ------------------------------------------------------------------
  // LSB-first bit reader
  // ------------------------------------------------------------------
  private final class BitRd(b: Array[Byte], id: Long) {
    private var bytePos = 0
    private var acc = 0L
    private var nAcc = 0
    private def fill(need: Int): Unit =
      while (nAcc < need) {
        require(bytePos < b.length, s"media $id: brotli stream truncated")
        acc |= (b(bytePos) & 0xffL) << nAcc
        bytePos += 1
        nAcc += 8
      }
    def bits(n: Int): Int = {
      if (n == 0) return 0
      fill(n)
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n
      nAcc -= n
      v
    }
    def bit(): Int = bits(1)
    def alignByte(): Unit = {
      val drop = nAcc & 7
      acc >>>= drop
      nAcc -= drop
    }
    def rawByte(): Int = {
      require(nAcc % 8 == 0, "brotli raw read while unaligned")
      if (nAcc >= 8) {
        val v = (acc & 0xff).toInt
        acc >>>= 8
        nAcc -= 8
        v
      } else {
        require(bytePos < b.length, s"media $id: brotli stream truncated")
        val v = b(bytePos) & 0xff
        bytePos += 1
        v
      }
    }
  }

  // ------------------------------------------------------------------
  // canonical prefix-code decode (first-read bit is the code's MSB)
  // ------------------------------------------------------------------
  private final class Huff(lengths: Array[Int], id: Long) {
    // limit/base per length, perm in (length, symbol) order
    private val maxLen = {
      var m = 0
      lengths.foreach(l => if (l > m) m = l)
      m
    }
    require(maxLen > 0, s"media $id: brotli empty prefix code")
    private val minLen = {
      var m = 32
      lengths.foreach(l => if (l > 0 && l < m) m = l)
      m
    }
    private val cnt = new Array[Int](maxLen + 2)
    lengths.foreach(l => if (l > 0) cnt(l) += 1)
    private val perm = new Array[Int](lengths.count(_ > 0))
    private val limit = new Array[Int](maxLen + 2)
    private val base = new Array[Int](maxLen + 2)
    locally {
      var pp = 0
      var l = minLen
      while (l <= maxLen) {
        var s = 0
        while (s < lengths.length) {
          if (lengths(s) == l) { perm(pp) = s; pp += 1 }
          s += 1
        }
        l += 1
      }
      // canonical: firstCode(l) = (firstCode(l-1) + cnt(l-1)) << 1;
      // symbol = perm(v - base(l)) with base(l) = firstCode(l) - idx(l)
      var firstCode = 0
      var idx = 0
      l = minLen
      while (l <= maxLen) {
        limit(l) = firstCode + cnt(l) - 1
        base(l) = firstCode - idx
        idx += cnt(l)
        firstCode = (firstCode + cnt(l)) << 1
        l += 1
      }
    }
    def decode(r: BitRd): Int = {
      var l = minLen
      var v = 0
      var k = 0
      while (k < minLen) { v = (v << 1) | r.bit(); k += 1 }
      while (l <= maxLen && (cnt(l) == 0 || v > limit(l))) {
        v = (v << 1) | r.bit()
        l += 1
      }
      require(l <= maxLen, s"media $id: brotli prefix decode desync")
      val s = perm(v - base(l))
      s
    }
  }

  private sealed trait Tree {
    def next(r: BitRd): Int
  }
  private final case class Fixed(sym: Int) extends Tree {
    def next(r: BitRd): Int = sym
  }
  private final case class Coded(h: Huff) extends Tree {
    def next(r: BitRd): Int = h.decode(r)
  }

  // ------------------------------------------------------------------
  // prefix-code reading (RFC 3.4 / 3.5)
  // ------------------------------------------------------------------
  private def alphabetBits(alpha: Int): Int = {
    var b = 0
    while ((1 << b) < alpha) b += 1
    b
  }

  private def readPrefixCode(r: BitRd, alpha: Int, id: Long): Tree = {
    val hskip = r.bits(2)
    if (hskip == 1) {
      // simple code
      val nsym = r.bits(2) + 1
      val abits = alphabetBits(alpha)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = r.bits(abits)
        require(s < alpha, s"media $id: brotli simple-code symbol $s >= $alpha")
        syms(i) = s
        i += 1
      }
      // distinctness
      i = 0
      while (i < nsym) {
        var j = i + 1
        while (j < nsym) {
          require(syms(i) != syms(j), s"media $id: brotli simple-code repeated symbol")
          j += 1
        }
        i += 1
      }
      if (nsym == 1) return Fixed(syms(0))
      val lengths = new Array[Int](alpha)
      nsym match {
        case 2 =>
          java.util.Arrays.sort(syms)
          lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          if (syms(1) > syms(2)) { val t = syms(1); syms(1) = syms(2); syms(2) = t }
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case _ =>
          val treeSelect = r.bit()
          if (treeSelect == 0) {
            java.util.Arrays.sort(syms)
            syms.foreach(s => lengths(s) = 2)
          } else {
            if (syms(2) > syms(3)) { val t = syms(2); syms(2) = syms(3); syms(3) = t }
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      Coded(new Huff(lengths, id))
    } else {
      // complex code: code-length code lengths via the fixed code
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        // fixed code: 00->0, 01->3, 10->4, 110->2, 1110->1, 1111->5
        val v =
          if (r.bit() == 0) { if (r.bit() == 0) 0 else 3 }
          else if (r.bit() == 0) 4
          else if (r.bit() == 0) 2
          else if (r.bit() == 0) 1
          else 5
        clLens(ClCodeOrder(i)) = v
        if (v != 0) {
          space -= 32 >> v
          numCodes += 1
        }
        i += 1
      }
      require(numCodes == 1 || space == 0,
        s"media $id: brotli code-length code over/under-subscribed (space=$space)")
      // numCodes == 1: the single CL symbol repeats with NO bits read
      // per occurrence (a 16 here legitimately repeat-fills the
      // initial length 8 until the code space is exhausted)
      val clTree: Tree =
        if (numCodes == 1) Fixed(clLens.indexWhere(_ != 0))
        else Coded(new Huff(clLens, id))

      val lengths = new Array[Int](alpha)
      var symbol = 0
      var prevLen = 8
      var space2 = 32768
      // repeat-run state: consecutive repeat codes of the SAME kind
      // accumulate (RFC 3.5: new_total = (old_total - 2) << eb + 3 + x)
      var inRun = false
      var runLen = -1   // the length value being repeated (0 for code 17)
      var runStart = 0
      var runTotal = 0
      while (symbol < alpha && space2 > 0) {
        val cl = clTree.next(r)
        require(cl <= 17, s"media $id: brotli code length $cl invalid")
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) {
            prevLen = cl
            space2 -= 32768 >> cl
          }
          inRun = false
        } else {
          val extraBits = if (cl == 16) 2 else 3
          val newLen = if (cl == 16) prevLen else 0
          if (inRun && runLen == newLen)
            runTotal = ((runTotal - 2) << extraBits) + r.bits(extraBits) + 3
          else {
            runStart = symbol
            runTotal = r.bits(extraBits) + 3
            inRun = true
            runLen = newLen
          }
          val target = runStart + runTotal
          require(target <= alpha, s"media $id: brotli repeat overruns alphabet")
          while (symbol < target) {
            lengths(symbol) = newLen
            if (newLen != 0) space2 -= 32768 >> newLen
            symbol += 1
          }
        }
      }
      require(space2 == 0, s"media $id: brotli prefix code over/under-subscribed")
      Coded(new Huff(lengths, id))
    }
  }

  // ------------------------------------------------------------------
  // public decode
  // ------------------------------------------------------------------
  def decompress(id: Long, bytes: Array[Byte],
      maxBytes: Long = 512L * 1024 * 1024): Array[Byte] = {
    require(bytes != null && bytes.nonEmpty, s"media $id: empty brotli payload")
    val r = new BitRd(bytes, id)
    val out = new Grow(maxBytes, id)

    // window bits
    val wbits =
      if (r.bit() == 0) 16
      else {
        val n = r.bits(3)
        if (n != 0) 17 + n
        else {
          val m = r.bits(3)
          if (m == 0) 17
          else {
            require(m != 1, s"media $id: brotli reserved window-bits value")
            8 + m
          }
        }
      }
    val winSize = (1 << wbits) - 16

    var isLast = false
    while (!isLast) {
      isLast = r.bit() == 1
      if (isLast && r.bit() == 1) {
        // ISLASTEMPTY
        return out.result()
      }
      val mnibbles = r.bits(2)
      if (mnibbles == 3) {
        // metadata block: skip
        require(r.bit() == 0, s"media $id: brotli metadata reserved bit set")
        val skipBytes = r.bits(2)
        var skip = 0
        var k = 0
        var msb = 0
        while (k < skipBytes) { msb = r.bits(8); skip |= msb << (8 * k); k += 1 }
        require(skipBytes == 0 || msb != 0,
          s"media $id: brotli metadata length has zero high byte")
        r.alignByte()
        val total = if (skipBytes == 0) 0 else skip + 1
        k = 0
        while (k < total) { r.rawByte(); k += 1 }
      } else {
        val nibbles = 4 + mnibbles
        var mlen = 0
        var k = 0
        var lastNib = 0
        while (k < nibbles) { lastNib = r.bits(4); mlen |= lastNib << (4 * k); k += 1 }
        require(nibbles == 4 || lastNib != 0,
          s"media $id: brotli MLEN has zero high nibble")
        mlen += 1
        require(out.size.toLong + mlen <= maxBytes,
          s"media $id: brotli output exceeds $maxBytes-byte guard")
        val isUncompressed = !isLast && r.bit() == 1
        if (isUncompressed) {
          r.alignByte()
          var i = 0
          while (i < mlen) { out.put(r.rawByte().toByte); i += 1 }
        } else {
          decodeCompressedMetaBlock(id, r, out, mlen, winSize)
        }
      }
    }
    out.result()
  }

  private final class Grow(maxBytes: Long, id: Long) {
    private var buf = new Array[Byte](1 << 16)
    var size = 0
    def put(b: Byte): Unit = {
      require(size < maxBytes, s"media $id: brotli output exceeds $maxBytes-byte guard")
      if (size == buf.length)
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(size) = b
      size += 1
    }
    def at(i: Int): Byte = buf(i)
    def copyBack(dist: Int, len: Int): Unit = {
      var src = size - dist
      var k = 0
      while (k < len) { put(buf(src + k)); k += 1 }
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, size)
  }

  private final class BlockCat(r: BitRd, id: Long, val nTypes: Int) {
    var cur = 0
    var prev = 1
    var remaining = 1 << 28 // effectively infinite when single-type
    private var typeTree: Tree = null
    private var lenTree: Tree = null
    if (nTypes >= 2) {
      typeTree = readPrefixCode(r, nTypes + 2, id)
      lenTree = readPrefixCode(r, 26, id)
      remaining = readBlockLen(r)
    }
    def readBlockLen(r: BitRd): Int = {
      val c = lenTree.next(r)
      BlockLenBase(c) + r.bits(BlockLenExtra(c))
    }
    def switchType(r: BitRd): Unit = {
      val code = typeTree.next(r)
      val nt = code match {
        case 0 => prev
        case 1 => (cur + 1) % nTypes
        case c => c - 2
      }
      prev = cur
      cur = nt
      remaining = readBlockLen(r)
    }
    def tick(r: BitRd): Unit = {
      if (remaining == 0) {
        require(nTypes >= 2, s"media $id: brotli block length exhausted with one type")
        switchType(r)
      }
      remaining -= 1
    }
  }

  private def readVarLenNTypes(r: BitRd): Int =
    if (r.bit() == 0) 1
    else {
      val n = r.bits(3)
      if (n == 0) 2
      else r.bits(n) + (1 << n) + 1
    }

  private def readContextMap(r: BitRd, size: Int, nTrees: Int, id: Long): Array[Byte] = {
    val map = new Array[Byte](size)
    if (nTrees == 1) return map
    val rleMax = if (r.bit() == 0) 0 else r.bits(4) + 1
    val tree = readPrefixCode(r, nTrees + rleMax, id)
    var i = 0
    while (i < size) {
      val code = tree.next(r)
      if (code == 0) { map(i) = 0; i += 1 }
      else if (code <= rleMax) {
        val reps = (1 << code) + r.bits(code)
        require(i + reps <= size, s"media $id: brotli context-map RLE overruns")
        java.util.Arrays.fill(map, i, i + reps, 0.toByte)
        i += reps
      } else {
        map(i) = (code - rleMax).toByte
        i += 1
      }
    }
    if (r.bit() == 1) {
      // inverse move-to-front
      val mtf = Array.tabulate[Byte](256)(_.toByte)
      var k = 0
      while (k < size) {
        val idx = map(k) & 0xff
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        map(k) = v
        k += 1
      }
    }
    map
  }

  private def decodeCompressedMetaBlock(id: Long, r: BitRd, out: Grow,
      mlen: Int, winSize: Int): Unit = {
    val lits = new BlockCat(r, id, readVarLenNTypes(r))
    val cmds = new BlockCat(r, id, readVarLenNTypes(r))
    val dsts = new BlockCat(r, id, readVarLenNTypes(r))

    val npostfix = r.bits(2)
    val ndirect = r.bits(4) << npostfix
    val contextModes = new Array[Int](lits.nTypes)
    var i = 0
    while (i < lits.nTypes) { contextModes(i) = r.bits(2); i += 1 }

    val nTreesL = readVarLenNTypes(r)
    val cmapL = readContextMap(r, lits.nTypes * 64, nTreesL, id)
    val nTreesD = readVarLenNTypes(r)
    val cmapD = readContextMap(r, dsts.nTypes * 4, nTreesD, id)

    val litTrees = Array.fill(nTreesL)(readPrefixCode(r, 256, id))
    val cmdTrees = Array.fill(cmds.nTypes)(readPrefixCode(r, 704, id))
    val distAlpha = 16 + ndirect + (48 << npostfix)
    val dstTrees = Array.fill(nTreesD)(readPrefixCode(r, distAlpha, id))

    // distance ring
    val ring = Array(16, 15, 11, 4)
    var ringIdx = 0
    def lastDist(k: Int): Int = ring((ringIdx - 1 - k) & 3) // k=0: most recent
    def pushDist(d: Int): Unit = { ring(ringIdx & 3) = d; ringIdx += 1 }

    var remaining = mlen
    while (remaining > 0) {
      cmds.tick(r)
      val cmd = cmdTrees(cmds.cur).next(r)
      var rangeIdx = cmd >> 6
      val implicitDist = rangeIdx < 2
      if (rangeIdx >= 2) rangeIdx -= 2
      val insCode = InsRangeLut(rangeIdx) + ((cmd >> 3) & 7)
      val copyCode = CopyRangeLut(rangeIdx) + (cmd & 7)
      val insLen = InsBase(insCode) + r.bits(InsExtra(insCode))
      var copyLen = CopyBase(copyCode) + r.bits(CopyExtra(copyCode))

      // literals
      require(insLen <= remaining, s"media $id: brotli insert overruns meta-block")
      var k = 0
      while (k < insLen) {
        lits.tick(r)
        val p1 = if (out.size > 0) out.at(out.size - 1) & 0xff else 0
        val p2 = if (out.size > 1) out.at(out.size - 2) & 0xff else 0
        val mode = contextModes(lits.cur)
        val ctx = (contextLut((mode << 9) + p1) & 0xff) |
          (contextLut((mode << 9) + 256 + p2) & 0xff)
        val tree = litTrees(cmapL(lits.cur * 64 + ctx) & 0xff)
        out.put(tree.next(r).toByte)
        k += 1
      }
      remaining -= insLen
      if (remaining == 0) return

      // distance
      val maxDist = math.min(out.size, winSize)
      var dist = 0
      var dcode0 = false
      if (implicitDist) {
        dist = lastDist(0)
        dcode0 = true
      } else {
        dsts.tick(r)
        val ctx = math.min(copyLen, 5) - 2
        val tree = dstTrees(cmapD(dsts.cur * 4 + ctx) & 0xff)
        val dcode = tree.next(r)
        dcode0 = dcode == 0
        if (dcode < 16) {
          dist = dcode match {
            case 0 => lastDist(0)
            case 1 => lastDist(1)
            case 2 => lastDist(2)
            case 3 => lastDist(3)
            case c =>
              val base = lastDist(if (c < 10) 0 else 1)
              val delta = ((c - (if (c < 10) 4 else 10)) >> 1) + 1
              val sign = if ((c & 1) == 0) -1 else 1
              base + sign * delta
          }
          require(dist > 0, s"media $id: brotli short-code distance non-positive")
        } else {
          val d = dcode - 16
          if (d < ndirect) dist = d + 1
          else {
            val pm = (1 << npostfix) - 1
            val hcode = (d - ndirect) >> npostfix
            val lcode = (d - ndirect) & pm
            val ndistbits = 1 + (hcode >> 1)
            val offset = ((2 + (hcode & 1)) << ndistbits) - 4
            val extra = r.bits(ndistbits)
            dist = ((offset + extra) << npostfix) + lcode + ndirect + 1
          }
        }
      }

      if (dist <= maxDist) {
        require(copyLen <= remaining, s"media $id: brotli copy overruns meta-block")
        out.copyBack(dist, copyLen)
        remaining -= copyLen
        if (!dcode0) pushDist(dist)
      } else {
        // static dictionary reference
        require(copyLen >= 4 && copyLen <= 24 && dictSizeBits(copyLen) != 0,
          s"media $id: brotli dictionary reference with invalid length $copyLen")
        val address = dist - maxDist - 1
        val bits = dictSizeBits(copyLen)
        val wordId = address & ((1 << bits) - 1)
        val tid = address >> bits
        require(tid < transforms.length,
          s"media $id: brotli dictionary transform $tid out of range")
        val off = dictOffsets(copyLen) + wordId * copyLen
        val word = java.util.Arrays.copyOfRange(dictData, off, off + copyLen)
        val (prefix, typ, suffix) = transforms(tid)
        val body = applyTransform(word, typ, id)
        require(prefix.length + body.length + suffix.length <= remaining,
          s"media $id: brotli dictionary word overruns meta-block")
        prefix.foreach(out.put)
        body.foreach(out.put)
        suffix.foreach(out.put)
        remaining -= prefix.length + body.length + suffix.length
        // dictionary references never enter the distance ring
      }
    }
  }

  /** RFC Appendix B transform types: 0 identity, 1-9 omit last N,
    * 10 uppercase-first, 11 uppercase-all, 12-20 omit first N.
    * "Uppercase" is the spec's UTF-8-aware ferment.
    */
  private def applyTransform(word: Array[Byte], typ: Int, id: Long): Array[Byte] =
    typ match {
      case 0 => word
      case t if t >= 1 && t <= 9 =>
        java.util.Arrays.copyOfRange(word, 0, math.max(0, word.length - t))
      case t if t >= 12 && t <= 20 =>
        java.util.Arrays.copyOfRange(word, math.min(word.length, t - 11), word.length)
      case 10 | 11 =>
        val w = word.clone()
        var i = 0
        var once = typ == 10
        var done = false
        while (i < w.length && !done) {
          val c = w(i) & 0xff
          if (c < 0xc0) {
            if (c >= 'a' && c <= 'z') w(i) = (c ^ 32).toByte
            i += 1
          } else if (c < 0xe0) {
            if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
            i += 2
          } else {
            if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
            i += 3
          }
          if (once) done = true
        }
        w
      case other => throw new IllegalArgumentException(
        s"media $id: brotli transform type $other unknown")
    }
}
