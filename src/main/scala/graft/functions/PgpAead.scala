package graft.functions

import javax.crypto.{Cipher, Mac}
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}

/** AEAD primitives for OpenPGP v2 SEIPD / v6 SKESK (RFC 9580 §5.13.2,
  * §5.3.2) in pure JCE: GCM rides the JDK cipher; OCB (RFC 7253) and
  * EAX are built from scratch on the AES-ECB block primitive (the JDK
  * ships neither mode). All three use 16-octet tags, as OpenPGP fixes.
  *
  * Interop anchors: GCM IS the JDK's implementation; OCB is pinned in
  * PgpSpec against ciphertexts produced by a foreign implementation
  * (pyca/cryptography's AESOCB3, OpenSSL-backed) with the 15-octet
  * nonces OpenPGP uses; EAX has no foreign implementation in this
  * container (self-inverse + tamper tests only — documented seam).
  *
  * Everything is per-record executor work (codec stance, like
  * [[Pgp]]); no driver state, no randomness on the decrypt path.
  */
private[graft] object OpenPgpAead {

  val TagLen = 16

  /** OpenPGP AEAD algorithm ids (RFC 9580 §9.6). */
  def ivLen(algo: Int): Int = algo match {
    case 1 => 16 // EAX
    case 2 => 15 // OCB
    case 3 => 12 // GCM
    case other =>
      throw new IllegalArgumentException(s"unsupported AEAD algorithm $other")
  }

  /** Encrypt: ciphertext ++ 16-octet tag. */
  def seal(algo: Int, key: Array[Byte], nonce: Array[Byte], aad: Array[Byte],
      plain: Array[Byte]): Array[Byte] = algo match {
    case 1 => new Eax(key).seal(nonce, aad, plain)
    case 2 => new Ocb(key).seal(nonce, aad, plain)
    case 3 =>
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
        new GCMParameterSpec(TagLen * 8, nonce))
      c.updateAAD(aad)
      c.doFinal(plain)
    case other =>
      throw new IllegalArgumentException(s"unsupported AEAD algorithm $other")
  }

  /** Decrypt+verify `ct ++ tag`; throws IllegalArgumentException on a
    * tag mismatch (never returns unauthenticated plaintext).
    */
  def open(algo: Int, key: Array[Byte], nonce: Array[Byte], aad: Array[Byte],
      sealedBytes: Array[Byte]): Array[Byte] = {
    require(sealedBytes.length >= TagLen, "AEAD ciphertext shorter than its tag")
    algo match {
      case 1 => new Eax(key).open(nonce, aad, sealedBytes)
      case 2 => new Ocb(key).open(nonce, aad, sealedBytes)
      case 3 =>
        val c = Cipher.getInstance("AES/GCM/NoPadding")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
          new GCMParameterSpec(TagLen * 8, nonce))
        c.updateAAD(aad)
        try c.doFinal(sealedBytes)
        catch { case _: javax.crypto.AEADBadTagException =>
          throw new IllegalArgumentException("GCM tag mismatch") }
      case other =>
        throw new IllegalArgumentException(s"unsupported AEAD algorithm $other")
    }
  }

  /** HKDF-SHA256 (RFC 5869) — the v2 SEIPD / v6 SKESK key derivation. */
  def hkdf(ikm: Array[Byte], salt: Array[Byte], info: Array[Byte],
      len: Int): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(
      if (salt.isEmpty) new Array[Byte](32) else salt, "HmacSHA256"))
    val prk = mac.doFinal(ikm)
    val out = new java.io.ByteArrayOutputStream()
    var t = Array.emptyByteArray
    var i = 1
    while (out.size < len) {
      mac.init(new SecretKeySpec(prk, "HmacSHA256"))
      mac.update(t)
      mac.update(info)
      mac.update(i.toByte)
      t = mac.doFinal()
      out.write(t, 0, t.length)
      i += 1
    }
    out.toByteArray.take(len)
  }

  // ------------------------------------------------------- block helpers

  private def aesEnc(key: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    c
  }

  private def aesDec(key: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"))
    c
  }

  /** GF(2^128) doubling (the OCB/CMAC subkey step). */
  private def dbl(b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    val carry = (b(0) & 0x80) != 0
    var i = 0
    while (i < 16) {
      out(i) = ((b(i) << 1) & 0xfe).toByte
      if (i < 15 && (b(i + 1) & 0x80) != 0) out(i) = (out(i) | 1).toByte
      i += 1
    }
    if (carry) out(15) = (out(15) ^ 0x87).toByte
    out
  }

  private def xor16(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  private def xorInto(dst: Array[Byte], src: Array[Byte]): Unit = {
    var i = 0
    while (i < dst.length && i < src.length) { dst(i) = (dst(i) ^ src(i)).toByte; i += 1 }
  }

  private def constEq(a: Array[Byte], b: Array[Byte]): Boolean = {
    if (a.length != b.length) return false
    var acc = 0
    var i = 0
    while (i < a.length) { acc |= a(i) ^ b(i); i += 1 }
    acc == 0
  }

  // ------------------------------------------------------------- OCB

  /** OCB mode per RFC 7253 with a 128-bit tag — the OpenPGP-mandatory
    * AEAD. Offsets via GF doubling of L = E_K(0); nonce-derived
    * Offset_0 through the Ktop/Stretch bit-rotation; associated data
    * folded with the parallel HASH offsets.
    */
  private final class Ocb(key: Array[Byte]) {
    private val enc = aesEnc(key)
    private val dec = aesDec(key)
    private val lStar = enc.doFinal(new Array[Byte](16))
    private val lDollar = dbl(lStar)
    private val ls = scala.collection.mutable.ArrayBuffer(dbl(lDollar))
    private def l(i: Int): Array[Byte] = {
      while (ls.length <= i) ls += dbl(ls.last)
      ls(i)
    }

    private def offset0(nonce: Array[Byte]): Array[Byte] = {
      require(nonce.length >= 1 && nonce.length <= 15,
        s"OCB nonce must be 1..15 octets, got ${nonce.length}")
      // TAGLEN = 128 bits => the leading 7-bit tag-length field is 0
      val n = new Array[Byte](16)
      n(15 - nonce.length) = 1
      System.arraycopy(nonce, 0, n, 16 - nonce.length, nonce.length)
      val bottom = n(15) & 0x3f
      val kin = n.clone(); kin(15) = (kin(15) & 0xc0).toByte
      val ktop = enc.doFinal(kin)
      val stretch = new Array[Byte](24)
      System.arraycopy(ktop, 0, stretch, 0, 16)
      var i = 0
      while (i < 8) { stretch(16 + i) = (ktop(i) ^ ktop(i + 1)).toByte; i += 1 }
      val byteOff = bottom >> 3
      val bitOff = bottom & 7
      val off = new Array[Byte](16)
      i = 0
      while (i < 16) {
        val hi = (stretch(byteOff + i) & 0xff) << bitOff
        val lo = if (bitOff == 0) 0
          else (stretch(byteOff + i + 1) & 0xff) >>> (8 - bitOff)
        off(i) = ((hi | lo) & 0xff).toByte
        i += 1
      }
      off
    }

    /** HASH_K(A) — associated-data authentication value. */
    private def hash(aad: Array[Byte]): Array[Byte] = {
      var sum = new Array[Byte](16)
      var offset = new Array[Byte](16)
      val m = aad.length / 16
      var i = 0
      while (i < m) {
        offset = xor16(offset, l(java.lang.Integer.numberOfTrailingZeros(i + 1)))
        val block = java.util.Arrays.copyOfRange(aad, i * 16, i * 16 + 16)
        sum = xor16(sum, enc.doFinal(xor16(block, offset)))
        i += 1
      }
      val rem = aad.length - m * 16
      if (rem > 0) {
        offset = xor16(offset, lStar)
        val padded = new Array[Byte](16)
        System.arraycopy(aad, m * 16, padded, 0, rem)
        padded(rem) = 0x80.toByte
        sum = xor16(sum, enc.doFinal(xor16(padded, offset)))
      }
      sum
    }

    private def crypt(nonce: Array[Byte], plain: Array[Byte],
        encrypting: Boolean): (Array[Byte], Array[Byte]) = {
      var offset = offset0(nonce)
      var checksum = new Array[Byte](16)
      val out = new Array[Byte](plain.length)
      val m = plain.length / 16
      var i = 0
      while (i < m) {
        offset = xor16(offset, l(java.lang.Integer.numberOfTrailingZeros(i + 1)))
        val block = java.util.Arrays.copyOfRange(plain, i * 16, i * 16 + 16)
        val o =
          if (encrypting) xor16(enc.doFinal(xor16(block, offset)), offset)
          else xor16(dec.doFinal(xor16(block, offset)), offset)
        System.arraycopy(o, 0, out, i * 16, 16)
        checksum = xor16(checksum, if (encrypting) block else o)
        i += 1
      }
      val rem = plain.length - m * 16
      if (rem > 0) {
        offset = xor16(offset, lStar)
        val pad = enc.doFinal(offset)
        val tail = java.util.Arrays.copyOfRange(plain, m * 16, plain.length)
        xorInto(tail, pad)
        System.arraycopy(tail, 0, out, m * 16, rem)
        val plainTail = if (encrypting)
          java.util.Arrays.copyOfRange(plain, m * 16, plain.length) else tail
        val padded = new Array[Byte](16)
        System.arraycopy(plainTail, 0, padded, 0, rem)
        padded(rem) = 0x80.toByte
        checksum = xor16(checksum, padded)
      }
      (out, xor16(checksum, xor16(offset, lDollar)))
    }

    def seal(nonce: Array[Byte], aad: Array[Byte], plain: Array[Byte]): Array[Byte] = {
      val (ct, pre) = crypt(nonce, plain, encrypting = true)
      ct ++ xor16(enc.doFinal(pre), hash(aad))
    }

    def open(nonce: Array[Byte], aad: Array[Byte], sealedBytes: Array[Byte]): Array[Byte] = {
      val ct = java.util.Arrays.copyOfRange(sealedBytes, 0, sealedBytes.length - TagLen)
      val tag = java.util.Arrays.copyOfRange(sealedBytes,
        sealedBytes.length - TagLen, sealedBytes.length)
      val (pt, pre) = crypt(nonce, ct, encrypting = false)
      val expect = xor16(enc.doFinal(pre), hash(aad))
      require(constEq(expect, tag), "OCB tag mismatch")
      pt
    }
  }

  // ------------------------------------------------------------- EAX

  /** EAX mode (Bellare–Rogaway–Wagner): CMAC-keyed CTR with tweaked
    * OMACs for nonce, header, and ciphertext.
    */
  private final class Eax(key: Array[Byte]) {
    private val enc = aesEnc(key)
    private val k1 = dbl(enc.doFinal(new Array[Byte](16)))
    private val k2 = dbl(k1)

    private def cmac(data: Array[Byte]): Array[Byte] = {
      val m = math.max(1, (data.length + 15) / 16)
      var x = new Array[Byte](16)
      var i = 0
      while (i < m - 1) {
        x = enc.doFinal(xor16(x,
          java.util.Arrays.copyOfRange(data, i * 16, i * 16 + 16)))
        i += 1
      }
      val last = new Array[Byte](16)
      val rem = data.length - (m - 1) * 16
      if (rem == 16) {
        System.arraycopy(data, (m - 1) * 16, last, 0, 16)
        xorInto(last, k1)
      } else {
        if (rem > 0) System.arraycopy(data, (m - 1) * 16, last, 0, rem)
        last(rem) = 0x80.toByte
        xorInto(last, k2)
      }
      enc.doFinal(xor16(x, last))
    }

    private def omac(t: Int, data: Array[Byte]): Array[Byte] = {
      val prefix = new Array[Byte](16)
      prefix(15) = t.toByte
      cmac(prefix ++ data)
    }

    private def ctr(n: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("AES/CTR/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(n))
      c.doFinal(data)
    }

    def seal(nonce: Array[Byte], aad: Array[Byte], plain: Array[Byte]): Array[Byte] = {
      val n = omac(0, nonce)
      val h = omac(1, aad)
      val ct = ctr(n, plain)
      ct ++ xor16(xor16(n, omac(2, ct)), h)
    }

    def open(nonce: Array[Byte], aad: Array[Byte], sealedBytes: Array[Byte]): Array[Byte] = {
      val ct = java.util.Arrays.copyOfRange(sealedBytes, 0, sealedBytes.length - TagLen)
      val tag = java.util.Arrays.copyOfRange(sealedBytes,
        sealedBytes.length - TagLen, sealedBytes.length)
      val n = omac(0, nonce)
      val expect = xor16(xor16(n, omac(2, ct)), omac(1, aad))
      require(constEq(expect, tag), "EAX tag mismatch")
      ctr(n, ct)
    }
  }
}
