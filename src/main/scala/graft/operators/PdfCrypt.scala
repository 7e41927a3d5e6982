package graft.operators

import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (ISO 32000-1 §7.6, 32000-2 §7.6.4) —
  * the EMPTY-user-password case a crawled corpus actually hits:
  * documents "encrypted" only to set permission bits open without a
  * password prompt. Covers R2/R3 (RC4 40/128), R4 (/CFM V2 or AESV2)
  * and R6 (AES-256 with the 2.B iterated hash). The user password is
  * VERIFIED against /U before any key is trusted; a document that
  * genuinely requires a password fails loudly by name.
  *
  * Fixtures are produced by an independent implementation of the same
  * algorithms in python (tools/pdf_encrypt.py over the cryptography
  * primitives), so the Scala decrypt path is cross-checked rather
  * than round-tripped against itself.
  */
object PdfCrypt {

  /** The spec's 32-byte password padding (ISO 32000-1 Table 3.19). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Resolved crypto state: `cfm` selects the per-object cipher. */
  final case class State(r: Int, key: Array[Byte], cfm: String)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private[operators] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** ISO 32000-2 Algorithm 2.B iterated hash (R6). */
  private[operators] def hash2b(pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = MessageDigest.getInstance("SHA-256")
      .digest(pw ++ salt ++ udata)
    var i = 0
    var lastE = 0
    while (i < 64 || lastE > i - 32) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length)
        j += 1
      }
      val e = aesCbc(Cipher.ENCRYPT_MODE,
        java.util.Arrays.copyOfRange(k, 0, 16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      var sum = 0
      j = 0
      while (j < 16) { sum += e(j) & 0xff; j += 1 }
      k = (sum % 3) match {
        case 0 => MessageDigest.getInstance("SHA-256").digest(e)
        case 1 => MessageDigest.getInstance("SHA-384").digest(e)
        case _ => MessageDigest.getInstance("SHA-512").digest(e)
      }
      lastE = e(e.length - 1) & 0xff
      i += 1
    }
    java.util.Arrays.copyOfRange(k, 0, 32)
  }

  private def leInt(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Build the crypto state for an /Encrypt dictionary, validating the
    * EMPTY user password against /U. Inputs are pre-resolved: byte
    * strings for O/U/UE, ints for V/R/P/Length, the crypt-filter
    * method name for V4/V5, and the first /ID element.
    */
  def init(id: Long, v: Int, r: Int, length: Int, p: Long,
      o: Array[Byte], u: Array[Byte], ue: Array[Byte],
      cfm: String, encryptMetadata: Boolean,
      id0: Array[Byte]): State = {
    if (v <= 4) {
      require(r >= 2 && r <= 4, s"media $id: PDF encryption revision $r with V=$v unsupported")
      require(o.length >= 32 && u.length >= 32,
        s"media $id: PDF /O//U entries too short")
      val n = if (v == 1) 5 else {
        require(length % 8 == 0 && length >= 40 && length <= 128,
          s"media $id: PDF key length $length invalid")
        length / 8
      }
      val extra =
        if (r == 4 && !encryptMetadata) Array[Byte](-1, -1, -1, -1)
        else Array.emptyByteArray
      var key = md5(Pad, java.util.Arrays.copyOfRange(o, 0, 32),
        leInt(p), id0, extra)
      key = java.util.Arrays.copyOfRange(key, 0, n)
      if (r >= 3) {
        var i = 0
        while (i < 50) {
          key = java.util.Arrays.copyOfRange(md5(key), 0, n)
          i += 1
        }
      }
      // verify the empty USER password (algorithm 4 / 5)
      val ok =
        if (r == 2) java.util.Arrays.equals(rc4(key, Pad),
          java.util.Arrays.copyOfRange(u, 0, 32))
        else {
          var x = md5(Pad, id0)
          x = rc4(key, x)
          var i = 1
          while (i <= 19) {
            val ki = key.map(b => (b ^ i).toByte)
            x = rc4(ki, x)
            i += 1
          }
          java.util.Arrays.equals(x,
            java.util.Arrays.copyOfRange(u, 0, 16))
        }
      require(ok, s"media $id: PDF requires a user password (empty password rejected by /U)")
      val method = if (v < 4) "V2" else cfm
      require(method == "V2" || method == "AESV2",
        s"media $id: PDF crypt filter method '$method' unsupported for V=$v")
      State(r, key, method)
    } else {
      require(v == 5 && r == 6, s"media $id: PDF encryption V=$v R=$r unsupported")
      require(u.length >= 48 && ue.length >= 32,
        s"media $id: PDF /U//UE entries too short for R6")
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
      val empty = Array.emptyByteArray
      val check = hash2b(empty, vSalt, empty)
      require(java.util.Arrays.equals(check,
        java.util.Arrays.copyOfRange(u, 0, 32)),
        s"media $id: PDF requires a user password (empty password rejected by /U, R6)")
      val ik = hash2b(empty, kSalt, empty)
      val fileKey = aesCbc(Cipher.DECRYPT_MODE, ik, new Array[Byte](16),
        java.util.Arrays.copyOfRange(ue, 0, 32))
      require(cfm == "AESV3", s"media $id: PDF R6 crypt filter '$cfm' unsupported")
      State(r, fileKey, "AESV3")
    }
  }

  /** Decrypt one string/stream payload of object (num, gen). */
  def decrypt(id: Long, st: State, num: Int, gen: Int,
      data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty) return data
    st.cfm match {
      case "V2" =>
        val mk = objectKey(st, num, gen, aes = false)
        rc4(mk, data)
      case "AESV2" =>
        val mk = objectKey(st, num, gen, aes = true)
        aesDecrypt(id, mk, data)
      case "AESV3" =>
        aesDecrypt(id, st.key, data)
      case other => throw new IllegalArgumentException(
        s"media $id: PDF crypt method '$other' unsupported")
    }
  }

  private def objectKey(st: State, num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val n = st.key.length
    val tail = Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6c, 0x54) else Array.emptyByteArray
    val mk = md5(st.key, tail, salt)
    java.util.Arrays.copyOfRange(mk, 0, math.min(n + 5, 16))
  }

  private def aesDecrypt(id: Long, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(data.length >= 32 && data.length % 16 == 0,
      s"media $id: PDF AES payload length ${data.length} invalid")
    val iv = java.util.Arrays.copyOfRange(data, 0, 16)
    val plain = aesCbc(Cipher.DECRYPT_MODE, key, iv,
      java.util.Arrays.copyOfRange(data, 16, data.length))
    val pad = plain(plain.length - 1) & 0xff
    require(pad >= 1 && pad <= 16 && pad <= plain.length,
      s"media $id: PDF AES padding byte $pad invalid")
    var i = plain.length - pad
    while (i < plain.length) {
      require((plain(i) & 0xff) == pad, s"media $id: PDF AES padding corrupt")
      i += 1
    }
    java.util.Arrays.copyOfRange(plain, 0, plain.length - pad)
  }
}
