package graft.functions

import java.io.ByteArrayOutputStream
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** OpenPGP (RFC 4880) passphrase-based file crypto in pure JCE — the
  * reference's GPG codec seam
  * (gobblin-modules/gobblin-crypto/.../GPGFileEncryptor.java /
  * GPGFileDecryptor.java) re-expressed without BouncyCastle, which the
  * zero-egress classpath lacks. Wire-compatible with GnuPG for the
  * password-based subset the reference exercises:
  *
  *   decrypt: SKESK(v4, S2K simple/salted/iterated; SHA1/256/512) +
  *            SEIPD(v1, AES-128/192/256 CFB) packets, old- and
  *            new-format headers including PARTIAL lengths (gpg
  *            streams pipes with partial-length packets), optional
  *            ZIP/ZLIB compressed payload, MDC integrity verified;
  *   encrypt: SKESK(iterated+salted SHA-256) + SEIPD(AES-256) +
  *            uncompressed literal — decryptable by `gpg -d`
  *            (interop-tested in PgpSpec against the real binary).
  *
  * Scale shape: a codec — executors decrypt file bytes in place
  * (binaryFile source column -> plaintext column), no driver state.
  *
  * GnuPG compatibility: decrypt speaks SKESK v4 + SEIPD v1 (MDC) —
  * the format every GnuPG 1.4–2.2 emits and 2.3/2.4 emit under
  * `--force-mdc` — and, since round 9, SKESK v6 + SEIPD v2 (RFC 9580
  * chunked AEAD: OCB/EAX/GCM with HKDF-SHA256 key separation), the
  * standardized AEAD format ([[encryptAead]] emits it too). GnuPG's
  * pre-standard librepgp AEAD packet (tag 20) is rejected BY NAME;
  * Argon2 S2K likewise. This container's gpg binary (2.2.40, AEAD
  * compiled out) cannot emit any AEAD format, so the v1 fixtures pass
  * `--force-mdc` and the AEAD tier is anchored against a foreign OCB
  * implementation instead (PgpSpec pins pyca/cryptography AESOCB3
  * ciphertexts; GCM rides the JDK's own implementation).
  */
object Pgp {

  // --- S2K (RFC 4880 §3.7) -------------------------------------------

  private def hashName(id: Int): String = id match {
    case 2 => "SHA-1"
    case 8 => "SHA-256"
    case 9 => "SHA-384"
    case 10 => "SHA-512"
    case 11 => "SHA-224"
    case other => throw new IllegalArgumentException(s"unsupported S2K hash algo $other")
  }

  private def keyBytes(symAlgo: Int): Int = symAlgo match {
    case 7 => 16 // AES-128
    case 8 => 24 // AES-192
    case 9 => 32 // AES-256
    case other => throw new IllegalArgumentException(s"unsupported cipher algo $other (AES only)")
  }

  /** Iterated+salted S2K; `count` octets of (salt ++ passphrase)
    * repeated, per preloaded-zeros context until keyLen is covered.
    */
  private[graft] def s2k(passphrase: Array[Byte], salt: Array[Byte], count: Long,
      hashAlgo: Int, keyLen: Int): Array[Byte] = {
    val data = salt ++ passphrase
    val total = math.max(count, data.length.toLong)
    val out = new ByteArrayOutputStream()
    var ctx = 0
    while (out.size < keyLen) {
      val md = MessageDigest.getInstance(hashName(hashAlgo))
      var i = 0
      while (i < ctx) { md.update(0.toByte); i += 1 }
      var fed = 0L
      while (fed < total) {
        val n = math.min(data.length.toLong, total - fed).toInt
        md.update(data, 0, n)
        fed += n
      }
      out.write(md.digest())
      ctx += 1
    }
    out.toByteArray.take(keyLen)
  }

  private def s2kCount(c: Int): Long = (16L + (c & 15)) << ((c >> 4) + 6)

  // --- packet stream parsing -----------------------------------------

  /** One parsed packet: tag + body (partial-length bodies coalesced). */
  private final case class Packet(tag: Int, body: Array[Byte])

  private final class Reader(buf: Array[Byte], var pos: Int = 0) {
    def u8(): Int = {
      require(pos < buf.length, s"truncated packet at $pos (+1)")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= buf.length, s"truncated packet at $pos (+$n)")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; r
    }
    def atEnd: Boolean = pos >= buf.length
  }

  private def parsePackets(bytes: Array[Byte]): Seq[Packet] = {
    val r = new Reader(bytes)
    val out = Seq.newBuilder[Packet]
    while (!r.atEnd) {
      val hdr = r.u8()
      require((hdr & 0x80) != 0, f"not an OpenPGP packet header: 0x$hdr%02x")
      if ((hdr & 0x40) != 0) {
        // new format
        val tag = hdr & 0x3f
        val body = new ByteArrayOutputStream()
        var done = false
        while (!done) {
          val b0 = r.u8()
          if (b0 < 192) { body.write(r.take(b0)); done = true }
          else if (b0 <= 223) {
            val len = ((b0 - 192) << 8) + r.u8() + 192
            body.write(r.take(len)); done = true
          } else if (b0 == 255) {
            val len = (r.u8() << 24) | (r.u8() << 16) | (r.u8() << 8) | r.u8()
            body.write(r.take(len)); done = true
          } else {
            // partial length: 2^(b0 & 0x1f), more headers follow
            body.write(r.take(1 << (b0 & 0x1f)))
          }
        }
        out += Packet(tag, body.toByteArray)
      } else {
        // old format
        val tag = (hdr >> 2) & 0x0f
        val len = (hdr & 0x03) match {
          case 0 => r.u8()
          case 1 => (r.u8() << 8) | r.u8()
          case 2 => (r.u8() << 24) | (r.u8() << 16) | (r.u8() << 8) | r.u8()
          case 3 => bytes.length - r.pos // indeterminate: to end of input
        }
        out += Packet(tag, r.take(len))
      }
    }
    out.result()
  }

  // --- decrypt --------------------------------------------------------

  /** Decrypted literal: original filename (may be empty) + data. */
  final case class Literal(name: String, data: Array[Byte])

  def decrypt(encrypted: Array[Byte], passphrase: String): Literal = {
    val packets = parsePackets(encrypted)
    val skesk = packets.find(_.tag == 3).getOrElse(
      throw new IllegalArgumentException("no symmetric-key session packet (tag 3)"))

    val sr = new Reader(skesk.body)
    def s2kFields(r: Reader): (Int, Array[Byte], Long) = {
      val s2kType = r.u8()
      if (s2kType == 4) throw new IllegalArgumentException(
        "Argon2 S2K unsupported (simple/salted/iterated only)")
      val hashAlgo = r.u8()
      s2kType match {
        case 0 => (hashAlgo, Array.empty[Byte], 0L)
        case 1 => (hashAlgo, r.take(8), 0L)
        case 3 => val s = r.take(8); (hashAlgo, s, s2kCount(r.u8()))
        case other =>
          throw new IllegalArgumentException(s"unsupported S2K type $other")
      }
    }
    val sessionKey = sr.u8() match {
      case 4 =>
        val symAlgo = sr.u8()
        val (hashAlgo, salt, count) = s2kFields(sr)
        require(sr.atEnd,
          "v4 encrypted session keys are out of scope (passphrase-only seam)")
        s2k(passphrase.getBytes("UTF-8"), salt, count, hashAlgo, keyBytes(symAlgo))
      case 6 =>
        // RFC 9580 §5.3.2: the S2K output is an HKDF ikm; the session
        // key itself travels AEAD-wrapped under the derived KEK
        sr.u8() // octet count of the next 5 fields (structure is self-framing)
        val symAlgo = sr.u8()
        val aeadAlgo = sr.u8()
        val s2kLen = sr.u8()
        val (hashAlgo, salt, count) = s2kFields(new Reader(sr.take(s2kLen)))
        val iv = sr.take(OpenPgpAead.ivLen(aeadAlgo))
        val esk = sr.take(skesk.body.length - sr.pos)
        val ikm = s2k(passphrase.getBytes("UTF-8"), salt, count, hashAlgo,
          keyBytes(symAlgo))
        val info = Array[Byte](0xc3.toByte, 6, symAlgo.toByte, aeadAlgo.toByte)
        val kek = OpenPgpAead.hkdf(ikm, Array.emptyByteArray, info, keyBytes(symAlgo))
        try OpenPgpAead.open(aeadAlgo, kek, iv, info, esk)
        catch { case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"session key unwrap failed (${e.getMessage}) — wrong passphrase?") }
      case v =>
        throw new IllegalArgumentException(s"unsupported SKESK version $v")
    }
    decryptSeipd(packets, sessionKey,
      wrongKeyHint = "session key check failed — wrong passphrase?")
  }

  /** Encrypted-data dispatch: SEIPD v1 (CFB + MDC) or SEIPD v2
    * (RFC 9580 chunked AEAD). GnuPG's pre-standard librepgp AEAD
    * packet (tag 20) is detected and rejected by name.
    */
  private def decryptSeipd(packets: Seq[Packet], key: Array[Byte],
      wrongKeyHint: String): Literal = {
    val seipd = packets.find(_.tag == 18).getOrElse {
      if (packets.exists(_.tag == 20)) throw new IllegalArgumentException(
        "GnuPG librepgp AEAD packet (tag 20) unsupported — re-encrypt as " +
          "SEIPD v1 (gpg --force-mdc) or RFC 9580 SEIPD v2")
      throw new IllegalArgumentException(
        "no integrity-protected data packet (tag 18) — non-MDC data is rejected")
    }
    if ((seipd.body(0) & 0xff) == 2)
      return decryptSeipdV2(seipd.body, key, wrongKeyHint)
    val dr = new Reader(seipd.body)
    require(dr.u8() == 1, "unsupported SEIPD version")
    val cipherText = dr.take(seipd.body.length - 1)
    val c = Cipher.getInstance("AES/CFB128/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    val plain = c.doFinal(cipherText)
    require(plain.length >= 18 + 22, "ciphertext too short")
    require(plain(14) == plain(16) && plain(15) == plain(17), wrongKeyHint)
    // MDC: last 22 bytes are D3 14 SHA1(plain[0 .. len-20))
    val mdcAt = plain.length - 22
    require((plain(mdcAt) & 0xff) == 0xd3 && (plain(mdcAt + 1) & 0xff) == 0x14,
      "missing MDC trailer")
    val sha = MessageDigest.getInstance("SHA-1")
    sha.update(plain, 0, mdcAt + 2)
    require(java.util.Arrays.equals(sha.digest(),
        java.util.Arrays.copyOfRange(plain, mdcAt + 2, plain.length)),
      "MDC integrity check failed — data tampered")

    val inner = java.util.Arrays.copyOfRange(plain, 18, mdcAt)
    literalOf(parsePackets(inner))
  }

  /** SEIPD v2 (RFC 9580 §5.13.2): HKDF-SHA256(session key, salt32,
    * info) → message key + nonce prefix; the plaintext travels in
    * 2^(c+6)-octet AEAD chunks (nonce suffix = 64-bit chunk index,
    * AAD = the 5-octet packet info) followed by a detached final tag
    * over the empty string with the total plaintext octet count
    * appended to the AAD — truncation is detected, not just tamper.
    */
  private def decryptSeipdV2(body: Array[Byte], sessionKey: Array[Byte],
      wrongKeyHint: String): Literal = {
    val r = new Reader(body)
    require(r.u8() == 2, "unsupported SEIPD version")
    val cipherAlgo = r.u8()
    val aeadAlgo = r.u8()
    val chunkOct = r.u8()
    require(chunkOct <= 16, s"SEIPD v2 chunk-size octet $chunkOct out of range")
    val salt = r.take(32)
    require(sessionKey.length == keyBytes(cipherAlgo),
      s"session key is ${sessionKey.length} octets; cipher $cipherAlgo needs ${keyBytes(cipherAlgo)}")
    val info = Array[Byte](0xd2.toByte, 2, cipherAlgo.toByte, aeadAlgo.toByte,
      chunkOct.toByte)
    val ivl = OpenPgpAead.ivLen(aeadAlgo)
    val okm = OpenPgpAead.hkdf(sessionKey, salt, info, keyBytes(cipherAlgo) + ivl - 8)
    val mk = okm.take(keyBytes(cipherAlgo))
    val ivPrefix = okm.drop(keyBytes(cipherAlgo))
    def nonce(index: Long): Array[Byte] = {
      val n = new Array[Byte](ivl)
      System.arraycopy(ivPrefix, 0, n, 0, ivl - 8)
      var i = 0
      while (i < 8) { n(ivl - 1 - i) = ((index >>> (8 * i)) & 0xff).toByte; i += 1 }
      n
    }
    def be64(v: Long): Array[Byte] =
      Array.tabulate(8)(i => ((v >>> (8 * (7 - i))) & 0xff).toByte)
    val chunkSize = 1L << (chunkOct + 6)
    val rest = r.take(body.length - r.pos)
    require(rest.length >= 16, "truncated SEIPD v2 (no final tag)")
    val dataLen = rest.length - 16
    val finalTag = java.util.Arrays.copyOfRange(rest, dataLen, rest.length)
    val out = new ByteArrayOutputStream()
    var index = 0L
    var pos = 0
    try {
      while (pos < dataLen) {
        val clen = math.min(chunkSize + 16, (dataLen - pos).toLong).toInt
        require(clen >= 16, "truncated AEAD chunk")
        out.write(OpenPgpAead.open(aeadAlgo, mk, nonce(index), info,
          java.util.Arrays.copyOfRange(rest, pos, pos + clen)))
        pos += clen
        index += 1
      }
      // the final tag authenticates the chunk count and total length
      OpenPgpAead.open(aeadAlgo, mk, nonce(index), info ++ be64(out.size.toLong),
        finalTag)
    } catch {
      case e: IllegalArgumentException => throw new IllegalArgumentException(
        s"SEIPD v2 authentication failed (${e.getMessage}) — $wrongKeyHint")
    }
    literalOf(parsePackets(out.toByteArray))
  }

  private def literalOf(packets: Seq[Packet]): Literal =
    packets.collectFirst {
      case Packet(11, body) =>
        val lr = new Reader(body)
        lr.u8() // format: 'b'/'t'/'u'
        val name = new String(lr.take(lr.u8()), "UTF-8")
        lr.take(4) // date
        Literal(name, lr.take(body.length - lr.pos))
      case Packet(8, body) =>
        // compressed data: algo byte + packets
        val algo = body(0) & 0xff
        val deflated = java.util.Arrays.copyOfRange(body, 1, body.length)
        val raw = algo match {
          case 0 => deflated
          case 1 => inflate(deflated, nowrap = true) // ZIP
          case 2 => inflate(deflated, nowrap = false) // ZLIB
          case other => throw new IllegalArgumentException(s"unsupported compression $other")
        }
        literalOf(parsePackets(raw))
    }.getOrElse(throw new IllegalArgumentException("no literal data packet found"))

  private def inflate(data: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    // raw-deflate (nowrap) inflaters may need one dummy byte past the
    // final block (Inflater javadoc); harmless to always provide.
    inf.setInput(data :+ 0.toByte)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    // drain until FINISHED — exiting on needsInput() with pending
    // internal output silently truncates (measured: repetitive docs
    // whose compressed stream fits zlib's bit buffer lost their tail)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (!inf.finished()) {
        require(!inf.needsInput() && !inf.needsDictionary(),
          "truncated compressed stream")
      }
    }
    inf.end()
    out.toByteArray
  }

  // --- encrypt --------------------------------------------------------

  /** Passphrase-encrypt `data` as gpg would (`--symmetric --cipher-algo
    * AES256`): SKESK(iterated+salted SHA-256, count 65536) + SEIPD v1,
    * uncompressed literal. `gpg -d` accepts the output (PgpSpec).
    * Salt/prefix randomness comes from SecureRandom; pass a fixed
    * `rng` only in tests.
    */
  def encrypt(data: Array[Byte], passphrase: String, name: String = "",
      rng: java.security.SecureRandom = new java.security.SecureRandom()): Array[Byte] = {
    val salt = new Array[Byte](8); rng.nextBytes(salt)
    val countByte = 0x60 // (16+0) << (6+6) = 65536
    val key = s2k(passphrase.getBytes("UTF-8"), salt, s2kCount(countByte),
      hashAlgo = 8, keyLen = 32)
    val skesk = newPacket(3,
      Array[Byte](4, 9, 3, 8) ++ salt ++ Array(countByte.toByte))
    skesk ++ buildSeipd(data, name, key, rng)
  }

  /** RFC 9580 passphrase encrypt: SKESK v6 (AEAD-wrapped random
    * session key under an HKDF KEK) + SEIPD v2 (AES-256, chunked
    * AEAD). `aeadAlgo`: 1 = EAX, 2 = OCB (the spec-mandatory default),
    * 3 = GCM. Round-trips through [[decrypt]]; no GnuPG interop
    * fixture exists in this container (its gpg 2.2 build has AEAD
    * compiled out), so PgpSpec anchors the OCB primitive against a
    * foreign implementation instead — see [[OpenPgpAead]].
    */
  def encryptAead(data: Array[Byte], passphrase: String, name: String = "",
      aeadAlgo: Int = 2, chunkSizeOctet: Int = 6,
      rng: java.security.SecureRandom = new java.security.SecureRandom()): Array[Byte] = {
    require(chunkSizeOctet >= 0 && chunkSizeOctet <= 16, "bad chunk-size octet")
    val symAlgo = 9 // AES-256
    val sessionKey = new Array[Byte](32); rng.nextBytes(sessionKey)

    // SKESK v6
    val s2kSalt = new Array[Byte](8); rng.nextBytes(s2kSalt)
    val countByte = 0x60 // 65536 iterations
    val ikm = s2k(passphrase.getBytes("UTF-8"), s2kSalt, s2kCount(countByte),
      hashAlgo = 8, keyLen = keyBytes(symAlgo))
    val skInfo = Array[Byte](0xc3.toByte, 6, symAlgo.toByte, aeadAlgo.toByte)
    val kek = OpenPgpAead.hkdf(ikm, Array.emptyByteArray, skInfo, keyBytes(symAlgo))
    val skIv = new Array[Byte](OpenPgpAead.ivLen(aeadAlgo)); rng.nextBytes(skIv)
    val esk = OpenPgpAead.seal(aeadAlgo, kek, skIv, skInfo, sessionKey)
    val s2kSpec = Array[Byte](3, 8) ++ s2kSalt ++ Array(countByte.toByte)
    val fieldCount = 1 + 1 + 1 + s2kSpec.length + skIv.length
    val skesk = newPacket(3,
      Array[Byte](6, fieldCount.toByte, symAlgo.toByte, aeadAlgo.toByte,
        s2kSpec.length.toByte) ++ s2kSpec ++ skIv ++ esk)

    // SEIPD v2
    val chunkSize = 1L << (chunkSizeOctet + 6)
    val info = Array[Byte](0xd2.toByte, 2, symAlgo.toByte, aeadAlgo.toByte,
      chunkSizeOctet.toByte)
    val salt = new Array[Byte](32); rng.nextBytes(salt)
    val ivl = OpenPgpAead.ivLen(aeadAlgo)
    val okm = OpenPgpAead.hkdf(sessionKey, salt, info, keyBytes(symAlgo) + ivl - 8)
    val mk = okm.take(keyBytes(symAlgo))
    val ivPrefix = okm.drop(keyBytes(symAlgo))
    def nonce(index: Long): Array[Byte] = {
      val n = new Array[Byte](ivl)
      System.arraycopy(ivPrefix, 0, n, 0, ivl - 8)
      var i = 0
      while (i < 8) { n(ivl - 1 - i) = ((index >>> (8 * i)) & 0xff).toByte; i += 1 }
      n
    }
    def be64(v: Long): Array[Byte] =
      Array.tabulate(8)(i => ((v >>> (8 * (7 - i))) & 0xff).toByte)
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.length < 256, "literal filename too long")
    val literal = newPacket(11,
      Array[Byte]('b'.toByte, nameBytes.length.toByte) ++ nameBytes ++
        Array[Byte](0, 0, 0, 0) ++ data)
    val body = new ByteArrayOutputStream()
    body.write(2); body.write(symAlgo); body.write(aeadAlgo); body.write(chunkSizeOctet)
    body.write(salt, 0, 32)
    var index = 0L
    var pos = 0
    while (pos < literal.length) {
      val n = math.min(chunkSize, (literal.length - pos).toLong).toInt
      val sealedChunk = OpenPgpAead.seal(aeadAlgo, mk, nonce(index), info,
        java.util.Arrays.copyOfRange(literal, pos, pos + n))
      body.write(sealedChunk, 0, sealedChunk.length)
      pos += n
      index += 1
    }
    val finalTag = OpenPgpAead.seal(aeadAlgo, mk, nonce(index),
      info ++ be64(literal.length.toLong), Array.emptyByteArray)
    body.write(finalTag, 0, finalTag.length)
    skesk ++ newPacket(18, body.toByteArray)
  }

  private def newPacket(tag: Int, body: Array[Byte]): Array[Byte] = {
    val hdr = new ByteArrayOutputStream()
    hdr.write(0xc0 | tag)
    val n = body.length
    if (n < 192) hdr.write(n)
    else if (n < 8384) { hdr.write(((n - 192) >> 8) + 192); hdr.write((n - 192) & 0xff) }
    else { hdr.write(255); hdr.write(n >> 24); hdr.write((n >> 16) & 0xff)
      hdr.write((n >> 8) & 0xff); hdr.write(n & 0xff) }
    hdr.write(body, 0, n)
    hdr.toByteArray
  }

  /** Literal packet + MDC trailer, AES-CFB'd under `key` → one SEIPD
    * v1 packet (shared by the passphrase and public-key encryptors).
    */
  private def buildSeipd(data: Array[Byte], name: String, key: Array[Byte],
      rng: java.security.SecureRandom): Array[Byte] = {
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.length < 256, "literal filename too long")
    val literal = newPacket(11,
      Array[Byte]('b'.toByte, nameBytes.length.toByte) ++ nameBytes ++
        Array[Byte](0, 0, 0, 0) ++ data)

    val prefix = new Array[Byte](16); rng.nextBytes(prefix)
    val plain = new ByteArrayOutputStream()
    plain.write(prefix); plain.write(prefix(14)); plain.write(prefix(15))
    plain.write(literal, 0, literal.length)
    plain.write(0xd3); plain.write(0x14)
    val sha = MessageDigest.getInstance("SHA-1")
    val mdcBody = plain.toByteArray
    plain.write(sha.digest(mdcBody), 0, 20)

    val c = Cipher.getInstance("AES/CFB128/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    newPacket(18, Array[Byte](1) ++ c.doFinal(plain.toByteArray))
  }

  // --- public-key (PKESK, RFC 4880 §5.1) ------------------------------
  // The key-based half of the reference codec seam (GPGFileEncryptor
  // also accepts a keyring + key id): RSA session-key packets via JCE.
  // Key material comes from gpg's own transferable key format
  // (`gpg --export` / `gpg --export-secret-keys` of an UNPROTECTED
  // key — %no-protection / s2k-usage 0; passphrase-locked exports are
  // rejected loudly), or directly as (n, e[, d]) for JCE-generated
  // pairs.

  /** An RSA key parsed from a keyring: `keyId` is the low 64 bits of
    * the v4 SHA-1 fingerprint; `d` is present only for secret keys;
    * `isSubkey` marks tags 14/7 (gpg encrypts to the subkey).
    */
  final case class RsaKey(keyId: Seq[Byte], n: java.math.BigInteger,
      e: java.math.BigInteger, d: Option[java.math.BigInteger], isSubkey: Boolean)

  private def readMpi(r: Reader): java.math.BigInteger = {
    val bits = (r.u8() << 8) | r.u8()
    new java.math.BigInteger(1, r.take((bits + 7) / 8))
  }

  private def writeMpi(v: java.math.BigInteger): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    Array[Byte]((v.bitLength() >> 8).toByte, (v.bitLength() & 0xff).toByte) ++ raw
  }

  /** Parse every RSA key (tags 5/6/7/14, v4) out of a binary keyring
    * export; other packet types (uids, signatures) are skipped.
    */
  def parseKeys(keyring: Array[Byte]): Seq[RsaKey] =
    parsePackets(keyring).collect {
      case Packet(tag, body) if tag == 5 || tag == 6 || tag == 7 || tag == 14 =>
        val r = new Reader(body)
        require(r.u8() == 4, "only v4 keys supported")
        r.take(4) // creation time
        val algo = r.u8()
        require(algo == 1 || algo == 2,
          s"unsupported public-key algorithm $algo (RSA only)")
        val n = readMpi(r)
        val e = readMpi(r)
        val publicLen = r.pos // the public portion ends after e
        // v4 fingerprint: SHA1(0x99, len16, public portion)
        val sha = MessageDigest.getInstance("SHA-1")
        sha.update(0x99.toByte)
        sha.update((publicLen >> 8).toByte); sha.update((publicLen & 0xff).toByte)
        sha.update(body, 0, publicLen)
        val keyId = sha.digest().takeRight(8).toSeq
        val d =
          if (tag == 5 || tag == 7) {
            val usage = r.u8()
            require(usage == 0,
              "passphrase-protected secret key export — re-export with %no-protection")
            Some(readMpi(r)) // d; p, q, u + checksum follow, unneeded
          } else None
        RsaKey(keyId, n, e, d, isSubkey = tag == 7 || tag == 14)
    }

  /** The key gpg would encrypt to: the (first) encryption SUBKEY, or
    * the primary when the ring has no subkey.
    */
  def encryptionKey(keyring: Array[Byte]): RsaKey = {
    val keys = parseKeys(keyring)
    require(keys.nonEmpty, "no RSA keys in keyring")
    keys.find(_.isSubkey).getOrElse(keys.head)
  }

  private def sessionChecksum(sk: Array[Byte]): Int =
    sk.foldLeft(0)((a, b) => (a + (b & 0xff)) & 0xffff)

  /** Public-key encrypt: PKESK(v3, RSA, PKCS#1 v1.5) + SEIPD(AES-256)
    * — `gpg -d` with the matching secret key accepts the output.
    */
  def encryptPk(data: Array[Byte], recipient: RsaKey, name: String = "",
      rng: java.security.SecureRandom = new java.security.SecureRandom()): Array[Byte] = {
    val sk = new Array[Byte](32); rng.nextBytes(sk)
    val check = sessionChecksum(sk)
    val m = Array[Byte](9) ++ sk ++ // algo 9 = AES-256
      Array[Byte]((check >> 8).toByte, (check & 0xff).toByte)
    val kf = java.security.KeyFactory.getInstance("RSA")
    val c = Cipher.getInstance("RSA/ECB/PKCS1Padding")
    c.init(Cipher.ENCRYPT_MODE, kf.generatePublic(
      new java.security.spec.RSAPublicKeySpec(recipient.n, recipient.e)))
    val mpi = writeMpi(new java.math.BigInteger(1, c.doFinal(m)))
    val pkesk = newPacket(1,
      Array[Byte](3) ++ recipient.keyId ++ Array[Byte](1) ++ mpi)
    pkesk ++ buildSeipd(data, name, sk, rng)
  }

  /** Public-key decrypt with any matching secret key from `keys`
    * (wildcard zero key ids try every key, as gpg does).
    */
  def decryptPk(encrypted: Array[Byte], keys: Seq[RsaKey]): Literal = {
    val secret = keys.filter(_.d.isDefined)
    require(secret.nonEmpty, "no secret RSA keys supplied")
    val packets = parsePackets(encrypted)
    val pkesks = packets.filter(_.tag == 1)
    require(pkesks.nonEmpty, "no public-key session packet (tag 1)")
    val attempts = pkesks.flatMap { p =>
      val r = new Reader(p.body)
      require(r.u8() == 3, "unsupported PKESK version")
      val keyId = r.take(8).toSeq
      val algo = r.u8()
      require(algo == 1 || algo == 2,
        s"unsupported PKESK algorithm $algo (RSA only)")
      val ct = readMpi(r)
      val wildcard = keyId.forall(_ == 0)
      secret.filter(k => wildcard || k.keyId == keyId).map(k => (k, ct))
    }
    require(attempts.nonEmpty,
      "no supplied secret key matches any PKESK recipient key id")
    val kf = java.security.KeyFactory.getInstance("RSA")
    val sk = attempts.iterator.map { case (k, ct) =>
      try {
        val c = Cipher.getInstance("RSA/ECB/PKCS1Padding")
        c.init(Cipher.DECRYPT_MODE, kf.generatePrivate(
          new java.security.spec.RSAPrivateKeySpec(k.n, k.d.get)))
        // left-pad to modulus size: the MPI strips leading zeros
        val raw = ct.toByteArray.dropWhile(_ == 0)
        val sz = (k.n.bitLength() + 7) / 8
        val in = new Array[Byte](sz)
        System.arraycopy(raw, 0, in, sz - raw.length, raw.length)
        val m = c.doFinal(in)
        require(m.length >= 4, "session key block too short")
        val algo = m(0) & 0xff
        val key = java.util.Arrays.copyOfRange(m, 1, m.length - 2)
        require(key.length == keyBytes(algo), "session key length mismatch")
        val check = ((m(m.length - 2) & 0xff) << 8) | (m(m.length - 1) & 0xff)
        require(sessionChecksum(key) == check, "session key checksum mismatch")
        Some(key)
      } catch { case _: Exception => None } // wrong key under wildcard: next
    }.collectFirst { case Some(k) => k }
      .getOrElse(throw new IllegalArgumentException(
        "PKESK decryption failed with every supplied secret key"))
    decryptSeipd(packets, sk, wrongKeyHint = "session key check failed — wrong key?")
  }

  /** [[decryptPk]] parsing the secret keyring bytes first. */
  def decryptPk(encrypted: Array[Byte], secretKeyring: Array[Byte]): Literal =
    decryptPk(encrypted, parseKeys(secretKeyring))
}

/** Column form of [[Pgp.decrypt]]: (encrypted bytes, passphrase) ->
  * literal data bytes. CodegenFallback by design — packet parsing +
  * JCE decryption is object work either way (same stance as
  * AvroDatumDecode); executors decrypt in place, no driver state.
  */
case class PgpDecrypt(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pgp_decrypt"
  override protected def nullSafeEval(data: Any, pass: Any): Any =
    Pgp.decrypt(data.asInstanceOf[Array[Byte]],
      pass.asInstanceOf[UTF8String].toString).data
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PgpDecrypt =
    copy(left = l, right = r)
}

object PgpDecrypt {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(data: Column, passphrase: Column): Column =
    ColumnShim.toColumn(PgpDecrypt(
      ColumnShim.toExpression(data), ColumnShim.toExpression(passphrase)))
}

/** Column form of [[Pgp.decryptPk]]: (encrypted bytes, secret keyring
  * bytes) -> literal data bytes. The keyring is normally a literal
  * (one key decrypts the whole corpus), so the parsed keys are cached
  * per task against the keyring reference — the per-row work is one
  * RSA private-key op + AES, all executor-side.
  */
case class PgpPkDecrypt(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pgp_pk_decrypt"
  @transient private var cachedRing: Array[Byte] = _
  @transient private var cachedKeys: Seq[Pgp.RsaKey] = _
  override protected def nullSafeEval(data: Any, ring: Any): Any = {
    val rb = ring.asInstanceOf[Array[Byte]]
    if (!(cachedRing eq rb)) { cachedKeys = Pgp.parseKeys(rb); cachedRing = rb }
    Pgp.decryptPk(data.asInstanceOf[Array[Byte]], cachedKeys).data
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PgpPkDecrypt =
    copy(left = l, right = r)
}

object PgpPkDecrypt {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(data: Column, secretKeyring: Column): Column =
    ColumnShim.toColumn(PgpPkDecrypt(
      ColumnShim.toExpression(data), ColumnShim.toExpression(secretKeyring)))
}
