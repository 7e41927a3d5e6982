package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RFC 4880 passphrase crypto: pure round-trips, integrity failures,
  * and TRUE interop against the system gpg binary (skipped when gpg is
  * absent — present in CI).
  */
class PgpSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // resolve the binary by probing PATH + system bins so suite health
  // doesn't depend on the invoking shell's PATH
  private lazy val gpgBin: Option[String] = graft.BinTool.resolve("gpg")

  // every scratch GNUPGHOME spawns its own gpg-agent; left running
  // they accumulate across rounds until the user's inotify-instance
  // limit (2 per agent, 128 total) kills unrelated tooling
  private val scratchHomes = scala.collection.mutable.Buffer.empty[String]
  private def trackHome(p: java.nio.file.Path): java.nio.file.Path = {
    scratchHomes += p.toString; p
  }
  override def afterAll(): Unit = {
    if (haveGpg) scratchHomes.foreach { h =>
      graft.BinTool.resolve("gpgconf").foreach(g =>
        new ProcessBuilder(g, "--homedir", h, "--kill", "gpg-agent")
          .redirectErrorStream(true).start().waitFor())
    }
    super.afterAll()
  }

  private def haveGpg: Boolean = gpgBin.isDefined

  private def sh(cmd: String*): Int = {
    val resolved = if (cmd.head == "gpg") gpgBin.get +: cmd.tail else cmd
    new ProcessBuilder(resolved: _*).redirectErrorStream(true).start().waitFor()
  }

  test("pure JCE round-trip carries filename and bytes") {
    val data = ("some corpus text " * 100).getBytes("UTF-8")
    val enc = Pgp.encrypt(data, "passphrase", "doc.txt")
    val lit = Pgp.decrypt(enc, "passphrase")
    assert(lit.name === "doc.txt")
    assert(lit.data.toSeq === data.toSeq)
  }

  test("wrong passphrase and tampered ciphertext fail loudly") {
    val enc = Pgp.encrypt("secret".getBytes("UTF-8"), "right")
    val e1 = intercept[Exception] { Pgp.decrypt(enc, "wrong") }
    assert(e1.getMessage.contains("passphrase") || e1.getMessage.contains("MDC"))
    // flip one ciphertext byte inside the SEIPD body
    val tampered = enc.clone(); tampered(enc.length - 5) = (tampered(enc.length - 5) ^ 0x40).toByte
    val e2 = intercept[Exception] { Pgp.decrypt(tampered, "right") }
    assert(e2.getMessage.contains("MDC") || e2.getMessage.contains("integrity"))
  }

  test("gpg interop: gpg encrypts (compressed), we decrypt — and vice versa") {
    assume(haveGpg, "gpg binary not on PATH")
    val tmp = java.nio.file.Files.createTempDirectory("pgpspec")
    val msg = "interop body with unicode éü and spaces"
    java.nio.file.Files.write(tmp.resolve("m.txt"), msg.getBytes("UTF-8"))
    assert(sh("gpg", "--batch", "--yes", "--force-mdc", "--symmetric", "--cipher-algo", "AES256",
      "--passphrase", "pw", "-o", tmp.resolve("a.gpg").toString,
      tmp.resolve("m.txt").toString) == 0)
    val lit = Pgp.decrypt(java.nio.file.Files.readAllBytes(tmp.resolve("a.gpg")), "pw")
    assert(new String(lit.data, "UTF-8") === msg)
    assert(lit.name === "m.txt")
    // ours -> gpg
    val enc = Pgp.encrypt(msg.getBytes("UTF-8"), "pw2", "f.txt")
    java.nio.file.Files.write(tmp.resolve("b.gpg"), enc)
    assert(sh("bash", "-c",
      s"gpg --batch --yes --passphrase pw2 -d ${tmp.resolve("b.gpg")} > ${tmp.resolve("b.out")} 2>/dev/null") == 0)
    assert(java.nio.file.Files.readString(tmp.resolve("b.out")) === msg)
  }

  test("gpg interop: stdin-streamed input (partial-length packets), AES192 + SHA512 S2K") {
    assume(haveGpg, "gpg binary not on PATH")
    val tmp = java.nio.file.Files.createTempDirectory("pgpspec2")
    assert(sh("bash", "-c",
      s"printf 'partial length body %.0s' {1..2000} | gpg --batch --yes --force-mdc --symmetric " +
        s"--cipher-algo AES192 --s2k-digest-algo SHA512 --passphrase pw3 " +
        s"-o ${tmp.resolve("s.gpg")}") == 0)
    val lit = Pgp.decrypt(java.nio.file.Files.readAllBytes(tmp.resolve("s.gpg")), "pw3")
    assert(lit.data.length === "partial length body ".length * 2000)
  }

  test("gpg interop: highly-compressible payloads inflate COMPLETELY (truncation regression)") {
    assume(haveGpg, "gpg binary not on PATH")
    val tmp = java.nio.file.Files.createTempDirectory("pgpspec3")
    // sizes around the measured truncation shape: compressed stream
    // fits zlib's bit buffer while the 8192-byte output buffer fills
    for (size <- Seq(8192, 24714, 65536, 100001)) {
      val data = Array.fill[Byte](size)('a'.toByte)
      java.nio.file.Files.write(tmp.resolve("r.bin"), data)
      assert(sh("gpg", "--batch", "--yes", "--force-mdc", "--symmetric", "--cipher-algo", "AES256",
        "--passphrase", "pw", "-o", tmp.resolve("r.gpg").toString,
        tmp.resolve("r.bin").toString) == 0)
      val lit = Pgp.decrypt(java.nio.file.Files.readAllBytes(tmp.resolve("r.gpg")), "pw")
      assert(lit.data.length === size, s"size=$size truncated to ${lit.data.length}")
      assert(lit.data.forall(_ == 'a'.toByte))
    }
  }

  // --- public-key (PKESK) ---------------------------------------------

  /** One unprotected RSA sign+encrypt-subkey pair in a scratch
    * GNUPGHOME; returns (public keyring, secret keyring, homedir).
    */
  private lazy val keyring: (Array[Byte], Array[Byte], String) = {
    val home = trackHome(java.nio.file.Files.createTempDirectory("pgpspec-gnupg"))
    java.nio.file.Files.setPosixFilePermissions(home,
      java.nio.file.attribute.PosixFilePermissions.fromString("rwx------"))
    val params = home.resolve("params")
    java.nio.file.Files.writeString(params,
      """%no-protection
        |Key-Type: RSA
        |Key-Length: 2048
        |Subkey-Type: RSA
        |Subkey-Length: 2048
        |Name-Real: Graft Test
        |Name-Email: graft@test
        |Expire-Date: 0
        |%commit
        |""".stripMargin)
    assert(sh("gpg", "--homedir", home.toString, "--batch", "--gen-key",
      params.toString) == 0)
    // -o must PRECEDE the --export command: gpg consumes everything
    // after a command as key names and dumps to stdout otherwise
    assert(sh("gpg", "--homedir", home.toString, "--batch", "--yes",
      "-o", home.resolve("pub.gpg").toString, "--export", "graft@test") == 0)
    assert(sh("gpg", "--homedir", home.toString, "--batch", "--yes",
      "-o", home.resolve("sec.gpg").toString,
      "--export-secret-keys", "graft@test") == 0)
    (java.nio.file.Files.readAllBytes(home.resolve("pub.gpg")),
      java.nio.file.Files.readAllBytes(home.resolve("sec.gpg")),
      home.toString)
  }

  test("pk interop: gpg --encrypt -r, we decrypt with the exported secret key") {
    assume(haveGpg, "gpg binary not on PATH")
    val (_, sec, home) = keyring
    val tmp = java.nio.file.Files.createTempDirectory("pgppk1")
    val msg = "public-key interop body — compressed by gpg's default"
    java.nio.file.Files.write(tmp.resolve("m.txt"), msg.getBytes("UTF-8"))
    assert(sh("gpg", "--homedir", home, "--batch", "--yes", "--force-mdc",
      "--trust-model", "always", "-r", "graft@test", "--encrypt",
      "-o", tmp.resolve("a.gpg").toString, tmp.resolve("m.txt").toString) == 0)
    val lit = Pgp.decryptPk(
      java.nio.file.Files.readAllBytes(tmp.resolve("a.gpg")), sec)
    assert(new String(lit.data, "UTF-8") === msg)
  }

  test("pk interop: we encrypt to the exported public subkey, gpg decrypts") {
    assume(haveGpg, "gpg binary not on PATH")
    val (pub, _, home) = keyring
    val tmp = java.nio.file.Files.createTempDirectory("pgppk2")
    val msg = "ours -> gpg public-key body"
    val enc = Pgp.encryptPk(msg.getBytes("UTF-8"), Pgp.encryptionKey(pub), "f.txt")
    java.nio.file.Files.write(tmp.resolve("b.gpg"), enc)
    assert(sh("bash", "-c",
      s"gpg --homedir $home --batch --yes -d ${tmp.resolve("b.gpg")} " +
        s"> ${tmp.resolve("b.out")} 2>/dev/null") == 0)
    assert(java.nio.file.Files.readString(tmp.resolve("b.out")) === msg)
  }

  test("pk pure JCE round-trip; a non-matching key id is rejected") {
    val gen = java.security.KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048)
    val kp = gen.generateKeyPair()
    val rsa = kp.getPrivate.asInstanceOf[java.security.interfaces.RSAPrivateKey]
    val pub = kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
    val key = Pgp.RsaKey(Seq.tabulate[Byte](8)(_.toByte), pub.getModulus,
      pub.getPublicExponent, Some(rsa.getPrivateExponent), isSubkey = true)
    val enc = Pgp.encryptPk("jce only".getBytes("UTF-8"), key, "x.bin")
    assert(new String(Pgp.decryptPk(enc, Seq(key)).data, "UTF-8") === "jce only")
    val stranger = key.copy(keyId = Seq.fill[Byte](8)(0x7f))
    val e = intercept[IllegalArgumentException] { Pgp.decryptPk(enc, Seq(stranger)) }
    assert(e.getMessage.contains("matches"))
  }

  test("passphrase-protected secret key exports are rejected loudly") {
    assume(haveGpg, "gpg binary not on PATH")
    val home = trackHome(java.nio.file.Files.createTempDirectory("pgpspec-prot"))
    java.nio.file.Files.setPosixFilePermissions(home,
      java.nio.file.attribute.PosixFilePermissions.fromString("rwx------"))
    val params = home.resolve("params")
    java.nio.file.Files.writeString(params,
      """Key-Type: RSA
        |Key-Length: 2048
        |Passphrase: lockedpw
        |Name-Real: Locked
        |Name-Email: locked@test
        |Expire-Date: 0
        |%commit
        |""".stripMargin)
    assert(sh("gpg", "--homedir", home.toString, "--batch", "--gen-key",
      params.toString) == 0)
    assert(sh("bash", "-c",
      s"gpg --homedir $home --batch --yes --pinentry-mode loopback " +
        s"--passphrase lockedpw -o ${home.resolve("sec.gpg")} " +
        s"--export-secret-keys locked@test") == 0)
    val e = intercept[IllegalArgumentException] {
      Pgp.parseKeys(java.nio.file.Files.readAllBytes(home.resolve("sec.gpg")))
    }
    assert(e.getMessage.contains("no-protection"))
  }

  test("s2k iterated-salted matches itself across key sizes and hash widths") {
    // keyLen > hash width forces the preloaded-zeros multi-context path
    val salt = Array.tabulate[Byte](8)(_.toByte)
    val k1 = Pgp.s2k("pw".getBytes, salt, 65536, hashAlgo = 2, keyLen = 32) // SHA-1: 2 contexts
    val k2 = Pgp.s2k("pw".getBytes, salt, 65536, hashAlgo = 2, keyLen = 32)
    assert(k1.toSeq === k2.toSeq && k1.length === 32)
    assert(Pgp.s2k("pw".getBytes, salt, 65536, hashAlgo = 8, keyLen = 16).length === 16)
  }

  // ------------------------------------------------------- AEAD (RFC 9580)

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("OCB matches a foreign implementation (pyca/cryptography AESOCB3)") {
    // (key, 15-octet nonce, aad, plaintext, ct||tag) produced by
    // cryptography 48.0 (OpenSSL AES-OCB) — the interop anchor the
    // container's AEAD-less gpg build cannot provide. Covers: empty
    // and non-empty aad/plaintext, full/partial/multi blocks, AES-128
    // and AES-256, and the OpenPGP SEIPD v2 info bytes as aad.
    val cases = Seq(
      ("00" * 32, "01" * 15, "", "",
        "ce4da07c0cdbfd120a39f3f5c8d850a5"),
      ("00" * 32, "01" * 15, "", "68656c6c6f20776f726c64",
        "7575054ffe5f01266f00bb8673eaf43ef8aa1ad68324d4584c9214"),
      ("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
        "000102030405060708090a0b0c0d0e", "d202090206",
        "54686520717569636b2062726f776e20666f78206a756d7073206f76657220746865206c617a7920646f672e",
        "02854c86516ed68e0b7bcfdb0c28f8b7ffc41ce6c4c11da367a74d886e9a12b8c5de0594a440dca2f5d7b5220ee76bb96bef758aa03433efb134caf9"),
      ("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
        "000102030405060708090a0b0c0d0e", "",
        "41414141414141414141414141414141",
        "fb0df32b4d08fc52eac9c46eb04a2dd1b69df54ada7224ee2fe324240be2869d"),
      ("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
        "000102030405060708090a0b0c0d0e", "aaaaaaaaaa",
        "42" * 33,
        "b4ab60a851cd8fe1a0b22d7e58036e83a1bf4c74602e70a0233c1b2116f23b71ef3753a0aac80d04249d06ff03d10ff7a0"),
      ("7f" * 16, "02" * 15, "6164",
        "7369787465656e2062797465732121217369787465656e2062797465732121217369787465656e2062797465732121217369787465656e206279746573212121",
        "21434e0a64a4859f71f3b87d50aebad49d338e48a5b7bb9d2f6e39e710a729a1841ff45f79b0ff4ec928c66419b6f40b1c44eee6b4351b6cd795b72b513880b60f83c85857db7c2711fd2fd416433db8"))
    cases.foreach { case (k, n, a, p, expect) =>
      val got = OpenPgpAead.seal(2, hex(k), hex(n), hex(a), hex(p))
      assert(got.map("%02x".format(_)).mkString === expect,
        s"OCB seal mismatch for pt=$p")
      val back = OpenPgpAead.open(2, hex(k), hex(n), hex(a), hex(expect))
      assert(back.toSeq === hex(p).toSeq)
    }
  }

  test("EAX matches the Bellare-Rogaway-Wagner paper test vectors") {
    // The 10 AES-128 vectors from the EAX paper's appendix (also
    // shipped by libtomcrypt/Bouncy Castle): (key, nonce, header=aad,
    // msg, cipher||tag). The external anchor for mode 1 — OCB is
    // pinned against pyca/OpenSSL above, GCM against the JDK.
    val cases = Seq(
      ("233952DEE4D5ED5F9B9C6D6FF80FF478", "62EC67F9C3A4A407FCB2A8C49031A8B3",
        "6BFB914FD07EAE6B", "",
        "E037830E8389F27B025A2D6527E79D01"),
      ("91945D3F4DCBEE0BF45EF52255F095A4", "BECAF043B0A23D843194BA972C66DEBD",
        "FA3BFD4806EB53FA", "F7FB",
        "19DD5C4C9331049D0BDAB0277408F67967E5"),
      ("01F74AD64077F2E704C0F60ADA3DD523", "70C3DB4F0D26368400A10ED05D2BFF5E",
        "234A3463C1264AC6", "1A47CB4933",
        "D851D5BAE03A59F238A23E39199DC9266626C40F80"),
      ("D07CF6CBB7F313BDDE66B727AFD3C5E8", "8408DFFF3C1A2B1292DC199E46B7D617",
        "33CCE2EABFF5A79D", "481C9E39B1",
        "632A9D131AD4C168A4225D8E1FF755939974A7BEDE"),
      ("35B6D0580005BBC12B0587124557D2C2", "FDB6B06676EEDC5C61D74276E1F8E816",
        "AEB96EAEBE2970E9", "40D0C07DA5E4",
        "071DFE16C675CB0677E536F73AFE6A14B74EE49844DD"),
      ("BD8E6E11475E60B268784C38C62FEB22", "6EAC5C93072D8E8513F750935E46DA1B",
        "D4482D1CA78DCE0F", "4DE3B35C3FC039245BD1FB7D",
        "835BB4F15D743E350E728414ABB8644FD6CCB86947C5E10590210A4F"),
      ("7C77D6E813BED5AC98BAA417477A2E7D", "1A8C98DCD73D38393B2BF1569DEEFC19",
        "65D2017990D62528", "8B0A79306C9CE7ED99DAE4F87F8DD61636",
        "02083E3979DA014812F59F11D52630DA30137327D10649B0AA6E1C181DB617D7F2"),
      ("5FFF20CAFAB119CA2FC73549E20F5B0D", "DDE59B97D722156D4D9AFF2BC7559826",
        "54B9F04E6A09189A", "1BDA122BCE8A8DBAF1877D962B8592DD2D56",
        "2EC47B2C4954A489AFC7BA4897EDCDAE8CC33B60450599BD02C96382902AEF7F832A"),
      ("A4A4782BCFFD3EC5E7EF6D8C34A56123", "B781FCF2F75FA5A8DE97A9CA48E522EC",
        "899A175897561D7E", "6CF36720872B8513F6EAB1A8A44438D5EF11",
        "0DE18FD0FDD91E7AF19F1D8EE8733938B1E8E7F6D2231618102FDB7FE55FF1991700"),
      ("8395FCF1E95BEBD697BD010BC766AAC3", "22E7ADD93CFC6393C57EC0B3C17D6B44",
        "126735FCC320D25A", "CA40D7446E545FFAED3BD12A740A659FFBBB3CEAB7",
        "CB8920F87A6C75CFF39627B56E3ED197C552D295A7CFC46AFC253B4652B1AF3795B124AB6E"))
    cases.foreach { case (k, n, a, p, expect) =>
      val got = OpenPgpAead.seal(1, hex(k.toLowerCase), hex(n.toLowerCase),
        hex(a.toLowerCase), hex(p.toLowerCase))
      assert(got.map("%02x".format(_)).mkString === expect.toLowerCase,
        s"EAX seal mismatch for msg=$p")
      val back = OpenPgpAead.open(1, hex(k.toLowerCase), hex(n.toLowerCase),
        hex(a.toLowerCase), hex(expect.toLowerCase))
      assert(back.toSeq === hex(p.toLowerCase).toSeq)
    }
  }

  test("AEAD modes: seal/open inverse, tamper and wrong-aad rejection") {
    val key = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    for (algo <- Seq(1, 2, 3)) {
      val nonce = Array.tabulate[Byte](OpenPgpAead.ivLen(algo))(i => (i + 1).toByte)
      val aad = "context".getBytes
      val pt = ("chunked AEAD payload " * 9).getBytes // partial last block
      val sealedBytes = OpenPgpAead.seal(algo, key, nonce, aad, pt)
      assert(OpenPgpAead.open(algo, key, nonce, aad, sealedBytes).toSeq === pt.toSeq)
      val tampered = sealedBytes.clone(); tampered(3) = (tampered(3) ^ 1).toByte
      intercept[IllegalArgumentException] {
        OpenPgpAead.open(algo, key, nonce, aad, tampered)
      }
      intercept[IllegalArgumentException] {
        OpenPgpAead.open(algo, key, nonce, "other".getBytes, sealedBytes)
      }
    }
  }

  test("SEIPD v2 round-trip in all three AEAD modes, multi-chunk") {
    val rng = new java.security.SecureRandom(Array[Byte](9))
    // chunk octet 0 => 64-byte chunks: a few-KB doc spans many chunks
    val data = ("the quick brown fox " * 200).getBytes
    for (algo <- Seq(1, 2, 3)) {
      val enc = Pgp.encryptAead(data, "hunter2", name = s"a$algo.txt",
        aeadAlgo = algo, chunkSizeOctet = 0, rng = rng)
      val lit = Pgp.decrypt(enc, "hunter2")
      assert(lit.name === s"a$algo.txt")
      assert(lit.data.toSeq === data.toSeq)
    }
  }

  test("SEIPD v2: wrong passphrase, tamper, and TRUNCATION all fail loudly") {
    val rng = new java.security.SecureRandom(Array[Byte](10))
    val data = ("0123456789" * 40).getBytes
    val enc = Pgp.encryptAead(data, "pw", aeadAlgo = 2, chunkSizeOctet = 0, rng = rng)
    val wrong = intercept[IllegalArgumentException](Pgp.decrypt(enc, "not-pw"))
    assert(wrong.getMessage.contains("wrong passphrase"))
    val tampered = enc.clone()
    tampered(enc.length / 2) = (tampered(enc.length / 2) ^ 1).toByte
    intercept[IllegalArgumentException](Pgp.decrypt(tampered, "pw"))
    // chop off the LAST whole chunk + final tag, re-frame the packets:
    // the final tag's length AAD makes truncation detectable even at
    // chunk granularity. Rebuild: drop 80+16 bytes from the SEIPD tail
    // and fix the outer packet length by re-encrypting shorter data —
    // simplest robust truncation probe: strip trailing bytes so the
    // final tag is gone entirely.
    val truncated = java.util.Arrays.copyOfRange(enc, 0, enc.length - 16)
    intercept[Exception](Pgp.decrypt(truncated, "pw"))
  }

  test("SEIPD v2 empty-aad GCM chunk equals the JDK's own GCM (framing sanity)") {
    // the GCM mode IS javax.crypto; this pins our chunk framing by
    // decrypting a hand-built single-chunk v2 body through the JDK
    val key = Array.tabulate[Byte](32)(_.toByte)
    val nonce = Array.tabulate[Byte](12)(i => (i + 3).toByte)
    val pt = "frame-check".getBytes
    val viaUs = OpenPgpAead.seal(3, key, nonce, "info!".getBytes, pt)
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, nonce))
    c.updateAAD("info!".getBytes)
    assert(viaUs.toSeq === c.doFinal(pt).toSeq)
  }

  test("librepgp tag-20 AEAD and Argon2 S2K are rejected by name") {
    // hand-built minimal packets: SKESK v4 (salted SHA-256) + a tag-20 body
    val skesk = Array[Byte](0xc3.toByte, 12, 4, 9, 1, 8) ++ Array.fill[Byte](8)(1)
    val t20 = Array[Byte](0xd4.toByte, 4, 1, 9, 2, 10)
    val e = intercept[IllegalArgumentException](Pgp.decrypt(skesk ++ t20, "pw"))
    assert(e.getMessage.contains("tag 20"))
    // SKESK v6 with S2K type 4 (Argon2)
    val argonSpec = Array[Byte](4) ++ Array.fill[Byte](16)(2) ++ Array[Byte](3, 4, 16)
    val body = Array[Byte](6, (3 + argonSpec.length + 15).toByte, 9, 2,
      argonSpec.length.toByte) ++ argonSpec ++ Array.fill[Byte](15)(0) ++
      Array.fill[Byte](48)(0)
    val skesk6 = Array[Byte](0xc3.toByte, body.length.toByte) ++ body
    val e2 = intercept[IllegalArgumentException](Pgp.decrypt(skesk6, "pw"))
    assert(e2.getMessage.contains("Argon2"))
  }
}
