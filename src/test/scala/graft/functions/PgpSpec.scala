package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RFC 4880 passphrase crypto: pure round-trips, integrity failures,
  * and TRUE interop against the system gpg binary (skipped when gpg is
  * absent — present in CI).
  */
class PgpSpec extends AnyFunSuite {

  private def haveGpg: Boolean =
    try new ProcessBuilder("gpg", "--version").start().waitFor() == 0
    catch { case _: Exception => false }

  private def sh(cmd: String*): Int =
    new ProcessBuilder(cmd: _*).redirectErrorStream(true).start().waitFor()

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
    val home = java.nio.file.Files.createTempDirectory("pgpspec-gnupg")
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
    val home = java.nio.file.Files.createTempDirectory("pgpspec-prot")
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
}
