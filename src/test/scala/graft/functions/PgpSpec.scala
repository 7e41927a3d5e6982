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

  test("s2k iterated-salted matches itself across key sizes and hash widths") {
    // keyLen > hash width forces the preloaded-zeros multi-context path
    val salt = Array.tabulate[Byte](8)(_.toByte)
    val k1 = Pgp.s2k("pw".getBytes, salt, 65536, hashAlgo = 2, keyLen = 32) // SHA-1: 2 contexts
    val k2 = Pgp.s2k("pw".getBytes, salt, 65536, hashAlgo = 2, keyLen = 32)
    assert(k1.toSeq === k2.toSeq && k1.length === 32)
    assert(Pgp.s2k("pw".getBytes, salt, 65536, hashAlgo = 8, keyLen = 16).length === 16)
  }
}
