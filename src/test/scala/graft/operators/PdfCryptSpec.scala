package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PdfCrypt: the standard security handler against fixtures produced
  * by an INDEPENDENT python implementation of the same spec
  * (tools/pdf_encrypt.py) — R3 RC4-128, R4 AESV2, R6 AES-256 all open
  * with the empty user password and extract exact text; a genuinely
  * password-protected file is rejected by name. RC4 itself is pinned
  * to published test vectors.
  */
class PdfCryptSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/pdf_enc/fixture_$name.pdf")
    require(in != null, s"missing encrypted-pdf fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def line(k: Int, i: Int): String =
    s"enc$k line$i w${(k * 7 + i * 3) % 50}"

  private def expected(k: Int): String =
    (0 until (8 + k)).map(i => line(k, i)).mkString("\n")

  test("RC4 matches published test vectors") {
    // classic vectors (appear in RFC 6229-era literature)
    def hex(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes).map("%02x".format(_)).mkString ==
      "bbf316e8d940af0ad3")
    assert(PdfCrypt.rc4("Wiki".getBytes, "pedia".getBytes).map("%02x".format(_)).mkString ==
      "1021bf0420")
    assert(PdfCrypt.rc4("Secret".getBytes, "Attack at dawn".getBytes).map("%02x".format(_)).mkString ==
      "45a01f645fc35b383552544b9bf5")
    assert(new String(PdfCrypt.rc4("Key".getBytes, hex("bbf316e8d940af0ad3"))) == "Plaintext")
  }

  test("R3 RC4-128 opens with the empty password; exact text") {
    val t = PdfText.extract(1L, fixture("r3"))
    assert(t.nPages == 1)
    assert(t.text == expected(0))
  }

  test("R4 AESV2 opens with the empty password; exact text") {
    val t = PdfText.extract(2L, fixture("r4aes"))
    assert(t.text == expected(1))
  }

  test("R6 AES-256 opens with the empty password; exact text") {
    val t = PdfText.extract(3L, fixture("r6"))
    assert(t.text == expected(2))
  }

  test("password-protected documents are rejected by name") {
    val e = intercept[Exception](PdfText.extract(4L, fixture("locked")))
    assert(e.getMessage.contains("media 4") &&
      e.getMessage.toLowerCase.contains("password"))
  }

  test("encrypted PDFs route through the shared modality probe") {
    assert(Multimodal.sniffModality(fixture("r3")) == "application/pdf")
  }
}
