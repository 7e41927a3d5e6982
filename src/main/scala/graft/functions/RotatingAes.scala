package graft.functions

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-rotating AES field encryption over a credential store, wire-
  * compatible with the reference's rotating codec
  * (gobblin-modules/gobblin-crypto/.../RotatingAESCodec.java:243 —
  * header `%04d keyId` + `%03d ivLen` + base64(iv), then base64 of the
  * AES/CBC/PKCS5 ciphertext; JsonCredentialStore.java:52 — a JSON
  * object of numeric keyId -> encoded 16-byte key).
  *
  * Spark-first: everything is builtin column expressions (aes_encrypt/
  * aes_decrypt in CBC mode emit/consume iv||ct, which we split/rejoin
  * around the header), so encryption stays inside whole-stage codegen —
  * no per-record stream wrapping. Key SELECTION is deterministic per
  * row (FNV of a salt + record id, mod the key count) instead of the
  * reference's `random.nextInt`: same rotation property, but task
  * retries re-encrypt a row under the same key, keeping output
  * idempotent — the same reasoning as the deterministic skew salts.
  * Decryption reads the keyId from the header, so it interoperates
  * with streams the reference wrote regardless of how keys were picked.
  */
object RotatingAes {

  /** keyId -> raw AES key bytes (16 bytes each, numeric string ids —
    * the same constraints RotatingAESCodec enforces when caching keys).
    */
  final case class CredentialStore(keys: Map[Int, Array[Byte]]) {
    require(keys.nonEmpty, "credential store has no usable keys")
    keys.foreach { case (id, k) =>
      require(id >= 0 && id <= 9999, s"keyId $id not encodable as %04d")
      require(k.length == 16, s"keyId $id: AES key must be 16 bytes, got ${k.length}")
    }
    /** Ascending ids — position in this array is the rotation index. */
    val ids: Array[Int] = keys.keys.toArray.sorted
  }

  object CredentialStore {
    /** JSON object of keyId -> hex-encoded key, the reference's
      * JsonCredentialStore layout with its hex KeyToStringCodec.
      */
    def fromJsonFile(path: String): CredentialStore = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tree = mapper.readTree(Files.readAllBytes(Paths.get(path)))
      require(tree.isObject, s"credential store $path is not a JSON object")
      val keys = tree.properties().asScala.map { e =>
        e.getKey.toInt -> hexDecode(e.getValue.asText())
      }.toMap
      CredentialStore(keys)
    }

    private def hexDecode(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  /** Map-literal of keyId -> key bytes (binary literals — never a
    * string roundtrip, which would UTF-8-mangle bytes >= 0x80), usable
    * inside expressions (keys are tiny; broadcast-by-literal).
    */
  private def keyMap(store: CredentialStore): Column =
    map(store.keys.toSeq.sortBy(_._1).flatMap { case (id, k) =>
      Seq(lit(id), lit(k))
    }: _*)

  private def keyFor(store: CredentialStore, keyId: Column): Column =
    element_at(keyMap(store), keyId)

  /** Deterministic per-row key choice: FNV-1a of "aesrot|id" mod the
    * key count, mapped onto the store's ascending key ids.
    */
  def pickKeyId(store: CredentialStore, rowId: Column): Column = {
    val idx = pmod(Fnv64(concat_ws("|", lit("aesrot"), rowId)), lit(store.ids.length))
    val arr = array(store.ids.toIndexedSeq.map(lit(_)): _*)
    element_at(arr, (idx + 1).cast("int"))
  }

  /** Encrypt to the reference wire format. `keyId` must evaluate to an
    * id present in the store (use [[pickKeyId]] for rotation).
    *
    * The CBC IV is DERIVED (md5 of keyId + plaintext), not drawn from
    * SecureRandom like the reference: a random-IV aes_encrypt is a
    * non-deterministic expression whose value can be computed more than
    * once per row under projection collapse (the header's IV and the
    * body's IV would disagree), and re-encryption under task retry
    * would produce different bytes. Derivation makes the whole frame a
    * pure function of (plain, keyId): retry-idempotent, CSE-safe, and
    * still a unique IV per distinct plaintext. Trade-off vs the
    * reference: equal (plaintext, key) pairs produce equal ciphertext —
    * deterministic encryption, the SIV-style property; acceptable for
    * pipeline field protection, and decrypt interoperates with
    * random-IV streams either way.
    */
  def encrypt(plain: Column, keyId: Column, store: CredentialStore): Column = {
    val iv = unhex(md5(concat(
      lit("aesiv|").cast("binary"),
      keyId.cast("string").cast("binary"),
      lit("|").cast("binary"),
      plain.cast("binary"))))
    // builtin CBC emits iv(16) || ciphertext; re-frame as header + body
    val raw = aes_encrypt(plain.cast("binary"), keyFor(store, keyId), lit("CBC"), lit("PKCS"), iv)
    val b64Iv = base64(expr_substr(raw, lit(1), lit(16)))
    val body = base64(expr_substr(raw, lit(17), length(raw)))
    concat(
      lpad(keyId.cast("string"), 4, "0"),
      lpad(length(b64Iv).cast("string"), 3, "0"),
      b64Iv, body)
  }

  /** The keyId a rotating-format value was encrypted under. */
  def keyId(encoded: Column): Column =
    substring(encoded, 1, 4).cast("int")

  /** Decrypt the reference wire format (any key in the store). Returns
    * binary plaintext; cast to string for text fields.
    */
  def decrypt(encoded: Column, store: CredentialStore): Column = {
    val ivLen = substring(encoded, 5, 3).cast("int")
    val iv = unbase64(expr_substr(encoded, lit(8), ivLen))
    val ct = unbase64(expr_substr(encoded, lit(8) + ivLen, length(encoded)))
    aes_decrypt(concat(iv, ct), keyFor(store, keyId(encoded)), lit("CBC"), lit("PKCS"))
  }

  // substring with non-literal pos/len (functions.substring only takes
  // Ints; substr(Column,Column,Column) is the dynamic form)
  private def expr_substr(c: Column, pos: Column, len: Column): Column =
    substr(c, pos, len)
}
