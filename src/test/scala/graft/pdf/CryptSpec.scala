package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.{CorpusGen, PdfBuilder}
import scala.util.Random

/** Standard security handler (ISO 32000-1 §7.6.3): cipher primitives
  * against public test vectors, then whole-document roundtrips per
  * /V flavor, plus the typed-error contract for non-decryptable files.
  */
class CryptSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
  private val inflater = new java.util.zip.Inflater()

  test("RC4 known vectors (Wikipedia/IETF examples)") {
    def enc(key: String, plain: String): String =
      hex(Crypt.rc4(key.getBytes("US-ASCII"), plain.getBytes("US-ASCII")))
    assert(enc("Key", "Plaintext") == "bbf316e8d940af0ad3")
    assert(enc("Wiki", "pedia") == "1021bf0420")
    assert(enc("Secret", "Attack at dawn") == "45a01f645fc35b383552544b9bf5")
  }

  test("RC4 is an involution; AES-CBC roundtrips with PKCS#7 padding") {
    val rng = new Random(7)
    val key16 = Array.fill(16)(rng.nextInt(256).toByte)
    (0 until 40).foreach { n =>
      val data = Array.fill(n * 7 + 1)(rng.nextInt(256).toByte)
      assert(Crypt.rc4(key16, Crypt.rc4(key16, data)).toSeq == data.toSeq)
      val iv = Array.fill(16)(rng.nextInt(256).toByte)
      val ct = Crypt.aesCbcEncrypt(key16, iv, data)
      assert(ct.length % 16 == 0 && ct.length >= data.length + 16)
      assert(Crypt.aesCbcDecrypt(key16, ct).toSeq == data.toSeq)
    }
  }

  test("empty-password O/U/file-key are mutually consistent (Algorithms 2,3,4,5)") {
    for ((r, n) <- Seq((2, 5), (3, 16), (4, 16))) {
      val id = Array.tabulate(16)(i => (i * 17 + r).toByte)
      val o = Crypt.ownerBytes(r, n)
      assert(o.length == 32)
      val key = Crypt.fileKey(o, -44, id, r, n)
      assert(key.length == n)
      val u = Crypt.userBytes(key, r, id)
      assert(u.length == (if (r == 2) 32 else 16))
      // a decryptor built from the same dict-level fields must accept it
      val dict = PdfObj.PDict(Map(
        "Filter" -> PdfObj.PName("Standard"),
        "V" -> PdfObj.PInt(if (r == 2) 1 else 2),
        "R" -> PdfObj.PInt(r),
        "Length" -> PdfObj.PInt(n * 8L),
        "O" -> PdfObj.PString(o),
        "U" -> PdfObj.PString(if (r == 2) u else u ++ new Array[Byte](16)),
        "P" -> PdfObj.PInt(-44)))
      assert(Crypt.forDocument(dict, identity, id).isRight, s"R=$r rejected")
    }
  }

  test("V4 /EncryptMetadata false derives the FF-salted key (Algorithm 2 step f)") {
    import PdfObj._
    val id = Array.tabulate(16)(i => (i * 31 + 7).toByte)
    val o = Crypt.ownerBytes(4, 16)
    val key = Crypt.fileKey(o, -44, id, 4, 16, encryptMetadata = false)
    val keyDefault = Crypt.fileKey(o, -44, id, 4, 16)
    assert(key.toSeq != keyDefault.toSeq, "FF salt must change the key")
    val u = Crypt.userBytes(key, 4, id) ++ new Array[Byte](16)
    def dict(metaFlag: Boolean) = PDict(Map(
      "Filter" -> PName("Standard"), "V" -> PInt(4), "R" -> PInt(4),
      "Length" -> PInt(128),
      "CF" -> PDict(Map("StdCF" -> PDict(Map("CFM" -> PName("AESV2"))))),
      "StmF" -> PName("StdCF"), "StrF" -> PName("StdCF"),
      "O" -> PString(o), "U" -> PString(u), "P" -> PInt(-44),
      "EncryptMetadata" -> PBool(metaFlag)))
    assert(Crypt.forDocument(dict(false), identity, id).isRight)
    // same U under the DEFAULT (true) flag must read as a wrong password
    assert(Crypt.forDocument(dict(true), identity, id) == Left("encrypted:password"))
  }

  test("V5 R5 (deprecated plain-SHA-256 revision) validates and unwraps") {
    import PdfObj._
    val rng = new Random(31)
    def salt8() = Array.fill(8)(rng.nextInt(256).toByte)
    val none = Array.empty[Byte]
    val (vS, kS) = (salt8(), salt8())
    val fileKey = Array.fill(32)(rng.nextInt(256).toByte)
    val u48 = Crypt.hash2B(5, none, vS, none) ++ vS ++ kS
    val ue = Crypt.aesZeroIv(Crypt.hash2B(5, none, kS, none), fileKey, encrypt = true)
    val dict = PDict(Map(
      "Filter" -> PName("Standard"), "V" -> PInt(5), "R" -> PInt(5),
      "Length" -> PInt(256),
      "CF" -> PDict(Map("StdCF" -> PDict(Map("CFM" -> PName("AESV3"))))),
      "StmF" -> PName("StdCF"), "StrF" -> PName("StdCF"),
      "O" -> PString(new Array[Byte](48)), "U" -> PString(u48),
      "UE" -> PString(ue), "P" -> PInt(-44)))
    val dec = Crypt.forDocument(dict, identity, Array.empty[Byte])
    assert(dec.isRight, dec)
    // roundtrip one payload through the unwrapped file key
    val data = Array.tabulate(100)(_.toByte)
    val iv = Array.fill(16)(rng.nextInt(256).toByte)
    val ct = Crypt.aesCbcEncrypt(fileKey, iv, data)
    assert(dec.toOption.get.decrypt(1, 0, ct).toSeq == data.toSeq)
  }

  /** One-page doc through PdfBuilder with the given axes. */
  private def build(encryptKind: Int, xrefKind: Int, fontKind: Int = 0,
                    filterKind: Int = 1, indirectLength: Boolean = false): PdfBuilder.Built = {
    val spec = PdfBuilder.Spec(xrefKind = xrefKind, filterKind = filterKind,
      showKind = 0, posKind = 0, fontKind = fontKind, nPages = 1,
      formXObject = false, inlineImage = false, markedContent = false,
      junkAfterEof = false, indirectLength = indirectLength,
      encryptKind = encryptKind)
    val paras: Vector[PdfBuilder.PageParas] = Vector(Vector(
      Vector(Vector("Secret", "report", "contents"), Vector("second", "line", "here")),
      Vector(Vector("another", "paragraph", "entirely"))))
    PdfBuilder.build(spec, paras, new Random(99))
  }

  test("encrypted documents extract byte-identically (RC4-40/128, AES-128, AES-256)") {
    for {
      ek <- 1 to 4
      xk <- Seq(0, 1, 2, 3, 4)
    } {
      val b = build(ek, xk)
      val r = PdfExtractor.extract(b.bytes, inflater)
      assert(r.text == b.text, s"encryptKind=$ek xrefKind=$xk mismatch")
    }
  }

  test("encryption composes with fonts needing ToUnicode/Type3 streams and indirect /Length") {
    for ((fk, ek) <- Seq((2, 2), (2, 3), (5, 3), (1, 2))) {
      val b = build(ek, xrefKind = 0, fontKind = fk)
      assert(PdfExtractor.extract(b.bytes, inflater).text == b.text, s"fontKind=$fk ek=$ek")
    }
    val b = build(3, xrefKind = 0, indirectLength = true)
    assert(PdfExtractor.extract(b.bytes, inflater).text == b.text, "indirect /Length")
  }

  test("non-empty user password is a typed error row: encrypted:password") {
    val b = build(2, 0)
    // AES-256: a corrupted /U validation hash must also fail typed
    val b5 = build(4, 0)
    val s5 = new String(b5.bytes, "ISO-8859-1")
    val j = s5.indexOf("/U <") + 4
    val flip5 = s5.substring(0, j) + (if (s5.charAt(j) == '0') "1" else "0") + s5.substring(j + 1)
    val ex5 = intercept[Exception] {
      PdfExtractor.extract(flip5.getBytes("ISO-8859-1"), inflater)
    }
    assert(ex5.getMessage == "encrypted:password", ex5.getMessage)
    // corrupt /U in place: the hex string after "/U <" (empty-password
    // verification must then fail without throwing anything untyped)
    val s = new String(b.bytes, "ISO-8859-1")
    val i = s.indexOf("/U <") + 4
    val flipped = s.substring(0, i) + (if (s.charAt(i) == '0') "1" else "0") + s.substring(i + 1)
    val ex = intercept[Exception] {
      PdfExtractor.extract(flipped.getBytes("ISO-8859-1"), inflater)
    }
    assert(ex.getMessage == "encrypted:password", ex.getMessage)
  }

  test("unsupported handlers/versions are typed: encrypted:unsupported") {
    val b = build(2, 0)
    val s = new String(b.bytes, "ISO-8859-1")
    val v3 = s.replace("/Filter /Standard /V 2 /R 3", "/Filter /Standard /V 3 /R 3")
    val e1 = intercept[Exception] { PdfExtractor.extract(v3.getBytes("ISO-8859-1"), inflater) }
    assert(e1.getMessage == "encrypted:unsupported")
    val alien = s.replace("/Filter /Standard", "/Filter /AcmeSec")
    val e2 = intercept[Exception] { PdfExtractor.extract(alien.getBytes("ISO-8859-1"), inflater) }
    assert(e2.getMessage == "encrypted:unsupported")
  }

  test("corpus axis: encrypted docs appear and carry all three flavors") {
    val kinds = (0 until 600 by 3).map { id =>
      CorpusGen.pdfSpec(id.toLong, CorpusGen.langOf(id.toLong), new Random(42 + id)).encryptKind
    }
    assert(Seq(1, 2, 3, 4).forall(kinds.contains), kinds.distinct.sorted)
    // 25% of PDFs minus the Type0 (zh / fontKind 3,6) gate ≈ 13.5%
    assert(kinds.count(_ > 0) * 8 >= kinds.size, "expected >=12.5% encrypted")
  }
}
