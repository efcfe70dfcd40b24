package graft.pdf

import PdfObj._

/** PDF standard security handler (ISO 32000-1 §7.6.3): RC4 (/V 1–2) and
  * AES-128-CBC (/V 4 /CFM /AESV2), empty-user-password documents only.
  *
  * Real crawls are full of owner-password-only PDFs ("no copy/print"
  * flags) whose USER password is empty — every mainstream extractor
  * recovers their text, so tagging them all `encrypted` loses a large
  * slice of extractable documents (VERDICT r2 "what's missing" #1).
  * Password-protected documents (non-empty user password) remain typed
  * error rows: `encrypted:password`.
  *
  * Both directions live here: the extractor decrypts, the corpus
  * generator ([[graft.gen.PdfBuilder]]) encrypts with the same public
  * algorithms — the golden corpus then gates the decryptor end-to-end
  * (SURVEY.md §5.2 oracle substitution).
  */
object Crypt {

  /** 32-byte padding string (§7.6.3.3 Table 3.19 / Algorithm 2 step a). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 stream cipher (symmetric). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** AES-CBC decrypt: data = 16-byte IV ++ ciphertext; strips the
    * PKCS#7 padding (tolerantly — a bad pad byte returns the block
    * as-is rather than throwing, §7.6.2 note on damaged data).
    */
  def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || data.length % 16 != 0) return Array.empty[Byte]
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(data, 0, 16))
    val plain = c.doFinal(data, 16, data.length - 16)
    val padN = plain(plain.length - 1) & 0xff
    if (padN >= 1 && padN <= 16 && padN <= plain.length)
      java.util.Arrays.copyOfRange(plain, 0, plain.length - padN)
    else plain
  }

  /** AES-CBC encrypt (generator side): PKCS#7 pad, prepend the IV. */
  def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padN = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + padN)
    java.util.Arrays.fill(padded, data.length, padded.length, padN.toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  /** AES-CBC with a ZERO IV and no padding — the /UE//OE file-key
    * wrapping of /V 5 (ISO 32000-2 §7.6.4.4.8): exactly 32 bytes in,
    * 32 out.
    */
  def aesZeroIv(key: Array[Byte], data: Array[Byte], encrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    val mode = if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(data)
  }

  /** /V 5 password hash: plain SHA-256(pw‖salt‖udata) for /R 5, the
    * hardened Algorithm 2.B KDF for /R 6 (ISO 32000-2 §7.6.4.3.4):
    * iterate K1 = (pw‖K‖udata)×64; E = AES-128-CBC(K[0:16], iv K[16:32],
    * K1); K = SHA-{256,384,512}(E) picked by (Σ E[0:16]) mod 3 — the
    * first 16 bytes as a big-endian integer mod 3 equals their byte sum
    * mod 3 since 256 ≡ 1 (mod 3); stop after ≥64 rounds once
    * E.last ≤ rounds−32.
    */
  def hash2B(r: Int, pw: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, pw, salt, udata)
    if (r <= 5) return k
    // one Cipher for all >=64 rounds (getInstance hits the synchronized
    // JCE registry; init per round is cheap)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    var round = 0
    var done = false
    while (!done) {
      val unit = pw ++ k ++ udata
      val k1 = new Array[Byte](unit.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(unit, 0, k1, i * unit.length, unit.length); i += 1 }
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      val e = c.doFinal(k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = sha(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
      round += 1
      // expected stop ≈ round 64–300 (E is cipher output); the hard cap
      // guarantees termination on any input — a worker must never hang
      done = (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) || round >= 4096
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** File encryption key, Algorithm 2, empty user password. `nBytes` =
    * /Length ÷ 8 (5 for /R 2).
    */
  def fileKey(o: Array[Byte], p: Int, firstId: Array[Byte], r: Int,
              nBytes: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >>> 8) & 0xff).toByte,
      ((p >>> 16) & 0xff).toByte, ((p >>> 24) & 0xff).toByte)
    val o32 = java.util.Arrays.copyOf(o, 32)
    val extra =
      if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xff.toByte)
      else Array.empty[Byte]
    var h = md5(Pad, o32, pLe, firstId, extra)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(java.util.Arrays.copyOf(h, nBytes)); i += 1 }
    }
    java.util.Arrays.copyOf(h, nBytes)
  }

  /** /O entry for empty owner AND user passwords, Algorithm 3. */
  def ownerBytes(r: Int, nBytes: Int): Array[Byte] = {
    var h = md5(Pad)
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val rk = java.util.Arrays.copyOf(h, nBytes)
    var e = rc4(rk, Pad)
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        e = rc4(rk.map(b => (b ^ i).toByte), e)
        i += 1
      }
    }
    e
  }

  /** /U comparison bytes for the empty user password: Algorithm 4
    * (/R 2, 32 bytes) or Algorithm 5 (/R ≥ 3, 16 significant bytes).
    */
  def userBytes(key: Array[Byte], r: Int, firstId: Array[Byte]): Array[Byte] = {
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, firstId))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u
    }
  }

  /** Per-object crypto for one document (Algorithm 1): MD5-derived
    * object keys for RC4 / AESV2. Used by the extractor to decrypt and
    * by the generator to encrypt.
    */
  final class StdDecryptor(fileKey: Array[Byte], val aes: Boolean,
                           val direct: Boolean = false) {
    private val aesSalt = Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"

    // JCE getInstance calls hit the synchronized provider registry —
    // per-CALL lookups serialize 16 executor threads on the decrypt hot
    // path (measured as an N→4N scaling drag, r3). A StdDecryptor is
    // per-document and single-threaded, so hold ONE digest and ONE
    // cipher and re-init per use (init is cheap, lookup is not).
    @transient private lazy val mdInst =
      java.security.MessageDigest.getInstance("MD5")
    @transient private lazy val aesInst =
      javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")

    def objKey(num: Int, gen: Int): Array[Byte] = {
      mdInst.reset()
      mdInst.update(fileKey)
      mdInst.update(Array[Byte](
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) mdInst.update(aesSalt)
      val h = mdInst.digest()
      java.util.Arrays.copyOf(h, math.min(fileKey.length + 5, 16))
    }

    private def aesRun(key: Array[Byte], data: Array[Byte], off: Int,
                       iv: Array[Byte], ivOff: Int, enc: Boolean): Array[Byte] = {
      val mode = if (enc) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE
      aesInst.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv, ivOff, 16))
      aesInst.doFinal(data, off, data.length - off)
    }

    private def aesDecryptCached(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      if (data.length < 32 || data.length % 16 != 0) return Array.empty[Byte]
      val plain = aesRun(key, data, 16, data, 0, enc = false)
      val padN = plain(plain.length - 1) & 0xff
      if (padN >= 1 && padN <= 16 && padN <= plain.length)
        java.util.Arrays.copyOfRange(plain, 0, plain.length - padN)
      else plain
    }

    /** RC4 decrypt IN PLACE: every buffer reaching here is a fresh
      * private copy (lexer string bytes / copyOfRange stream raw), and
      * the box is memory-bandwidth-bound at 16 cores — the extra
      * out-array per encrypted stream measurably drags N→4N scaling.
      */
    private def rc4InPlace(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val s = new Array[Int](256)
      var i = 0
      while (i < 256) { s(i) = i; i += 1 }
      var j = 0
      i = 0
      while (i < 256) {
        j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
        val t = s(i); s(i) = s(j); s(j) = t
        i += 1
      }
      var x = 0
      var y = 0
      var k = 0
      while (k < data.length) {
        x = (x + 1) & 0xff
        y = (y + s(x)) & 0xff
        val t = s(x); s(x) = s(y); s(y) = t
        data(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
        k += 1
      }
      data
    }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (data.isEmpty) data
      else if (direct) aesDecryptCached(fileKey, data) // /V 5: file key used as-is
      else if (aes) aesDecryptCached(objKey(num, gen), data)
      else rc4InPlace(objKey(num, gen), data)

    /** Generator-side inverse; `iv` ignored for RC4. */
    def encrypt(num: Int, gen: Int, data: Array[Byte], iv: Array[Byte]): Array[Byte] = {
      def enc(key: Array[Byte]): Array[Byte] = {
        val padN = 16 - (data.length % 16)
        val padded = java.util.Arrays.copyOf(data, data.length + padN)
        java.util.Arrays.fill(padded, data.length, padded.length, padN.toByte)
        iv ++ aesRun(key, padded, 0, iv, 0, enc = true)
      }
      if (direct) enc(fileKey)
      else if (aes) enc(objKey(num, gen))
      else rc4(objKey(num, gen), data)
    }

    /** Decrypt every string and stream body in an indirect object's
      * tree (§7.6.2: strings and streams are the encrypted classes;
      * names/numbers are not). XRef streams are never encrypted
      * (§7.5.8.2); objects INSIDE object streams are skipped by the
      * caller (the ObjStm stream body itself was the encrypted unit).
      */
    /** True iff the tree contains anything the handler encrypts. Most
      * indirect objects (page dicts, fonts, numbers) carry no strings —
      * skipping the rebuild avoids re-allocating every dict/array of
      * every object in an encrypted document.
      */
    private def hasEncryptable(o: PdfObj): Boolean = o match {
      case _: PString | _: PStream => true
      case PArray(items) => items.exists(hasEncryptable)
      case PDict(m) => m.valuesIterator.exists(hasEncryptable)
      case _ => false
    }

    def decryptObj(num: Int, gen: Int, o: PdfObj): PdfObj =
      if (!hasEncryptable(o)) o
      else o match {
        case PString(b) => PString(decrypt(num, gen, b))
        case PArray(items) => PArray(items.map(decryptObj(num, gen, _)))
        case PDict(m) => PDict(m.map { case (k, v) => k -> decryptObj(num, gen, v) })
        case PStream(d, raw) =>
          if (d.get("Type").contains(PName("XRef"))) PStream(d, raw)
          else PStream(decryptObj(num, gen, d).asInstanceOf[PDict], decrypt(num, gen, raw))
        case other => other
      }
  }

  /** Build a decryptor from the /Encrypt dictionary, or a typed error
    * tag: `encrypted:password` (non-empty user password),
    * `encrypted:unsupported` (non-Standard handler / /V 3 / crypt
    * filters other than StdCF-for-everything), or `encrypted`
    * (malformed dict). Supports /V 1, 2, 4 (RC4/AES-128, Algorithms
    * 1–5) and /V 5 (AES-256, /R 5–6).
    */
  def forDocument(enc: PDict, resolve: PdfObj => PdfObj,
                  firstId: Array[Byte]): Either[String, StdDecryptor] = {
    def name(k: String): Option[String] = resolve(enc.get(k).getOrElse(PNull)) match {
      case PName(s) => Some(s)
      case _ => None
    }
    def intAt(k: String): Option[Long] = enc.get(k).map(resolve).flatMap(int)
    def strAt(k: String): Option[Array[Byte]] = resolve(enc.get(k).getOrElse(PNull)) match {
      case PString(b) => Some(b)
      case _ => None
    }
    if (!name("Filter").contains("Standard")) return Left("encrypted:unsupported")
    val v = intAt("V").getOrElse(0L).toInt
    if (v != 1 && v != 2 && v != 4 && v != 5) return Left("encrypted:unsupported")
    val o = strAt("O").getOrElse(return Left("encrypted"))
    val u = strAt("U").getOrElse(return Left("encrypted"))
    if (v == 5) {
      // AES-256 (ISO 32000-2 §7.6.4): /R 5 (deprecated) or /R 6.
      // U = hash(32) ‖ validationSalt(8) ‖ keySalt(8); empty-user-
      // password check is pure hashing, then /UE unwraps the file key.
      val r5 = intAt("R").getOrElse(6L).toInt
      if (r5 != 5 && r5 != 6) return Left("encrypted:unsupported")
      val stmF = name("StmF").getOrElse("Identity")
      val strF = name("StrF").getOrElse("Identity")
      if (stmF != "StdCF" || strF != "StdCF") return Left("encrypted:unsupported")
      val cfm5 = resolve(enc.get("CF").getOrElse(PNull)) match {
        case d: PDict => resolve(d.get("StdCF").getOrElse(PNull)) match {
          case sd: PDict => resolve(sd.get("CFM").getOrElse(PNull))
          case _ => PNull
        }
        case _ => PNull
      }
      if (cfm5 != PName("AESV3")) return Left("encrypted:unsupported")
      val ue = strAt("UE").getOrElse(return Left("encrypted"))
      if (u.length < 48 || ue.length < 32) return Left("encrypted")
      val expect = java.util.Arrays.copyOf(u, 32)
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
      val none = Array.empty[Byte]
      if (!java.util.Arrays.equals(hash2B(r5, none, vSalt, none), expect))
        return Left("encrypted:password")
      val inter = hash2B(r5, none, kSalt, none)
      val fileKey = aesZeroIv(inter, java.util.Arrays.copyOf(ue, 32), encrypt = false)
      return Right(new StdDecryptor(fileKey, aes = true, direct = true))
    }
    val r = intAt("R").getOrElse(if (v == 4) 4L else if (v == 2) 3L else 2L).toInt
    if (r < 2 || r > 4) return Left("encrypted:unsupported")
    val p = intAt("P").getOrElse(return Left("encrypted")).toInt
    val encMeta = resolve(enc.get("EncryptMetadata").getOrElse(PNull)) match {
      case PBool(b) => b
      case _ => true
    }
    var aes = false
    var nBytes = math.max(5, intAt("Length").getOrElse(40L).toInt / 8)
    if (v == 1) nBytes = 5
    if (v == 4) {
      // /CF crypt filters: support exactly "everything through /StdCF"
      val stmF = name("StmF").getOrElse("Identity")
      val strF = name("StrF").getOrElse("Identity")
      if (stmF != "StdCF" || strF != "StdCF") return Left("encrypted:unsupported")
      val cf = resolve(enc.get("CF").getOrElse(PNull)) match {
        case d: PDict => resolve(d.get("StdCF").getOrElse(PNull)) match {
          case sd: PDict => sd
          case _ => Empty
        }
        case _ => Empty
      }
      resolve(cf.get("CFM").getOrElse(PNull)) match {
        case PName("AESV2") => aes = true
        case PName("V2") => aes = false
        case _ => return Left("encrypted:unsupported")
      }
      // CF /Length is in BYTES (vs bits at the top level); tolerate both
      cf.get("Length").map(resolve).flatMap(int).foreach { l =>
        nBytes = if (l <= 40) l.toInt else l.toInt / 8
      }
      if (aes) nBytes = 16
    }
    val key = fileKey(o, p, firstId, r, nBytes, encMeta)
    val expectU = userBytes(key, r, firstId)
    val ok =
      if (r == 2) java.util.Arrays.equals(java.util.Arrays.copyOf(u, 32), expectU)
      else u.length >= 16 && java.util.Arrays.equals(
        java.util.Arrays.copyOf(u, 16), java.util.Arrays.copyOf(expectU, 16))
    if (!ok) Left("encrypted:password")
    else Right(new StdDecryptor(key, aes))
  }
}
