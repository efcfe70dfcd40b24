package graft.pdf

/** Built-in encoding of an embedded Type1 font program (SURVEY §2.4
  * FN2 r4 addendum; Adobe Type 1 Font Format §2.2–2.3).
  *
  * A symbolic Type1 font without a /Encoding entry uses the encoding
  * baked into its /FontFile — which lives in the CLEARTEXT portion of
  * the program as PostScript `dup <code> /<name> put` entries (the
  * eexec-encrypted portion holds only charstrings, not the encoding).
  * Math/symbol subset fonts are the common real-crawl case. Parsing is
  * a bounded scan of the cleartext prefix; PFB segment headers are
  * skipped; `/Encoding StandardEncoding def` yields empty (caller's
  * default already matches).
  */
object Type1Enc {

  /** code → glyph name from the cleartext /Encoding. Empty on any
    * malformed input (caller falls back to its encoding chain).
    */
  def parse(data: Array[Byte]): Map[Int, String] = {
    try {
      if (data.length < 2) return Map.empty
      // PFB: 0x80 0x01 <len32le> prefixes each ASCII segment
      val start =
        if ((data(0) & 0xff) == 0x80) 6 else 0
      // the encoding sits before eexec; bound the scan defensively
      val limit = math.min(data.length, start + 65536)
      val s = new String(data, start, limit - start, "ISO-8859-1")
      val eexec = s.indexOf("eexec")
      val clear = if (eexec >= 0) s.substring(0, eexec) else s
      val encAt = clear.indexOf("/Encoding")
      if (encAt < 0) return Map.empty
      val tail = clear.substring(encAt)
      val m = Map.newBuilder[Int, String]
      val pat = java.util.regex.Pattern.compile("""dup\s+(\d+)\s*/([^\s/{}()<>\[\]]+)\s+put""")
      val mt = pat.matcher(tail)
      while (mt.find()) {
        val code = mt.group(1).toInt
        if (code >= 0 && code < 256) m += code -> mt.group(2)
      }
      m.result()
    } catch { case _: Exception => Map.empty }
  }
}
