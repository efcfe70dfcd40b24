package graft.pdf

/** Encoding + glyph-name tables (SURVEY.md §2.4 FN5/FN7; ISO 32000-1
  * Annex D; Adobe Glyph List — public Adobe data).
  *
  * These are the immutable lookup tables shipped to executors once via
  * `sparkContext.broadcast` (J1 in SURVEY.md §2.1).
  */
object Glyphs {

  /** Adobe Glyph List subset: glyph name → Unicode string.
    * Covers Standard/WinAnsi/MacRoman names + Greek + common extras.
    */
  val agl: Map[String, String] = {
    // "name hex[,hex]" space-separated records, compact literal table.
    val tbl =
      """space 20|exclam 21|quotedbl 22|numbersign 23|dollar 24|percent 25|ampersand 26|quotesingle 27|parenleft 28|parenright 29|asterisk 2A|plus 2B|comma 2C|hyphen 2D|period 2E|slash 2F|zero 30|one 31|two 32|three 33|four 34|five 35|six 36|seven 37|eight 38|nine 39|colon 3A|semicolon 3B|less 3C|equal 3D|greater 3E|question 3F|at 40|bracketleft 5B|backslash 5C|bracketright 5D|asciicircum 5E|underscore 5F|grave 60|braceleft 7B|bar 7C|braceright 7D|asciitilde 7E|
        |exclamdown A1|cent A2|sterling A3|currency A4|yen A5|brokenbar A6|section A7|dieresis A8|copyright A9|ordfeminine AA|guillemotleft AB|logicalnot AC|registered AE|macron AF|degree B0|plusminus B1|twosuperior B2|threesuperior B3|acute B4|mu B5|paragraph B6|periodcentered B7|cedilla B8|onesuperior B9|ordmasculine BA|guillemotright BB|onequarter BC|onehalf BD|threequarters BE|questiondown BF|
        |Agrave C0|Aacute C1|Acircumflex C2|Atilde C3|Adieresis C4|Aring C5|AE C6|Ccedilla C7|Egrave C8|Eacute C9|Ecircumflex CA|Edieresis CB|Igrave CC|Iacute CD|Icircumflex CE|Idieresis CF|Eth D0|Ntilde D1|Ograve D2|Oacute D3|Ocircumflex D4|Otilde D5|Odieresis D6|multiply D7|Oslash D8|Ugrave D9|Uacute DA|Ucircumflex DB|Udieresis DC|Yacute DD|Thorn DE|germandbls DF|
        |agrave E0|aacute E1|acircumflex E2|atilde E3|adieresis E4|aring E5|ae E6|ccedilla E7|egrave E8|eacute E9|ecircumflex EA|edieresis EB|igrave EC|iacute ED|icircumflex EE|idieresis EF|eth F0|ntilde F1|ograve F2|oacute F3|ocircumflex F4|otilde F5|odieresis F6|divide F7|oslash F8|ugrave F9|uacute FA|ucircumflex FB|udieresis FC|yacute FD|thorn FE|ydieresis FF|
        |quoteleft 2018|quoteright 2019|quotedblleft 201C|quotedblright 201D|quotesinglbase 201A|quotedblbase 201E|dagger 2020|daggerdbl 2021|bullet 2022|ellipsis 2026|perthousand 2030|guilsinglleft 2039|guilsinglright 203A|fraction 2044|emdash 2014|endash 2013|trademark 2122|florin 192|circumflex 2C6|caron 2C7|breve 2D8|dotaccent 2D9|ring 2DA|ogonek 2DB|tilde 2DC|hungarumlaut 2DD|OE 152|oe 153|Scaron 160|scaron 161|Zcaron 17D|zcaron 17E|Ydieresis 178|Euro 20AC|minus 2212|fi FB01|fl FB02|dotlessi 131|Lslash 141|lslash 142|nbspace A0|sfthyphen AD|middot B7|
        |Alpha 391|Beta 392|Gamma 393|Delta 394|Epsilon 395|Zeta 396|Eta 397|Theta 398|Iota 399|Kappa 39A|Lambda 39B|Mu 39C|Nu 39D|Xi 39E|Omicron 39F|Pi 3A0|Rho 3A1|Sigma 3A3|Tau 3A4|Upsilon 3A5|Phi 3A6|Chi 3A7|Psi 3A8|Omega 3A9|
        |alpha 3B1|beta 3B2|gamma 3B3|delta 3B4|epsilon 3B5|zeta 3B6|eta 3B7|theta 3B8|iota 3B9|kappa 3BA|lambda 3BB|nu 3BD|xi 3BE|omicron 3BF|pi 3C0|rho 3C1|sigma1 3C2|sigma 3C3|tau 3C4|upsilon 3C5|phi 3C6|chi 3C7|psi 3C8|omega 3C9|
        |notequal 2260|infinity 221E|lessequal 2264|greaterequal 2265|partialdiff 2202|summation 2211|product 220F|integral 222B|radical 221A|approxequal 2248|increment 2206|lozenge 25CA|apple F8FF|
        |""".stripMargin
    val b = Map.newBuilder[String, String]
    tbl.split('|').foreach { rec =>
      val r = rec.trim
      if (r.nonEmpty) {
        val sp = r.indexOf(' ')
        val name = r.substring(0, sp)
        val cps = r.substring(sp + 1).split(',').map(h => Integer.parseInt(h.trim, 16))
        b += name -> new String(cps, 0, cps.length)
      }
    }
    // single letters and digits map to themselves
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    b.result()
  }

  /** Glyph name → Unicode (AGL rules): table, then uniXXXX[XXXX] and
    * uXXXX..XXXXXX forms, then suffix-stripped retry (e.g. a.sc).
    */
  def glyphToUnicode(name: String): Option[String] = {
    agl.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7) {
        val hex = name.substring(3)
        if (hex.length % 4 == 0 && hex.forall(isHex)) {
          val units = hex.grouped(4).map(h => Integer.parseInt(h, 16).toChar).toArray
          Some(new String(units))
        } else None
      } else if (name.startsWith("u") && name.length >= 5 && name.length <= 7 &&
        name.substring(1).forall(isHex)) {
        Some(new String(Character.toChars(Integer.parseInt(name.substring(1), 16))))
      } else {
        val dot = name.indexOf('.')
        if (dot > 0) glyphToUnicode(name.substring(0, dot)) else None
      }
    }
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  // --- Encoding tables: code (0-255) → Unicode codepoint, -1 = undef ---

  private def asciiBase(): Array[Int] = {
    val a = Array.fill(256)(-1)
    var i = 32
    while (i < 127) { a(i) = i; i += 1 }
    a
  }

  /** WinAnsiEncoding (Annex D.2): ASCII + cp1252. */
  val winAnsi: Array[Int] = {
    val a = asciiBase()
    var i = 0xA0
    while (i <= 0xFF) { a(i) = i; i += 1 } // Latin-1 high range
    val c1 = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    c1.foreach { case (k, v) => a(k) = v }
    a
  }

  /** MacRomanEncoding (Annex D.2). */
  val macRoman: Array[Int] = {
    val a = asciiBase()
    val high =
      "00C4 00C5 00C7 00C9 00D1 00D6 00DC 00E1 00E0 00E2 00E4 00E3 00E5 00E7 00E9 00E8 " +
        "00EA 00EB 00ED 00EC 00EE 00EF 00F1 00F3 00F2 00F4 00F6 00F5 00FA 00F9 00FB 00FC " +
        "2020 00B0 00A2 00A3 00A7 2022 00B6 00DF 00AE 00A9 2122 00B4 00A8 2260 00C6 00D8 " +
        "221E 00B1 2264 2265 00A5 00B5 2202 2211 220F 03C0 222B 00AA 00BA 03A9 00E6 00F8 " +
        "00BF 00A1 00AC 221A 0192 2248 2206 00AB 00BB 2026 00A0 00C0 00C3 00D5 0152 0153 " +
        "2013 2014 201C 201D 2018 2019 00F7 25CA 00FF 0178 2044 00A4 2039 203A FB01 FB02 " +
        "2021 00B7 201A 201E 2030 00C2 00CA 00C1 00CB 00C8 00CD 00CE 00CF 00CC 00D3 00D4 " +
        "F8FF 00D2 00DA 00DB 00D9 0131 02C6 02DC 00AF 02D8 02D9 02DA 00B8 02DD 02DB 02C7"
    high.split("\\s+").zipWithIndex.foreach { case (h, i) =>
      a(0x80 + i) = Integer.parseInt(h, 16)
    }
    a
  }

  /** Adobe StandardEncoding (Annex D.2). */
  val standard: Array[Int] = {
    val a = asciiBase()
    a(0x27) = 0x2019 // quoteright
    a(0x60) = 0x2018 // quoteleft
    val high = Map(
      0xA1 -> 0x00A1, 0xA2 -> 0x00A2, 0xA3 -> 0x00A3, 0xA4 -> 0x2044,
      0xA5 -> 0x00A5, 0xA6 -> 0x0192, 0xA7 -> 0x00A7, 0xA8 -> 0x00A4,
      0xA9 -> 0x0027, 0xAA -> 0x201C, 0xAB -> 0x00AB, 0xAC -> 0x2039,
      0xAD -> 0x203A, 0xAE -> 0xFB01, 0xAF -> 0xFB02,
      0xB1 -> 0x2013, 0xB2 -> 0x2020, 0xB3 -> 0x2021, 0xB4 -> 0x00B7,
      0xB6 -> 0x00B6, 0xB7 -> 0x2022, 0xB8 -> 0x201A, 0xB9 -> 0x201E,
      0xBA -> 0x201D, 0xBB -> 0x00BB, 0xBC -> 0x2026, 0xBD -> 0x2030,
      0xBF -> 0x00BF,
      0xC1 -> 0x0060, 0xC2 -> 0x00B4, 0xC3 -> 0x02C6, 0xC4 -> 0x02DC,
      0xC5 -> 0x00AF, 0xC6 -> 0x02D8, 0xC7 -> 0x02D9, 0xC8 -> 0x00A8,
      0xCA -> 0x02DA, 0xCB -> 0x00B8, 0xCD -> 0x02DD, 0xCE -> 0x02DB,
      0xCF -> 0x02C7, 0xD0 -> 0x2014,
      0xE1 -> 0x00C6, 0xE3 -> 0x00AA, 0xE8 -> 0x0141, 0xE9 -> 0x00D8,
      0xEA -> 0x0152, 0xEB -> 0x00BA, 0xF1 -> 0x00E6, 0xF5 -> 0x0131,
      0xF8 -> 0x0142, 0xF9 -> 0x00F8, 0xFA -> 0x0153, 0xFB -> 0x00DF)
    high.foreach { case (k, v) => a(k) = v }
    a
  }

  /** Glyph names by code for WinAnsi — needed to seed /Differences-based
    * fonts whose base is WinAnsi (names are looked up, then overridden).
    * Derived by inverting `agl` over the winAnsi codepoints.
    */
  lazy val winAnsiNames: Array[String] = {
    val inv: Map[Int, String] = agl.toSeq
      .filter(_._2.length == 1)
      .groupBy(_._2.charAt(0).toInt)
      .map { case (cp, seq) => cp -> seq.map(_._1).minBy(_.length) }
    winAnsi.map(cp => if (cp < 0) null else inv.getOrElse(cp, null))
  }

  /** Average fallback width for codes not covered by AFM data (exotic
    * glyphs in a base-14 font, or non-base-14 fonts without /Widths).
    * Only feeds the same-line positional-gap heuristic (SURVEY.md
    * App. A), never glyph output.
    */
  def defaultWidth(baseFont: String): Int =
    if (baseFont == null) 500
    else if (baseFont.contains("Courier")) 600
    else if (baseFont.toLowerCase.contains("dingbat")) 740 // unmapped-code fallback (a95+ ornament variants)
    else 500

  // --- Symbol / ZapfDingbats built-in encodings (FN7 completion) ------
  // Symbolic base-14 fonts carry their OWN encoding (§9.6.6.4): without
  // these tables a Symbol-font span decodes through StandardEncoding
  // into wrong Latin letters. Mappings are public Adobe data (Symbol
  // encoding / AGL zapfdingbats list); only glyphs with certain
  // mappings are included — the rest stay -1 (unmapped).

  /** Symbol code → Unicode: Greek core, digits, ASCII-coincident
    * punctuation; math operators where unambiguous.
    */
  lazy val symbol: Array[Int] = {
    val a = Array.fill(256)(-1)
    a(0x20) = ' '
    "!#%&()+,./:;<=>?[]{}|_".foreach(c => a(c.toInt) = c.toInt)
    (0x30 to 0x39).foreach(c => a(c) = c) // digits
    a(0x2D) = 0x2212 // minus sign
    a(0x2A) = 0x2217 // asterisk operator
    // uppercase Greek at A..Z (Symbol layout: C=Chi, F=Phi, H=Eta,
    // J=theta1, Q=Theta, U=Upsilon, V=sigma1, W=Omega, X=Xi, Y=Psi)
    val upper = "ΑΒΧΔΕΦΓΗΙϑΚΛΜΝΟΠΘΡΣΤΥςΩΞΨΖ"
    upper.zipWithIndex.foreach { case (g, i) => a('A' + i) = g.toInt }
    // lowercase Greek at a..z (j=phi1, q=theta, v=omega1/pi-symbol)
    val lower = "αβχδεφγηιϕκλμνοπθρστυϖωξψζ"
    lower.zipWithIndex.foreach { case (g, i) => a('a' + i) = g.toInt }
    a
  }

  /** ZapfDingbats code → Unicode: the AGL zapf mapping's linear low
    * range (0x21..0x7E → U+2701..U+275E) plus space; high range left
    * unmapped (ornament variants).
    */
  lazy val dingbats: Array[Int] = {
    val a = Array.fill(256)(-1)
    a(0x20) = ' '
    (0x21 to 0x7E).foreach(c => a(c) = 0x2701 + (c - 0x21))
    a
  }

  /** Symbol AFM widths BY CODE (0x20..0x7E; Adobe Symbol AFM). Feeds
    * only the positional-gap heuristic, like every other AFM table.
    */
  lazy val symbolCodeWidths: Map[Int, Int] = {
    val m = Map.newBuilder[Int, Int]
    m += 0x20 -> 250
    Seq('!' -> 333, '#' -> 500, '%' -> 833, '&' -> 778, '(' -> 333,
      ')' -> 333, '*' -> 500, '+' -> 549, ',' -> 250, '.' -> 250,
      '/' -> 278, ':' -> 278, ';' -> 278, '<' -> 549, '=' -> 549,
      '>' -> 549, '?' -> 444, '[' -> 333, ']' -> 333, '_' -> 500,
      '{' -> 480, '}' -> 480, '|' -> 200, '-' -> 549).foreach {
      case (c, w) => m += c.toInt -> w
    }
    (0x30 to 0x39).foreach(c => m += c -> 500)
    val upperW = Seq(722, 667, 722, 612, 611, 763, 603, 722, 333, 631,
      722, 686, 889, 722, 722, 768, 741, 556, 592, 611, 690, 439, 768,
      645, 795, 611)
    upperW.zipWithIndex.foreach { case (w, i) => m += ('A' + i) -> w }
    val lowerW = Seq(631, 549, 549, 494, 439, 521, 411, 603, 329, 603,
      549, 549, 576, 521, 549, 549, 521, 549, 603, 439, 576, 713, 686,
      493, 686, 494)
    lowerW.zipWithIndex.foreach { case (w, i) => m += ('a' + i) -> w }
    m.result()
  }

  /** ZapfDingbats AFM widths BY CODE (space + a1..a94 at 0x21..0x7E;
    * Adobe ZapfDingbats AFM — public Core-14 metrics data). Completes
    * FN6 (VERDICT r3 "next" #8): the class-typical 740 now covers only
    * codes outside this range. Feeds only the positional-gap heuristic.
    */
  lazy val dingbatsCodeWidths: Map[Int, Int] = {
    val m = Map.newBuilder[Int, Int]
    m += 0x20 -> 278
    val w = Seq(
      974, 961, 974, 980, 719, 789, 790, 791, 690, 960, // a1..a10
      939, 549, 855, 911, 933, 911, 945, 974, 755, 846, // a11..a20
      762, 761, 571, 677, 763, 760, 759, 754, 494, 552, // a21..a30
      537, 577, 692, 786, 788, 788, 790, 793, 794, 816, // a31..a40
      823, 789, 841, 823, 833, 816, 831, 923, 744, 723, // a41..a50
      749, 790, 792, 695, 776, 768, 792, 759, 707, 708, // a51..a60
      682, 701, 826, 815, 789, 789, 707, 687, 696, 689, // a61..a70
      786, 787, 713, 791, 785, 791, 873, 761, 762, 762, // a71..a80
      759, 759, 892, 892, 789, 789, 438, 138, 277, 415, // a81..a90
      392, 392, 668, 668) // a91..a94
    w.zipWithIndex.foreach { case (x, i) => m += (0x21 + i) -> x }
    m.result()
  }

  // --- Standard-14 AFM widths (FN6) -----------------------------------
  // Adobe Core-14 AFM metrics (public Adobe data), ASCII range
  // 0x20..0x7E as 95-entry arrays; oblique/italic variants of Helvetica
  // share the upright metrics, Courier is fixed-pitch 600. Accented
  // Latin glyphs in these fonts share the base letter's width, so
  // afmWidth falls back to the NFD-stripped base character.

  private def ws(s: String): Array[Int] = s.trim.split("\\s+").map(_.toInt)

  private val afmHelvetica: Array[Int] = ws("""
    278 278 355 556 556 889 667 191 333 333 389 584 278 333 278 278
    556 556 556 556 556 556 556 556 556 556 278 278 584 584 584 556
    1015 667 667 722 722 667 611 778 722 278 500 667 556 833 722 778
    667 778 722 667 611 722 667 944 667 667 611 278 278 278 469 556
    333 556 556 500 556 556 278 556 556 222 222 500 222 833 556 556
    556 556 333 500 278 556 500 722 500 500 500 334 260 334 584""")

  private val afmHelveticaBold: Array[Int] = ws("""
    278 333 474 556 556 889 722 238 333 333 389 584 278 333 278 278
    556 556 556 556 556 556 556 556 556 556 333 333 584 584 584 611
    975 722 722 722 722 667 611 778 722 278 556 722 611 833 722 778
    667 778 722 667 611 722 667 944 667 667 611 333 278 333 584 556
    333 556 611 556 611 556 333 611 611 278 278 556 278 889 611 611
    611 611 389 556 333 611 556 778 556 556 500 389 280 389 584""")

  private val afmTimes: Array[Int] = ws("""
    250 333 408 500 500 833 778 180 333 333 500 564 250 333 250 278
    500 500 500 500 500 500 500 500 500 500 278 278 564 564 564 444
    921 722 667 667 722 611 556 722 722 333 389 722 611 889 722 722
    556 722 667 556 611 722 722 944 722 722 611 333 278 333 469 500
    333 444 500 444 500 444 333 500 500 278 278 500 278 778 500 500
    500 500 333 389 278 500 500 722 500 500 444 480 200 480 541""")

  private val afmTimesBold: Array[Int] = ws("""
    250 333 555 500 500 1000 833 278 333 333 500 570 250 333 250 278
    500 500 500 500 500 500 500 500 500 500 333 333 570 570 570 500
    930 722 667 722 722 667 611 778 778 389 500 778 667 944 722 778
    611 778 722 556 667 722 722 1000 722 722 667 333 278 333 581 500
    333 500 556 444 556 444 333 500 556 278 333 556 278 833 556 500
    556 556 444 389 333 556 500 722 500 500 444 394 220 394 520""")

  private val afmTimesItalic: Array[Int] = ws("""
    250 333 420 500 500 833 778 214 333 333 500 675 250 333 250 278
    500 500 500 500 500 500 500 500 500 500 333 333 675 675 675 500
    920 611 611 667 722 611 611 722 722 333 444 667 556 833 667 722
    611 722 611 500 556 722 611 833 611 556 556 389 278 389 422 500
    333 500 500 444 500 444 278 500 500 278 278 444 278 722 500 500
    500 500 389 389 278 500 444 667 444 444 389 400 275 400 541""")

  private val afmTimesBoldItalic: Array[Int] = ws("""
    250 389 555 500 500 833 778 278 333 333 500 570 250 333 250 278
    500 500 500 500 500 500 500 500 500 500 333 333 570 570 570 500
    832 667 667 667 722 667 667 722 778 389 500 667 611 889 722 722
    611 722 667 556 611 722 667 889 667 611 611 333 278 333 570 500
    333 500 500 444 500 444 333 500 556 278 278 500 278 778 556 500
    500 500 389 389 278 556 444 667 500 444 389 348 220 348 570""")

  private val afmCourier: Array[Int] = Array.fill(95)(600)

  /** AFM ASCII width table for a standard-14 base font (None for
    * non-base-14). Strips subset prefixes ("ABCDEF+Helvetica") and
    * recognizes the usual substitution aliases (Arial, TimesNewRoman,
    * CourierNew).
    */
  def afmTable(baseFont: String): Option[Array[Int]] = {
    if (baseFont == null || baseFont.isEmpty) return None
    val stripped = baseFont.lastIndexOf('+') match {
      case -1 => baseFont
      case i => baseFont.substring(i + 1)
    }
    val n = stripped.toLowerCase
    val bold = n.contains("bold")
    val italic = n.contains("italic") || n.contains("oblique")
    if (n.contains("courier") || n.contains("mono")) Some(afmCourier)
    else if (n.contains("times"))
      Some(if (bold && italic) afmTimesBoldItalic
      else if (bold) afmTimesBold
      else if (italic) afmTimesItalic
      else afmTimes)
    else if (n.contains("helvetica") || n.contains("arial"))
      Some(if (bold) afmHelveticaBold else afmHelvetica)
    else None
  }

  /** Width of codepoint `cp` in the given AFM table: direct for ASCII,
    * NFD-stripped base letter for accented Latin, -1 when unknown.
    */
  def afmWidthAt(tbl: Array[Int], cp: Int): Int = {
    if (cp >= 0x20 && cp <= 0x7E) tbl(cp - 0x20)
    else if (cp < 0) -1
    else {
      val s = java.text.Normalizer.normalize(
        new String(Character.toChars(cp)), java.text.Normalizer.Form.NFD)
      if (s.nonEmpty) {
        val b = s.charAt(0).toInt
        if (b >= 0x20 && b <= 0x7E && b != cp) tbl(b - 0x20) else -1
      } else -1
    }
  }

  /** Width (1000-em units) of codepoint `cp` in base-14 font `baseFont`
    * with the class-average fallback — shared by the extractor's width
    * synthesis and the corpus generator's advance computation.
    */
  def stdWidth(baseFont: String, cp: Int): Int =
    afmTable(baseFont) match {
      case Some(t) =>
        val w = afmWidthAt(t, cp)
        if (w >= 0) w else defaultWidth(baseFont)
      case None => defaultWidth(baseFont)
    }
}
