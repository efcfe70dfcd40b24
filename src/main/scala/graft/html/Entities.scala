package graft.html

/** HTML character references (SURVEY.md §2.5 H2; WHATWG HTML spec,
  * named-references subset + numeric with C1/windows-1252 remapping).
  */
object Entities {

  /** Named entity subset (semicolon form). */
  val named: Map[String, String] = {
    val tbl =
      """amp &|lt <|gt >|quot "|apos '|nbsp  |shy ­|
        |mdash —|ndash –|hellip …|laquo «|raquo »|lsquo ‘|rsquo ’|ldquo “|rdquo ”|sbquo ‚|bdquo „|dagger †|Dagger ‡|bull •|middot ·|permil ‰|prime ′|Prime ″|lsaquo ‹|rsaquo ›|oline ‾|frasl ⁄|euro €|trade ™|copy ©|reg ®|deg °|plusmn ±|sup2 ²|sup3 ³|micro µ|para ¶|sect §|frac14 ¼|frac12 ½|frac34 ¾|iexcl ¡|iquest ¿|cent ¢|pound £|curren ¤|yen ¥|brvbar ¦|uml ¨|ordf ª|not ¬|macr ¯|acute ´|cedil ¸|sup1 ¹|ordm º|times ×|divide ÷|
        |Agrave À|Aacute Á|Acirc Â|Atilde Ã|Auml Ä|Aring Å|AElig Æ|Ccedil Ç|Egrave È|Eacute É|Ecirc Ê|Euml Ë|Igrave Ì|Iacute Í|Icirc Î|Iuml Ï|ETH Ð|Ntilde Ñ|Ograve Ò|Oacute Ó|Ocirc Ô|Otilde Õ|Ouml Ö|Oslash Ø|Ugrave Ù|Uacute Ú|Ucirc Û|Uuml Ü|Yacute Ý|THORN Þ|szlig ß|
        |agrave à|aacute á|acirc â|atilde ã|auml ä|aring å|aelig æ|ccedil ç|egrave è|eacute é|ecirc ê|euml ë|igrave ì|iacute í|icirc î|iuml ï|eth ð|ntilde ñ|ograve ò|oacute ó|ocirc ô|otilde õ|ouml ö|oslash ø|ugrave ù|uacute ú|ucirc û|uuml ü|yacute ý|thorn þ|yuml ÿ|
        |OElig Œ|oelig œ|Scaron Š|scaron š|Yuml Ÿ|fnof ƒ|circ ˆ|tilde ˜|ensp  |emsp  |thinsp  |zwnj ‌|zwj ‍|alpha α|beta β|gamma γ|delta δ|pi π|sigma σ|omega ω|Omega Ω|infin ∞|ne ≠|le ≤|ge ≥|minus −|radic √|sum ∑|prod ∏|int ∫|asymp ≈|equiv ≡|larr ←|uarr ↑|rarr →|darr ↓|harr ↔|spades ♠|clubs ♣|hearts ♥|diams ♦|loz ◊|check ✓|
        |""".stripMargin
    val b = Map.newBuilder[String, String]
    tbl.split('|').foreach { rec =>
      val r = rec.replace("\n", "")
      if (r.trim.nonEmpty) {
        val sp = r.indexOf(' ')
        if (sp > 0 && sp < r.length - 0) {
          val name = r.substring(0, sp).trim
          val value = r.substring(sp + 1)
          if (name.nonEmpty && value.nonEmpty) b += name -> value
        }
      }
    }
    // whitespace-valued entities set explicitly (table format can't carry them)
    b += "nbsp" -> "\u00A0"
    b += "shy" -> "\u00AD"
    b += "ensp" -> "\u2002"
    b += "emsp" -> "\u2003"
    b += "thinsp" -> "\u2009"
    b += "zwnj" -> "\u200C"
    b += "zwj" -> "\u200D"
    b.result()
  }

  /** WHATWG numeric-reference C1 remap (0x80–0x9F → windows-1252). */
  val c1Remap: Map[Int, Int] = Map(
    0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
    0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
    0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
    0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
    0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)

  /** Decode character references in `s`. Unknown/invalid refs pass
    * through literally (tolerant, like browsers).
    */
  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi > i + 32) { sb.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#")) {
            val numStr = body.substring(1)
            val cpOpt: Option[Int] =
              try {
                if (numStr.startsWith("x") || numStr.startsWith("X"))
                  Some(Integer.parseInt(numStr.substring(1), 16))
                else Some(Integer.parseInt(numStr))
              } catch { case _: NumberFormatException => None }
            cpOpt match {
              case Some(cp0) if cp0 > 0 && cp0 <= 0x10FFFF =>
                val cp = c1Remap.getOrElse(cp0, cp0)
                if (Character.isValidCodePoint(cp) && !isSurrogateCp(cp))
                  sb.appendCodePoint(cp)
                else sb.append('�')
                i = semi + 1
              case _ => sb.append('&'); i += 1
            }
          } else named.get(body) match {
            case Some(v) => sb.append(v); i = semi + 1
            case None => sb.append('&'); i += 1
          }
        }
      }
    }
    sb.toString
  }

  @inline private def isSurrogateCp(cp: Int): Boolean = cp >= 0xD800 && cp <= 0xDFFF
}
