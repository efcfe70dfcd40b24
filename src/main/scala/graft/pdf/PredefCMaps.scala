package graft.pdf

import java.nio.charset.Charset

/** Byte-oriented predefined CJK CMaps (SURVEY.md §2.4 FN3; ISO 32000-1
  * §9.7.5.2 Table 118; Adobe cmap-resources registry).
  *
  * For TEXT extraction, the full Adobe code→CID tables are unnecessary:
  * these CMaps' code values are bytes of a national text encoding
  * (GBK, Shift-JIS, EUC-JP, EUC-KR, UHC, Big5, …), so code bytes decode
  * to Unicode directly through the JDK's charset decoders. Only the
  * codespace structure (which byte prefixes start a 2-byte code) must be
  * known, and that is small, public, and stable per encoding (WHATWG
  * encoding spec / vendor documentation). CIDs are needed only for
  * /W width lookup, which degrades to /DW — CJK body text is
  * overwhelmingly full-width, so only spacing inference is affected,
  * never the glyph text (same trade as the Uni*-UCS2 family).
  *
  * GB18030's GBK2K-* CMaps add a 4-byte codespace
  * (<81308130> <FE39FE39>, second/fourth bytes 0x30-0x39 — disjoint
  * from the 2-byte GBK plane whose low byte is >= 0x40), decoded by
  * the JDK's GB18030 charset (r5; VERDICT r4 "next" #4). Decoders
  * missing from the runtime degrade typed (never silently).
  */
object PredefCMaps {

  final case class ByteCMap(charset: Charset, codeSpace: Vector[(Long, Long, Int)])

  private def cs(name: String): Option[Charset] =
    if (Charset.isSupported(name)) Some(Charset.forName(name)) else None

  // codespace shapes per encoding family
  private val euc2 = Vector((0x00L, 0x80L, 1), (0xA1A1L, 0xFEFEL, 2))
  private val gbk = Vector((0x00L, 0x80L, 1), (0x8140L, 0xFEFEL, 2))
  private val gb18030 = Vector((0x00L, 0x80L, 1), (0x8140L, 0xFEFEL, 2),
    (0x81308130L, 0xFE39FE39L, 4))
  private val sjis = Vector((0x00L, 0x80L, 1), (0xA0L, 0xDFL, 1),
    (0x8140L, 0x9FFCL, 2), (0xE040L, 0xFCFCL, 2))
  private val eucJp = Vector((0x00L, 0x80L, 1), (0x8EA0L, 0x8EDFL, 2),
    (0xA1A1L, 0xFEFEL, 2))
  private val uhc = Vector((0x00L, 0x80L, 1), (0x8141L, 0xFEFEL, 2))
  private val big5 = Vector((0x00L, 0x80L, 1), (0xA140L, 0xFEFEL, 2))
  private val hkscs = Vector((0x00L, 0x80L, 1), (0x8140L, 0xFEFEL, 2))

  /** Family (name minus the -H/-V writing-mode suffix) → decoder. */
  private lazy val families: Map[String, Option[ByteCMap]] = Map(
    // Adobe-GB1
    "GB-EUC" -> cs("GB2312").map(ByteCMap(_, euc2)),
    "GBK-EUC" -> cs("GBK").map(ByteCMap(_, gbk)),
    "GBKp-EUC" -> cs("GBK").map(ByteCMap(_, gbk)),
    "GBK2K" -> cs("GB18030").map(ByteCMap(_, gb18030)),
    // Adobe-Japan1
    "90ms-RKSJ" -> cs("windows-31j").map(ByteCMap(_, sjis)),
    "90msp-RKSJ" -> cs("windows-31j").map(ByteCMap(_, sjis)),
    "90pv-RKSJ" -> cs("Shift_JIS").map(ByteCMap(_, sjis)),
    "83pv-RKSJ" -> cs("Shift_JIS").map(ByteCMap(_, sjis)),
    "Add-RKSJ" -> cs("Shift_JIS").map(ByteCMap(_, sjis)),
    "Ext-RKSJ" -> cs("Shift_JIS").map(ByteCMap(_, sjis)),
    "EUC" -> cs("EUC-JP").map(ByteCMap(_, eucJp)),
    // Adobe-Korea1 / Adobe-KR
    "KSC-EUC" -> cs("EUC-KR").map(ByteCMap(_, euc2)),
    "KSCms-UHC" -> cs("x-windows-949").map(ByteCMap(_, uhc)),
    "KSCms-UHC-HW" -> cs("x-windows-949").map(ByteCMap(_, uhc)),
    // Adobe-CNS1
    "B5pc" -> cs("Big5").map(ByteCMap(_, big5)),
    "ETen-B5" -> cs("Big5").map(ByteCMap(_, big5)),
    "HKscs-B5" -> cs("Big5-HKSCS").map(ByteCMap(_, hkscs)),
    "CNS-EUC" -> cs("x-EUC-TW").map(ByteCMap(_, euc2)))

  /** Decoder for a predefined CMap name, None when the name is not a
    * byte-oriented family we map (caller degrades typed).
    */
  def lookup(name: String): Option[ByteCMap] = {
    val fam =
      if (name.endsWith("-H") || name.endsWith("-V")) name.dropRight(2) else name
    families.get(fam).flatten
  }
}
