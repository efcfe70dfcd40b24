package graft.gen

import scala.util.Random

/** Deterministic word-salad text source (FIXTURES.md §3).
  *
  * A fixed 256-word list built from syllables, plus per-language accent
  * words chosen to be encodable under each PDF font kind. Seeded
  * per-document by the caller — order-independent generation.
  */
object TextGen {

  private val syllables = Vector(
    "ka", "ro", "mi", "ta", "lo", "ne", "su", "ve", "da", "pi", "zu", "fa",
    "ge", "hi", "jo", "ku", "len", "mar", "nor", "pes", "qui", "ril", "sol",
    "tun", "ul", "vor", "wen", "xi", "yor", "zam")

  /** Fixed 256-word base list (ASCII only). */
  val baseWords: Vector[String] = {
    (0 until 900).map { i =>
      val a = syllables(i % syllables.size)
      val b = syllables((i / syllables.size + i) % syllables.size)
      if (i % 3 == 0) a + b + syllables((i * 7 + 3) % syllables.size) else a + b
    }.distinct.take(256).toVector
  }

  /** Accent words per language, all WinAnsi-encodable. */
  private val langWords: Map[String, Vector[String]] = Map(
    "en" -> Vector("quartz", "sphinx", "jumble"),
    "fr" -> Vector("été", "àprès", "çedille", "fôret", "île"),
    "es" -> Vector("niño", "ágil", "índigo", "córdoba", "útil"),
    "de" -> Vector("über", "größe", "ähnlich", "öfter", "straße"),
    "zh" -> Vector("漢字", "測試", "文本", "提取", "引擎")) // Type0 only

  /** Extra words exercising font-specific mappings. */
  private val diffWords = Vector("αβγ", "€uro", "βeta") // fontKind 1
  private val bfcharWords = Vector("ωmega", "✓check") // fontKind 2
  private val cidWords = Vector("𝒜script", "漢字", "Ünïcødé") // fontKind 3
  /** Symbol-encodable words (basic Greek only; fontKind 7). */
  private val greekWords = Vector(
    "αλφα", "βητα", "γαμμα", "δελτα", "σιγμα", "ωμεγα", "θεωρια",
    "λογος", "κοσμος", "πυθμην", "ρυθμος", "χρονος", "μορφη", "ταξις",
    "φυσις", "ψυχη", "ζωη", "εικων", "νομος", "ξενος")

  /** BMP-only words for the embedded-CMap kind (fontKind 8: wide codes
    * hold one UTF-16 unit each — no surrogate pairs by construction).
    */
  private val embedWords = Vector("αβγ", "Ünïcødé", "漢字", "引擎")

  /** Ornament "words" for ZapfDingbats (fontKind 10): built from the
    * mapped a1..a94 range (U+2701..U+275E), deterministic.
    */
  private val dingbatWords: Vector[String] =
    (0 until 18).map { i =>
      (0 to 2 + i % 3).map(j => (0x2701 + (i * 5 + j) % 94).toChar).mkString
    }.toVector

  /** A word survives for fontKind 9 iff GBK encode→decode is faithful
    * (the generator and extractor share the JDK GBK coders, so this is
    * exactly the encodable set — é/à-style pinyin accents included,
    * ç/ñ/ß excluded).
    */
  private def gbkClean(w: String): Boolean =
    new String(w.getBytes("GBK"), "GBK") == w

  /** Word pool for a (lang, pdfFontKind) combination. fontKind -1 = HTML
    * (anything goes; HTML is UTF-8).
    */
  def pool(lang: String, fontKind: Int): Vector[String] = {
    val base = baseWords
    fontKind match {
      case -1 => base ++ langWords.getOrElse(lang, Vector.empty)
      case 0 => base ++ (if (lang != "zh") langWords.getOrElse(lang, Vector.empty) else Vector.empty)
      case 1 => base ++ diffWords
      case 2 => base ++ bfcharWords
      case 3 => base ++ langWords.getOrElse(lang, Vector.empty) ++ cidWords
      case 4 => base ++ (if (lang != "zh") langWords.getOrElse(lang, Vector.empty) else Vector.empty) // MacRoman
      case 5 => base // Type3: plain ASCII via /Differences names
      case 6 => base ++ langWords.getOrElse(lang, Vector.empty) ++ cidWords // UTF-16BE codes: anything goes
      case 7 => greekWords // Symbol encodes ONLY its own glyph set
      case 8 => base ++ embedWords // embedded CMap: BMP chars via 2-byte codes
      case 9 => (base ++ langWords.getOrElse(lang, Vector.empty)).filter(gbkClean)
      case 10 => dingbatWords // ZapfDingbats encodes ONLY its ornament set
      case 11 | 13 => base ++ greekWords // symbolic TTF/Type1: arbitrary chars+codes
      case 14 => base ++ greekWords // embedded CFF: std SIDs + uniXXXX custom strings
      case 12 => base ++ langWords.getOrElse(lang, Vector.empty) ++ cidWords // vertical UCS2: same as 6
      case _ => base
    }
  }

  /** One paragraph: 1–3 lines of 4–8 words. */
  def paragraph(rng: Random, pool: Vector[String]): PdfBuilder.Para = {
    val nLines = 1 + rng.nextInt(3)
    Vector.fill(nLines) {
      val nWords = 4 + rng.nextInt(5)
      Vector.fill(nWords)(pool(rng.nextInt(pool.size)))
    }
  }

  /** Paragraphs for a whole document, with the 1% big-doc tail
    * (FIXTURES.md §3: ×100 paragraphs to exercise skew salting).
    * `paraScale` > 1 grows bench-tier documents toward realistic
    * CommonCrawl sizes so timed runs reach steady state (SURVEY.md §6);
    * capped so the big tail stays a straggler-exercise, not a wall.
    */
  def docParagraphs(rng: Random, pool: Vector[String], big: Boolean,
                    paraScale: Int = 1, capParas: Int = 1500): Vector[PdfBuilder.Para] = {
    val n = math.min((1 + rng.nextInt(12)) * (if (big) 100 else 1) * paraScale, capParas)
    Vector.fill(n)(paragraph(rng, pool))
  }
}
