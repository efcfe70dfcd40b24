package graft.gen

import graft.job.Span
import graft.html.Entities
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic HTML builder — boilerplate-stripping oracle input
  * (FIXTURES.md §3.2; SURVEY.md §5.2).
  *
  * Wraps known main-content blocks in known boilerplate (nav, footers,
  * link farms, cookie banners, class-blacklist hits) and returns the
  * canonical expected text: title + kept blocks joined "\n\n". The
  * boilerplate text appears in the WET `text` column but NOT in
  * expected_text — that gap is what proves stripping works.
  */
object HtmlBuilder {

  final case class Spec(
      charsetKind: Int, // 0 utf8 | 1 utf8+BOM | 2 meta iso-8859-1
      entityKind: Int, // 0 named | 1 numeric (exercises C1 remap) | 2 literal
      mainKind: Int, // 0 article>p | 1 bare div>p | 2 p with <br> + inline b/a
      traps: Int, // bitmask: 1 unclosed p/li · 2 script markup · 4 comments · 8 CDATA
      titlePresent: Boolean,
      listBlock: Boolean, // a <ul><li> run of long items inside main
      /** r2 axis: a `<pre>` code block inside main — internal newlines,
        * runs of spaces and indentation must survive VERBATIM (modulo
        * the dropped leading newline), unlike every other block.
        */
      preBlock: Boolean = false,
      /** r3 axis: a 3×3 table inside main — each ROW must extract as one
        * tab-joined block (Appendix A table rule).
        */
      tableBlock: Boolean = false)

  final case class Built(bytes: Array[Byte], text: String, spans: Vector[Span],
                         wetText: String)

  def specFor(docId: Long, rng: Random): Spec = {
    val i = (docId - docId / 3 - 1).toInt.max(0) // dense-ish index over HTML docs
    Spec(
      charsetKind = i % 3,
      entityKind = (i / 3) % 3,
      mainKind = (i / 9) % 3,
      traps = rng.nextInt(16),
      titlePresent = rng.nextInt(5) != 0,
      listBlock = rng.nextInt(3) == 0,
      preBlock = (i / 27) % 2 == 1,
      tableBlock = (i / 13) % 3 == 1)
  }

  /** Reverse named-entity map for 1-char values. */
  private lazy val namedRev: Map[Char, String] =
    Entities.named.toSeq.filter(_._2.length == 1)
      .groupBy(_._2.charAt(0)).map { case (c, xs) => c -> xs.map(_._1).minBy(_.length) }

  /** Serialize text content with escaping + the spec's entity style. */
  private def ser(s: String, spec: Spec, rng: Random): String = {
    val latin1 = spec.charsetKind == 2
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c if c < 0x80 => sb.append(c)
      case c =>
        val mustEntity = latin1 && c > 0xFF
        spec.entityKind match {
          case 0 =>
            namedRev.get(c) match {
              case Some(n) => sb.append('&').append(n).append(';')
              case None => sb.append(s"&#x${Integer.toHexString(c.toInt).toUpperCase};")
            }
          case 1 =>
            if (rng.nextBoolean()) sb.append(s"&#${c.toInt};")
            else sb.append(s"&#x${Integer.toHexString(c.toInt).toUpperCase};")
          case _ =>
            if (mustEntity) sb.append(s"&#${c.toInt};")
            else sb.append(c)
        }
    }
    sb.toString
  }

  /** Normalize as the extractor's BlockBuilder would (single spaces,
    * trimmed; '\n' only via <br>). Inputs are already single-spaced.
    */
  private def norm(s: String): String = s.trim.replaceAll("[ \\t]+", " ")

  def build(spec: Spec, paras: Vector[Vector[String]], rng: Random): Built = {
    val h = new StringBuilder(4096)
    val kept = ArrayBuffer.empty[(String, String)] // (text, kind)
    val wet = new StringBuilder

    val pool = TextGen.baseWords
    def words(n: Int): String = Vector.fill(n)(pool(rng.nextInt(pool.size))).mkString(" ")

    /** Keep main blocks safely above the 25-char classifier threshold
      * (ε-band avoidance, FIXTURES.md §3.1 note): pad to >= 30 chars.
      */
    def ensureLen(s: String): String = {
      var t = s
      while (t.length < 30) t = t + " " + pool(rng.nextInt(pool.size))
      t
    }

    val title = if (spec.titlePresent) "Synth " + words(3) else ""
    val h1Text = "Heading " + words(2)

    // C1-remap exercise: a fixed en-dash token serialized as &#150;
    val c1Token = if (spec.entityKind == 1) Some("x–y") else None

    h.append("<!DOCTYPE html>\n<html>\n<head>\n")
    spec.charsetKind match {
      case 2 => h.append("<meta charset=\"iso-8859-1\">\n")
      case _ =>
        if (rng.nextBoolean()) h.append("<meta charset=\"utf-8\">\n")
        else h.append("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=utf-8\">\n")
    }
    if (spec.titlePresent) {
      h.append("<title>").append(ser(title, spec, rng)).append("</title>\n")
      wet.append(title).append(' ')
    }
    h.append("<style>body { color: #333; } .x > div { display: block; }</style>\n")
    h.append("</head>\n<body>\n")

    if ((spec.traps & 4) != 0) h.append("<!-- <p>ghost paragraph that must not appear</p> -->\n")

    // --- boilerplate head: nav (tag-pruned), cookie banner (class-pruned)
    val navWords = words(4)
    h.append("<nav><ul><li><a href=\"/\">Home</a><li><a href=\"/a\">")
      .append(ser(navWords, spec, rng)).append("</a></ul></nav>\n")
    wet.append("Home ").append(navWords).append(' ')
    val cookieText = "We use cookies " + words(3)
    h.append("<div class=\"cookie-banner\"><p>").append(ser(cookieText, spec, rng))
      .append("</p><button>OK</button></div>\n")
    wet.append(cookieText).append(' ')
    val headerText = "Site " + words(2)
    h.append("<header id=\"site_header\"><h2>").append(ser(headerText, spec, rng))
      .append("</h2></header>\n")
    wet.append(headerText).append(' ')

    // --- link farm: survives tag/class pruning, dropped by link density
    h.append("<div class=\"links\">")
    val farmWords = ArrayBuffer.empty[String]
    (0 until 6).foreach { k =>
      val w = words(1)
      farmWords += w
      h.append(s"<a href=\"/f$k\">").append(ser(w, spec, rng)).append("</a> | ")
    }
    h.append("</div>\n")
    wet.append(farmWords.mkString(" ")).append(' ')

    if ((spec.traps & 2) != 0)
      h.append("<script>var x = \"<div>script text must not leak</div>\";</script>\n")
    if ((spec.traps & 8) != 0)
      h.append("<![CDATA[ raw cdata junk that must vanish ]]>\n")

    // --- main content
    val (mainOpen, mainClose) = spec.mainKind match {
      case 0 => ("<article>\n", "</article>\n")
      case 1 => ("<div class=\"content x\">\n", "</div>\n")
      case _ => ("<main>\n", "</main>\n")
    }
    h.append(mainOpen)
    h.append("<h1>").append(ser(h1Text, spec, rng)).append("</h1>\n")
    kept += ((h1Text, "h1"))
    wet.append(h1Text).append(' ')

    val unclosed = (spec.traps & 1) != 0
    var captionDone = false
    var c1Done = c1Token.isEmpty

    paras.zipWithIndex.foreach { case (lines, pi) =>
      if (spec.mainKind == 2 && lines.size > 1) {
        // <br>-joined lines inside one <p>; expected keeps the '\n'
        val lines2 = lines.init :+ ensureLen(lines.last)
        val expected = lines2.map(norm).mkString("\n")
        h.append("<p>")
        lines2.zipWithIndex.foreach { case (ln, li) =>
          if (li > 0) h.append("<br>\n")
          h.append(ser(ln, spec, rng))
        }
        h.append(if (unclosed) "\n" else "</p>\n")
        kept += ((expected, "p"))
        wet.append(lines2.mkString(" ")).append(' ')
      } else {
        var text = ensureLen(norm(lines.mkString(" ")))
        if (!c1Done && text.length >= 25) { text = text + " " + c1Token.get; c1Done = true }
        // inline markup: wrap one word in <b> or low-density <a>
        val wordsArr = text.split(' ')
        val serialized =
          if (wordsArr.length >= 6 && rng.nextInt(2) == 0) {
            val k = rng.nextInt(wordsArr.length)
            val linkLen = wordsArr(k).length
            val nw = text.replace(" ", "").length
            val tag = if (rng.nextBoolean() && linkLen * 4 < nw) "a" else "b"
            wordsArr.zipWithIndex.map { case (w, j) =>
              if (j == k) {
                if (tag == "a") s"<a href=\"/in\">${ser(w, spec, rng)}</a>"
                else s"<b>${ser(w, spec, rng)}</b>"
              } else ser(w, spec, rng)
            }.mkString(" ")
          } else ser(text, spec, rng)
        h.append("<p>").append(serialized).append(if (unclosed) "\n" else "</p>\n")
        kept += ((text, "p"))
        wet.append(text).append(' ')
        // short caption adjacent to a core paragraph (smoothing keep)
        if (!captionDone && text.length >= 25 && pi + 1 < paras.size) {
          val cap = "Fig " + words(1)
          if (cap.length < 25) {
            h.append("<figure><figcaption>").append(ser(cap, spec, rng))
              .append("</figcaption></figure>\n")
            kept += ((cap, "figcaption"))
            wet.append(cap).append(' ')
          }
          captionDone = true
        }
      }
    }

    // <pre> code block: whitespace-verbatim extraction (App. A pre rule).
    // Only the ONE newline straight after <pre> is dropped (WHATWG
    // §13.2); further leading blank lines and trailing newlines are
    // content — both edges exercised here (ADVICE r2).
    if (spec.preBlock) {
      val leadBlank = rng.nextInt(2) == 0 // kept blank first line
      val trailNl = rng.nextInt(2) == 0 // kept trailing newline
      val preText = (if (leadBlank) "\n" else "") + Vector(
        s"def ${words(1).takeWhile(_ != ' ')}(x):",
        "    return x + 1   # two-space  runs   kept",
        "",
        s"value   =  ${words(1)}").mkString("\n") + (if (trailNl) "\n" else "")
      h.append("<pre>\n").append(ser(preText, spec, rng)).append("</pre>\n")
      kept += ((preText, "pre"))
      wet.append(preText.replace('\n', ' ')).append(' ')
    }

    // long-item list inside main (li implied-end exercise, all core-kept)
    if (spec.listBlock) {
      h.append("<ul>")
      (0 until 3).foreach { _ =>
        val itemText = ensureLen(norm(words(7)))
        h.append("<li>").append(ser(itemText, spec, rng))
        if (!unclosed) h.append("</li>")
        kept += ((itemText, "li"))
        wet.append(itemText).append(' ')
      }
      h.append("</ul>\n")
    }

    // data table inside main: each ROW extracts as ONE tab-joined block
    // (Appendix A table rule, r3); header row uses th, exercises both
    // the implied-end path (unclosed cells) and the closed path
    if (spec.tableBlock) {
      h.append("<table>\n")
      (0 until 3).foreach { r =>
        val cells = (0 until 3).map(_ => norm(words(2)))
        val tag = if (r == 0) "th" else "td"
        h.append("<tr>")
        cells.foreach { c =>
          h.append(s"<$tag>").append(ser(c, spec, rng))
          if (!unclosed) h.append(s"</$tag>")
        }
        h.append("</tr>\n")
        val rowText = cells.mkString("\t")
        kept += ((rowText, "tr"))
        wet.append(cells.mkString(" ")).append(' ')
      }
      h.append("</table>\n")
    }
    h.append(mainClose)

    // --- boilerplate tail
    val sideText = "Side " + words(3)
    h.append("<div id=\"sidebar\"><p>").append(ser(sideText, spec, rng)).append("</p></div>\n")
    wet.append(sideText).append(' ')
    val asideText = "Also read " + words(3)
    h.append("<aside><p>").append(ser(asideText, spec, rng)).append("</p></aside>\n")
    wet.append(asideText).append(' ')
    h.append("<div style=\"display: none\"><p>hidden promo ").append(ser(words(2), spec, rng))
      .append("</p></div>\n")
    val footText = "Copyright " + words(2)
    h.append("<footer><p>").append(ser(footText, spec, rng)).append("</p></footer>\n")
    wet.append(footText).append(' ')

    h.append("</body>\n</html>\n")

    // --- bytes per charset
    val htmlStr = h.toString
    val bytes: Array[Byte] = spec.charsetKind match {
      case 2 => htmlStr.getBytes("ISO-8859-1")
      case 1 =>
        val u = htmlStr.getBytes("UTF-8")
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ u
      case _ => htmlStr.getBytes("UTF-8")
    }

    // --- expected text + spans (title first, then kept blocks)
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var blockIdx = 0
    if (title.nonEmpty) {
      sb.append(title)
      spans += Span(0, title.length, 0, "html-title")
      blockIdx = 1
    }
    kept.foreach { case (t, _) =>
      if (sb.length > 0) sb.append("\n\n")
      val start = sb.length
      sb.append(t)
      spans += Span(start, sb.length, blockIdx, "html-block")
      blockIdx += 1
    }
    Built(bytes, sb.toString, spans.result(), wet.toString.trim)
  }
}
