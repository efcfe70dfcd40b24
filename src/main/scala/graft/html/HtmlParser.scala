package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML node model (SURVEY.md §1.5). */
sealed trait Node
final case class Elem(tag: String, attrs: Map[String, String],
                      children: ArrayBuffer[Node]) extends Node
final case class Text(s: String) extends Node // entity-decoded

/** Hand-written HTML tokenizer + simplified tree builder
  * (SURVEY.md §2.5 H1–H3; WHATWG HTML tokenizer states, deterministic
  * documented subset — we are our own oracle, SURVEY.md §5.2).
  */
object HtmlParser {

  // --- H1: charset sniff + decode --------------------------------------

  /** BOM → meta-charset scan (first 1024 bytes) → UTF-8 fallback. */
  def decodeBytes(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xEF &&
      (bytes(1) & 0xff) == 0xBB && (bytes(2) & 0xff) == 0xBF)
      return new String(bytes, 3, bytes.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFE && (bytes(1) & 0xff) == 0xFF)
      return new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xFE)
      return new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16LE)
    val head = new String(bytes, 0, math.min(1024, bytes.length), "ISO-8859-1").toLowerCase
    val cs = findMetaCharset(head)
    val charset = cs.flatMap { name =>
      try Some(java.nio.charset.Charset.forName(name)) catch { case _: Exception => None }
    }.getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    new String(bytes, charset)
  }

  /** `<meta charset=X>` or `<meta http-equiv=content-type content="...charset=X">`. */
  private def findMetaCharset(head: String): Option[String] = {
    var i = head.indexOf("charset")
    while (i >= 0) {
      var j = i + "charset".length
      while (j < head.length && (head.charAt(j) == ' ' || head.charAt(j) == '=')) j += 1
      if (j < head.length && head.charAt(j - 1) == '=') {
        // skip quotes
        var k = j
        if (k < head.length && (head.charAt(k) == '"' || head.charAt(k) == '\'')) k += 1
        val start = k
        while (k < head.length && (head.charAt(k).isLetterOrDigit ||
          head.charAt(k) == '-' || head.charAt(k) == '_')) k += 1
        if (k > start) return Some(head.substring(start, k))
      }
      i = head.indexOf("charset", i + 7)
    }
    None
  }

  // --- H2: tokenizer ----------------------------------------------------

  sealed trait Tok
  final case class TStart(tag: String, attrs: Map[String, String], selfClosing: Boolean) extends Tok
  final case class TEnd(tag: String) extends Tok
  final case class TText(raw: String) extends Tok // NOT yet entity-decoded
  final case class TRawText(tag: String, text: String) extends Tok // script/style/title/textarea content

  /** Elements whose content is raw text (no markup, scan to close tag). */
  private val rawTextTags = Set("script", "style", "textarea", "title")
  /** Raw-text tags whose content still gets entity decoding (RCDATA). */
  val rcdataTags = Set("textarea", "title")

  def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(upto: Int): Unit =
      if (upto > textStart) out += TText(html.substring(textStart, upto))

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          // comment, doctype, CDATA-as-bogus-comment
          flushText(i)
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
          textStart = i
        } else if (c1 == '/') {
          flushText(i)
          val e = html.indexOf('>', i + 2)
          if (e < 0) { i = n; textStart = n }
          else {
            val name = html.substring(i + 2, e).trim.toLowerCase
              .takeWhile(ch => ch.isLetterOrDigit)
            if (name.nonEmpty) out += TEnd(name)
            i = e + 1
            textStart = i
          }
        } else if (c1.isLetter) {
          flushText(i)
          val (tok, next) = lexStartTag(html, i)
          i = next
          textStart = i
          tok match {
            case Some(t @ TStart(tag, _, selfClosing)) =>
              out += t
              if (!selfClosing && rawTextTags.contains(tag)) {
                // raw-text mode: scan for the matching close tag
                val closeIdx = indexOfCloseTag(html, i, tag)
                val end = if (closeIdx < 0) n else closeIdx
                out += TRawText(tag, html.substring(i, end))
                if (closeIdx < 0) { i = n } else {
                  val gt = html.indexOf('>', closeIdx)
                  i = if (gt < 0) n else gt + 1
                }
                out += TEnd(tag)
                textStart = i
              }
            case _ => ()
          }
        } else { i += 1 } // stray '<': keep in text
      } else i += 1
    }
    flushText(n)
    out.result()
  }

  /** Case-insensitive search for `</tag` followed by a non-name char. */
  private def indexOfCloseTag(html: String, from: Int, tag: String): Int = {
    val n = html.length
    val tlen = tag.length
    var i = from
    while (i + tlen + 2 <= n) {
      if (html.charAt(i) == '<' && html.charAt(i + 1) == '/' &&
        html.regionMatches(true, i + 2, tag, 0, tlen) &&
        (i + 2 + tlen >= n || !html.charAt(i + 2 + tlen).isLetterOrDigit))
        return i
      i += 1
    }
    -1
  }

  /** Lex a start tag at `i` (html.charAt(i) == '<'). Returns token + next index. */
  private def lexStartTag(html: String, start: Int): (Option[TStart], Int) = {
    val n = html.length
    var i = start + 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val name = html.substring(nameStart, i).toLowerCase
    if (name.isEmpty) return (None, start + 1)
    val attrs = Map.newBuilder[String, String]
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      // skip ws
      while (i < n && isWs(html.charAt(i))) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name
          val as = i
          while (i < n && !isWs(html.charAt(i)) && html.charAt(i) != '=' &&
            html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val aname = html.substring(as, i).toLowerCase
          while (i < n && isWs(html.charAt(i))) i += 1
          var avalue = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && isWs(html.charAt(i))) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i)
              i += 1
              val vs = i
              while (i < n && html.charAt(i) != q) i += 1
              avalue = html.substring(vs, i)
              if (i < n) i += 1
            } else {
              val vs = i
              while (i < n && !isWs(html.charAt(i)) && html.charAt(i) != '>') i += 1
              avalue = html.substring(vs, i)
            }
          }
          if (aname.nonEmpty) attrs += aname -> Entities.decode(avalue)
      }
    }
    (Some(TStart(name, attrs.result(), selfClosing)), i)
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  // --- H3: simplified tree builder --------------------------------------

  val voidTags = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")

  /** Tags that imply closing an open `p`. */
  private val closesP = Set("p", "div", "section", "article", "aside", "nav",
    "header", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "blockquote", "pre", "form", "hr", "main", "figure", "dl")

  /** Deterministic sibling-implied end tags (subset of WHATWG). */
  private def impliedEnd(openTag: String, newTag: String): Boolean = openTag match {
    case "p" => closesP.contains(newTag)
    case "li" => newTag == "li"
    case "dt" | "dd" => newTag == "dt" || newTag == "dd"
    case "tr" => newTag == "tr"
    case "td" | "th" => newTag == "td" || newTag == "th" || newTag == "tr"
    case "option" => newTag == "option" || newTag == "optgroup"
    case _ => false
  }

  /** Open-element cap (Blink caps at 512): beyond this depth new
    * elements are flattened as siblings of the deepest open element
    * instead of nesting. Bounds the tree depth so the recursive
    * consumers (`HtmlExtractor.segment.walk`, `collectText`) cannot
    * StackOverflowError on degenerate `<b><b><b>…` nests — an Error,
    * not an Exception, so it would escape the extraction error
    * taxonomy and kill the task (SURVEY.md §7 hazard 6).
    */
  private val MaxTreeDepth = 512

  /** Parse decoded HTML into a tree rooted at a synthetic element. */
  def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty, ArrayBuffer.empty)
    val stack = ArrayBuffer[Elem](root)

    def top: Elem = stack.last
    def push(e: Elem): Unit = {
      top.children += e
      if (stack.length < MaxTreeDepth) stack += e
    }
    def popTo(tag: String): Unit = {
      val idx = stack.lastIndexWhere(_.tag == tag)
      if (idx > 0) stack.remove(idx, stack.length - idx)
    }

    tokenize(html).foreach {
      case TStart(tag, attrs, selfClosing) =>
        // implied end tags on sibling open
        while (stack.length > 1 && impliedEnd(top.tag, tag)) {
          stack.remove(stack.length - 1)
        }
        val e = Elem(tag, attrs, ArrayBuffer.empty)
        if (voidTags.contains(tag) || selfClosing) top.children += e
        else push(e)
      case TEnd(tag) =>
        if (!voidTags.contains(tag)) popTo(tag)
      case TText(raw) =>
        top.children += Text(Entities.decode(raw))
      case TRawText(tag, text) =>
        val decoded = if (rcdataTags.contains(tag)) Entities.decode(text) else text
        top.children += Text(decoded)
    }
    root
  }
}
