package graft.html

import graft.job.{Assembly, Span}
import scala.collection.mutable.ArrayBuffer

/** DOM-heuristic boilerplate stripping (SURVEY.md §2.5 H4–H8;
  * boilerpipe-style shallow text features, Kohlschütter et al. WSDM'10,
  * jusText, Arc90 Readability — public literature; deterministic rules
  * frozen in SURVEY.md Appendix A).
  */
object HtmlExtractor {

  final case class HtmlResult(text: String, spans: Vector[Span], nBlocks: Int)

  // --- H4: prune sets ----------------------------------------------------

  /** Subtrees dropped entirely. */
  private val pruneTags = Set("script", "style", "noscript", "template",
    "svg", "iframe", "form", "nav", "header", "footer", "aside", "button",
    "select", "object", "head") // head handled separately for <title>

  /** id/class/role word blacklist (word-split on [-_ ] boundaries). */
  private val pruneWords = Set("nav", "menu", "footer", "sidebar", "banner",
    "breadcrumb", "breadcrumbs", "comment", "comments", "share", "social",
    "cookie", "cookies", "ad", "ads", "adv", "advert", "advertisement",
    "promo", "related", "widget")

  private def blacklisted(attrs: Map[String, String]): Boolean = {
    def hit(v: String): Boolean =
      v.toLowerCase.split("[^a-z0-9]+").exists(pruneWords.contains)
    attrs.get("id").exists(hit) || attrs.get("class").exists(hit) ||
      attrs.get("role").exists(hit)
  }

  private def hiddenByStyle(attrs: Map[String, String]): Boolean =
    attrs.contains("hidden") ||
      attrs.get("style").exists { s =>
        val t = s.toLowerCase.replace(" ", "")
        t.contains("display:none") || t.contains("visibility:hidden")
      }

  // --- H5: block segmentation ---------------------------------------------

  /** Elements that open/close a text block. */
  private val blockTags = Set("p", "div", "section", "article", "h1", "h2",
    "h3", "h4", "h5", "h6", "li", "blockquote", "pre", "td", "th", "tr",
    "table", "ul", "ol", "dl", "dt", "dd", "main", "body", "figure",
    "figcaption", "address", "article", "summary", "details")

  final case class Block(text: String, nwChars: Int, linkNwChars: Int,
                         tag: String, forcedKeep: Boolean) {
    def linkDensity: Double = if (nwChars == 0) 1.0 else linkNwChars.toDouble / nwChars
  }

  /** Classifier thresholds (frozen; SURVEY.md §2.5 H6). */
  private val MaxLinkDensity = 0.33
  private val MinBlockLen = 25

  private final class BlockBuilder(val tag: String, val forcedKeep: Boolean,
                                   val preserve: Boolean = false) {
    val sb = new java.lang.StringBuilder
    var nw = 0
    var linkNw = 0
    // WHATWG §13.2: drop exactly ONE newline immediately after <pre> —
    // not every newline while the buffer is empty (`<pre>\n\nx` keeps a
    // real blank line; ADVICE r2)
    private var droppedLead = false

    /** Append text. Default: whitespace collapsing. `preserve` (inside
      * `<pre>`): whitespace verbatim, except CRLF/CR normalize to LF
      * and the single newline immediately after the open tag is dropped
      * (WHATWG §13.2 pre rule). Non-ws chars counted either way.
      */
    def append(s: String, inLink: Boolean): Unit = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (preserve) {
          if (c == '\r') {
            // CRLF: skip (the LF appends next); lone CR: normalize to LF
            // (the first one after the open tag is the dropped one)
            if (!(i + 1 < s.length && s.charAt(i + 1) == '\n')) {
              if (sb.length == 0 && !droppedLead) droppedLead = true
              else sb.append('\n')
            }
          } else if (c == '\n' && sb.length == 0 && !droppedLead) {
            droppedLead = true // the single newline after <pre>
          } else {
            sb.append(c)
            if (!(c == ' ' || c == '\t' || c == '\n' || c == '\f')) {
              nw += 1
              if (inLink) linkNw += 1
            }
          }
        } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
          val n = sb.length
          if (n > 0 && sb.charAt(n - 1) != ' ' && sb.charAt(n - 1) != '\n' &&
            sb.charAt(n - 1) != '\t') sb.append(' ')
        } else {
          sb.append(c)
          nw += 1
          if (inLink) linkNw += 1
        }
        i += 1
      }
    }

    /** Cell boundary inside a table row: trailing spaces stripped, one
      * tab (Appendix A table rule, r3: cells of a row read as one
      * tab-joined line, not separate "\n\n" blocks).
      */
    def cellBreak(): Unit = {
      var n = sb.length
      while (n > 0 && sb.charAt(n - 1) == ' ') n -= 1
      sb.setLength(n)
      sb.append('\t')
    }

    /** <br>: strip trailing spaces, newline (consecutive collapse). */
    def lineBreak(): Unit = {
      var n = sb.length
      while (n > 0 && sb.charAt(n - 1) == ' ') n -= 1
      sb.setLength(n)
      if (n > 0 && sb.charAt(n - 1) != '\n') sb.append('\n')
    }

    def build(): Option[Block] = {
      // trim trailing ws/newlines — EXCEPT in preserve blocks, where
      // "whitespace verbatim" must hold at the block edges too
      if (!preserve) {
        var n = sb.length
        while (n > 0 && (sb.charAt(n - 1) == ' ' || sb.charAt(n - 1) == '\n')) n -= 1
        sb.setLength(n)
      }
      // whitespace-only blocks (nw == 0) are boilerplate either way
      if (sb.length == 0 || nw == 0) None
      else Some(Block(sb.toString, nw, linkNw, tag, forcedKeep))
    }
  }

  /** Walk the pruned tree; produce blocks in document order + the title. */
  private def segment(root: Elem): (Option[String], Vector[Block]) = {
    val blocks = Vector.newBuilder[Block]
    var title: Option[String] = None
    var cur: BlockBuilder = null
    var linkDepth = 0
    var rowDepth = 0

    def closeBlock(): Unit = {
      if (cur != null) { cur.build().foreach(blocks += _); cur = null }
    }

    def openBlock(tag: String): Unit = {
      closeBlock()
      cur = new BlockBuilder(tag, forcedKeep = tag == "h1", preserve = tag == "pre")
    }

    def walk(e: Elem): Unit = {
      e.children.foreach {
        case Text(s) =>
          if (cur == null && s.exists(c => !isWsCh(c))) openBlock("#text")
          if (cur != null) cur.append(s, linkDepth > 0)
        case el: Elem =>
          val tag = el.tag
          if (tag == "title") {
            // first <title> only; normalize like a block
            if (title.isEmpty) {
              val b = new BlockBuilder("title", forcedKeep = true)
              collectText(el, b)
              title = b.build().map(_.text)
            }
          } else if (tag == "head") {
            // head is boilerplate except for its <title>
            if (title.isEmpty) findTitle(el).foreach { tEl =>
              val b = new BlockBuilder("title", forcedKeep = true)
              collectText(tEl, b)
              title = b.build().map(_.text)
            }
          } else if (pruneTags.contains(tag) || blacklisted(el.attrs) ||
            hiddenByStyle(el.attrs)) {
            () // pruned subtree (H4)
          } else if (tag == "br") {
            if (cur != null) cur.lineBreak()
          } else if (tag == "tr" && rowDepth == 0) {
            // one block per table ROW, cells tab-joined (Appendix A r3);
            // stray td/th outside a tr still fall through to blockTags
            closeBlock()
            openBlock("tr")
            rowDepth += 1
            var cellIdx = 0
            el.children.foreach {
              case cell: Elem if cell.tag == "td" || cell.tag == "th" =>
                if (cur == null) openBlock("tr") // defensive: never NPE mid-row
                if (cellIdx > 0) cur.cellBreak()
                cellIdx += 1
                walk(cell)
              case _ => () // inter-cell whitespace / stray nodes
            }
            rowDepth -= 1
            closeBlock()
          } else if (blockTags.contains(tag)) {
            if (rowDepth > 0) {
              // Block-level child INSIDE a table cell (<td><p>x</p></td>):
              // keep the one-block-per-row invariant — the nested block is
              // folded into the row as collapsed-whitespace-separated text
              // instead of closing the row block (which nulled `cur` and
              // NPE'd the next cell's cellBreak; ADVICE r3 #1). Nested <tr>
              // (table-in-cell) takes this path too via the guard above.
              if (cur != null) cur.append(" ", linkDepth > 0)
              walk(el)
              if (cur != null) cur.append(" ", linkDepth > 0)
            } else {
              closeBlock()
              openBlock(tag)
              walk(el)
              closeBlock()
            }
          } else {
            // inline element
            if (tag == "a") {
              linkDepth += 1
              walk(el)
              linkDepth -= 1
            } else walk(el)
          }
      }
    }

    def collectText(e: Elem, b: BlockBuilder): Unit = e.children.foreach {
      case Text(s) => b.append(s, inLink = false)
      case el: Elem => collectText(el, b)
    }

    def findTitle(e: Elem): Option[Elem] = {
      val it = e.children.iterator
      while (it.hasNext) it.next() match {
        case el: Elem =>
          if (el.tag == "title") return Some(el)
          val r = findTitle(el)
          if (r.isDefined) return r
        case _ => ()
      }
      None
    }

    walk(root)
    closeBlock()
    (title, blocks.result())
  }

  @inline private def isWsCh(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  // --- H6: classifier with neighbor smoothing ------------------------------

  /** keep(i) = forced || (ld<0.33 && (len>=25 || core neighbor)). */
  private def classify(blocks: Vector[Block]): Vector[Boolean] = {
    val core = blocks.map(b =>
      b.forcedKeep || (b.linkDensity < MaxLinkDensity && b.text.length >= MinBlockLen))
    blocks.indices.map { i =>
      val b = blocks(i)
      core(i) || (b.linkDensity < MaxLinkDensity &&
        ((i > 0 && core(i - 1)) || (i + 1 < blocks.length && core(i + 1))))
    }.toVector
  }

  // --- top level ------------------------------------------------------------

  def extract(bytes: Array[Byte]): HtmlResult = {
    val html = HtmlParser.decodeBytes(bytes)
    extractFromString(html)
  }

  def extractFromString(html: String): HtmlResult = {
    val root = HtmlParser.parse(html)
    val (title, blocks) = segment(root)
    val keep = classify(blocks)
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var blockIdx = 0
    title.filter(_.nonEmpty).foreach { t =>
      spans += Span(0, t.length, 0, "html-title")
      sb.append(t)
      blockIdx = 1
    }
    blocks.indices.foreach { i =>
      if (keep(i)) {
        if (sb.length > 0) sb.append(Assembly.UnitJoin)
        val start = sb.length
        sb.append(blocks(i).text)
        spans += Span(start, sb.length, blockIdx, "html-block")
        blockIdx += 1
      }
    }
    HtmlResult(sb.toString, spans.result(), blockIdx)
  }
}
