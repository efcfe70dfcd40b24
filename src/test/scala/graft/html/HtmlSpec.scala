package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** HTML branch unit cases (SURVEY.md §5.3 / §2.5). */
class HtmlSpec extends AnyFunSuite {

  private def extract(html: String): String =
    HtmlExtractor.extractFromString(html).text

  test("entities: named, numeric dec/hex, C1 remap, invalid passthrough") {
    assert(Entities.decode("a &amp; b") == "a & b")
    assert(Entities.decode("&eacute;&Euml;") == "éË")
    assert(Entities.decode("&#65;&#x42;&#X43;") == "ABC")
    assert(Entities.decode("&#150;") == "–") // C1 remap: 150 -> U+2013
    assert(Entities.decode("&#8212;") == "—")
    assert(Entities.decode("&nbsp;") == " ")
    assert(Entities.decode("&bogusref; &") == "&bogusref; &")
    assert(Entities.decode("AT&T x&y") == "AT&T x&y")
  }

  test("charset sniff: BOM, meta charset, meta http-equiv, default") {
    val latin = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>café et thé au lait du matin</p></body></html>"
    assert(extract(new String(latin.getBytes("ISO-8859-1"), "ISO-8859-1"))
      .contains("café"))
    val bytes = latin.getBytes("ISO-8859-1")
    assert(HtmlParser.decodeBytes(bytes).contains("café"))
    val utf8bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<p>über alles geht die sonne auf</p>".getBytes("UTF-8")
    assert(HtmlParser.decodeBytes(utf8bom).contains("über"))
  }

  test("raw text modes: script content never parsed as markup") {
    val html = "<body><script>var x = \"<p>ghost paragraph text here</p>\";</script>" +
      "<p>real content paragraph with enough length</p></body>"
    val t = extract(html)
    assert(t == "real content paragraph with enough length")
  }

  test("implied end tags: unclosed p and li") {
    val html = "<body><p>first paragraph that is long enough to keep" +
      "<p>second paragraph also long enough to keep</body>"
    assert(extract(html) ==
      "first paragraph that is long enough to keep\n\nsecond paragraph also long enough to keep")
  }

  test("prune: nav/footer tags, class/id blacklist, hidden") {
    val html = """<body>
      |<nav><a href="/">navigation link list here</a></nav>
      |<div class="cookie-banner">We use cookies on this very long site</div>
      |<p>kept main paragraph with sufficient length to pass</p>
      |<div id="sidebar">sidebar boilerplate content of decent length</div>
      |<div style="display:none">hidden text that would otherwise be long enough</div>
      |<footer>copyright footer text of significant length</footer>
      |</body>""".stripMargin
    assert(extract(html) == "kept main paragraph with sufficient length to pass")
  }

  test("link density: farms dropped, low-density links kept") {
    val farm = "<div>" + (1 to 8).map(i => s"<a href='/$i'>link$i</a>").mkString(" | ") + "</div>"
    val main = "<p>real text with one <a href='/x'>inline</a> reference and lots of surrounding words</p>"
    val t = extract(s"<body>$farm$main</body>")
    assert(t == "real text with one inline reference and lots of surrounding words")
  }

  test("neighbor smoothing keeps short captions next to long blocks") {
    val html = "<body><p>long paragraph number one with plenty of characters inside</p>" +
      "<figure><figcaption>Fig 1</figcaption></figure>" +
      "<p>long paragraph number two with plenty of characters inside</p></body>"
    val t = extract(html)
    assert(t.contains("Fig 1"))
  }

  test("isolated short blocks are dropped") {
    val html = "<body><div>short</div>" +
      "<div><a href='/'>x</a><a href='/'>y</a></div>" +
      "<p>the single kept paragraph with plenty of length to be core</p></body>"
    val t = extract(html)
    assert(t == "the single kept paragraph with plenty of length to be core")
  }

  test("title first, <br> newline, whitespace collapse") {
    val html = "<html><head><title>  My   Title </title></head><body>" +
      "<p>line one of the paragraph<br>\n line two after the break tag</p></body></html>"
    assert(extract(html) ==
      "My Title\n\nline one of the paragraph\nline two after the break tag")
  }

  test("comments and CDATA vanish; h1 always kept") {
    val html = "<body><!-- <p>ghost</p> --><![CDATA[ junk ]]><h1>Hi</h1>" +
      "<p>content paragraph long enough to keep around here</p></body>"
    assert(extract(html) == "Hi\n\ncontent paragraph long enough to keep around here")
  }

  test("pre blocks: whitespace verbatim, leading newline dropped, CRLF normalized") {
    val html = "<body><p>intro paragraph long enough to be kept here fine</p>" +
      "<pre>\ndef f(x):\r\n    return x  +  1\n\nend   here</pre>" +
      "<p>outro paragraph long enough to be kept here too</p></body>"
    assert(extract(html) ==
      "intro paragraph long enough to be kept here fine\n\n" +
        "def f(x):\n    return x  +  1\n\nend   here\n\n" +
        "outro paragraph long enough to be kept here too")
  }

  test("pre edge rules: exactly ONE newline dropped; trailing ws kept (WHATWG 13.2)") {
    val intro = "<p>intro paragraph long enough to be kept here fine</p>"
    // <pre>\n\nx : first newline dropped, second is a real blank line
    assert(extract(s"<body>$intro<pre>\n\ncode  line</pre></body>")
      == "intro paragraph long enough to be kept here fine\n\n\ncode  line")
    // leading CRLF counts as the one dropped newline
    assert(extract(s"<body>$intro<pre>\r\n\ncode  line</pre></body>")
      == "intro paragraph long enough to be kept here fine\n\n\ncode  line")
    // trailing newline inside <pre> is content, not trimmed
    assert(extract(s"<body>$intro<pre>\ncode  line\n</pre></body>")
      == "intro paragraph long enough to be kept here fine\n\ncode  line\n")
  }

  test("table rows: td/th cells tab-joined into one block per row") {
    val html = "<body><table>" +
      "<tr><th>alpha header one</th><th>beta header two</th></tr>" +
      "<tr><td>gamma value three</td><td>delta <b>value</b> four</td></tr>" +
      "<tr><td>unclosed cell five<td>implied cell six</tr>" +
      "</table></body>"
    assert(extract(html) ==
      "alpha header one\tbeta header two\n\n" +
        "gamma value three\tdelta value four\n\n" +
        "unclosed cell five\timplied cell six")
  }

  test("block elements inside table cells fold into the row (no NPE; ADVICE r3 #1)") {
    // <td><p>..</p></td> used to null the row builder and NPE the next
    // cell's cellBreak — the whole document became an error row
    val html = "<body><table>" +
      "<tr><td><p>nested paragraph cell</p></td><td>plain second cell</td></tr>" +
      "<tr><td><div>first block</div><div>second block</div></td><td>tail cell</td></tr>" +
      "</table></body>"
    assert(extract(html) ==
      "nested paragraph cell\tplain second cell\n\n" +
        "first block second block\ttail cell")
  }

  test("nested table inside a cell folds into the outer row") {
    val html = "<body><table><tr>" +
      "<td>outer first cell<table><tr><td>inner a</td><td>inner b</td></tr></table></td>" +
      "<td>outer second cell</td>" +
      "</tr></table></body>"
    assert(extract(html) ==
      "outer first cell inner a inner b\touter second cell")
  }

  test("spans: title + block indices") {
    val r = HtmlExtractor.extractFromString(
      "<html><head><title>T</title></head><body><h1>Head</h1>" +
        "<p>content paragraph long enough to be kept as core</p></body></html>")
    assert(r.spans.head.kind == "html-title")
    assert(r.spans.map(_.kind).count(_ == "html-block") == 2)
    val s = r.spans(1)
    assert(r.text.substring(s.start, s.end) == "Head")
  }
}
