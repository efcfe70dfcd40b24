package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.CorpusGen
import graft.pdf.PdfExtractor
import graft.html.HtmlExtractor

/** Deterministic corruption sweep (SURVEY.md §7 hazard 6): at 100 TB a
  * single wedged executor stalls the job, so every mutation must finish
  * quickly with either output or a typed error — never a hang, an
  * Error, or an unbounded loop.
  */
class FuzzSpec extends AnyFunSuite {

  test("mutated payloads always terminate fast with output or typed error") {
    val inflater = new java.util.zip.Inflater()
    val rng = new scala.util.Random(20260816L)
    var nErr = 0
    var nOk = 0
    (0 until 60).foreach { base =>
      val g = CorpusGen.doc(base.toLong)
      (0 until 25).foreach { _ =>
        val m = mutate(g.payload, rng)
        val t0 = System.nanoTime()
        try {
          if (PdfExtractor.isPdf(m)) PdfExtractor.extract(m, inflater)
          else HtmlExtractor.extract(m)
          nOk += 1
        } catch {
          case _: Exception => nErr += 1 // typed failure is fine
          case e: StackOverflowError => fail(s"stack overflow on doc $base")
        }
        val ms = (System.nanoTime() - t0) / 1000000
        assert(ms < 5000, s"doc $base mutation took ${ms}ms — possible hang path")
      }
    }
    info(s"fuzz: $nOk extracted, $nErr typed errors, 0 hangs/crashes")
    assert(nOk + nErr == 1500)
  }

  test("Sfnt and CidCMap parsers survive random and mutated inputs (r4)") {
    val rng = new scala.util.Random(20260817L)
    val validTtf = graft.gen.TtfBuilder.build(
      Seq(0x20 -> ' '.toInt, 0x41 -> 'a'.toInt, 0x42 -> 0x6F22))
    val validCMap = ("%!PS-Adobe-3.0 Resource-CMap\n/GBK-EUC-H usecmap\n" +
      "2 begincodespacerange <20> <7E> <8140> <FEFE> endcodespacerange\n" +
      "1 begincidrange <20> <7E> 32 endcidrange\n" +
      "1 begincidchar <8140> 4096 endcidchar\nendcmap").getBytes("ISO-8859-1")
    (0 until 800).foreach { i =>
      val input =
        if (i % 3 == 0) Array.fill(rng.nextInt(400))(rng.nextInt(256).toByte)
        else mutate(if (i % 3 == 1) validTtf else validCMap, rng)
      val t0 = System.nanoTime()
      // Sfnt.parse catches internally; CidCMap.parse may throw (its
      // caller wraps) — neither may hang, loop, nor blow the stack
      Sfnt2.parse(input)
      try graft.pdf.CidCMap.parse(input) catch { case _: Exception => () }
      assert((System.nanoTime() - t0) / 1000000 < 2000, s"fuzz case $i slow")
    }
  }
  private val Sfnt2 = graft.pdf.Sfnt

  test("Cff parser survives random and mutated inputs (r5)") {
    val rng = new scala.util.Random(20260818L)
    val validCff = graft.gen.CffBuilder.build(
      Seq(0x20 -> ' '.toInt, 0x41 -> 'a'.toInt, 0x42 -> 0x03B1, 0x43 -> 0x6F22))
    (0 until 800).foreach { i =>
      val input =
        if (i % 3 == 0) Array.fill(rng.nextInt(300))(rng.nextInt(256).toByte)
        else mutate(validCff, rng)
      val t0 = System.nanoTime()
      graft.pdf.Cff.parse(input) // catches internally: empty map, never throws
      assert((System.nanoTime() - t0) / 1000000 < 2000, s"cff fuzz case $i slow")
    }
  }

  test("HtmlExtractor survives markup-specific mutations (r6; VERDICT r5 #7)") {
    val rng = new scala.util.Random(20260819L)
    // corpus HTML docs as the seed population (real spec-matrix markup)
    val htmlDocs = (0 until 200).map(i => CorpusGen.doc(i.toLong))
      .filter(g => !PdfExtractor.isPdf(g.payload)).take(40)
    assert(htmlDocs.nonEmpty)
    var cases = 0
    htmlDocs.foreach { g =>
      val src = new String(g.payload, java.nio.charset.StandardCharsets.UTF_8)
      (0 until 20).foreach { _ =>
        val mutated = mutateMarkup(src, rng)
        val bytes = mutated.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val t0 = System.nanoTime()
        val r1 = HtmlExtractor.extract(bytes) // must be TOTAL: no throw at all
        val r2 = HtmlExtractor.extract(bytes)
        assert(r1 == r2, "non-deterministic HTML extraction")
        assert((System.nanoTime() - t0) / 1000000 < 5000, "slow HTML fuzz case")
        cases += 1
      }
    }
    info(s"html fuzz: $cases mutated documents, 0 throws/hangs")
  }

  test("degenerate deep tag nests are depth-capped, not StackOverflowError (r6)") {
    // 50k nested inline tags: without the tree-builder depth cap the
    // recursive segment walk blows the stack — an Error, which escapes
    // the job's Exception taxonomy and kills the task at scale.
    val payload = "the payload text survives the depth cap with room to spare"
    val deepInline = "<html><body><p>" + ("<b>" * 50000) + payload +
      ("</b>" * 50000) + "</p></body></html>"
    val r = HtmlExtractor.extractFromString(deepInline)
    assert(r.text.contains(payload))
    val deepBlock = "<html><body>" + ("<div>" * 50000) + s"<p>$payload</p>" +
      ("</div>" * 50000) + "</body></html>"
    val rb = HtmlExtractor.extractFromString(deepBlock)
    assert(rb.text.contains(payload))
    // width, not depth: 50k sibling paragraphs must also terminate fast
    val wide = "<html><body>" + (0 until 50000)
      .map(i => s"<p>wide paragraph number $i with enough characters to be kept</p>")
      .mkString + "</body></html>"
    val t0 = System.nanoTime()
    val rw = HtmlExtractor.extractFromString(wide)
    assert(rw.text.nonEmpty)
    assert((System.nanoTime() - t0) / 1000000 < 10000)
  }

  /** HTML-shaped mutations: the byte-level `mutate` misses the
    * markup-structural failure classes (mid-entity truncation, quote
    * desync, raw-text mode escapes, charset lies).
    */
  private def mutateMarkup(src: String, rng: scala.util.Random): String = {
    val sb = new java.lang.StringBuilder(src)
    def randPos(): Int = if (sb.length == 0) 0 else rng.nextInt(sb.length)
    (0 until 1 + rng.nextInt(3)).foreach { _ =>
      rng.nextInt(9) match {
        case 0 => // truncate anywhere (often mid-tag / mid-entity)
          sb.setLength(randPos())
        case 1 => // drop a random close tag
          val i = sb.indexOf("</", randPos())
          if (i >= 0) { val j = sb.indexOf(">", i); if (j > 0) sb.delete(i, j + 1) }
        case 2 => // break an entity midway
          val i = sb.indexOf("&", randPos())
          if (i >= 0 && i + 3 < sb.length) sb.delete(i + 1, i + 3)
        case 3 => // stray '<' and '&' into text
          sb.insert(randPos(), if (rng.nextBoolean()) "<" else "&#x")
        case 4 => // unterminated comment opener
          sb.insert(randPos(), "<!--")
        case 5 => // unterminated raw-text element
          sb.insert(randPos(), "<script>var x = '<p>not markup</p>';")
        case 6 => // attr quote desync
          sb.insert(randPos(), "<div class=\"unclosed><span id='x>")
        case 7 => // lie about the charset
          val i = sb.indexOf("charset")
          if (i >= 0) sb.replace(i, i + 7, "charset=ebcdic-garbage ")
          else sb.insert(0, "<meta charset=\"no-such-charset\">")
        case _ => // NULs and C1 controls into the stream
          sb.insert(randPos(), "\u0000\u008A\u0001")
      }
    }
    sb.toString
  }

  test("string expressions survive random unicode input deterministically (r6)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(20260817L)
    (0 until 500).foreach { i =>
      // random codepoints incl. surrogate-pair planes, %-signs, ws
      val sb = new java.lang.StringBuilder
      (0 until rng.nextInt(200)).foreach { _ =>
        rng.nextInt(6) match {
          case 0 => sb.append('%')
          case 1 => sb.append(" \t\n".charAt(rng.nextInt(3)))
          case 2 => sb.appendCodePoint(0x10000 + rng.nextInt(0x1000)) // astral
          case _ => sb.appendCodePoint(1 + rng.nextInt(0xD7FF))
        }
      }
      val u = UTF8String.fromString(sb.toString)
      val t0 = System.nanoTime()
      // each must be total (no throw) and deterministic (same output twice)
      def twice[A](f: => A): Unit = assert(f == f, s"non-deterministic at case $i")
      twice(graft.functions.PercentNormalizeImpl.normalize(u))
      twice(graft.functions.IdnAsciiImpl.toAscii(u))
      twice(graft.functions.LangIdImpl.detect(u))
      twice(graft.functions.MojibakeImpl.fixStr(sb.toString))
      val st = org.apache.spark.sql.types.StringType
      val lt = org.apache.spark.sql.types.LongType
      val k = 1 + rng.nextInt(8)
      val n = 1 + rng.nextInt(5)
      twice(graft.functions.ShingleImpl.charShingles(u, k).toObjectArray(st).mkString("|"))
      twice(graft.functions.ShingleImpl.wordGrams(u, n).toObjectArray(st).mkString("|"))
      val w = 1 + rng.nextInt(6) // hoisted: twice() is by-name
      twice(graft.functions.ShingleImpl.winnow(u, n, w).toObjectArray(lt).mkString("|"))
      twice(graft.functions.ShingleImpl.minhashSig(u, k, 8, i % 2 == 0).toObjectArray(lt).mkString("|"))
      val dt = org.apache.spark.sql.types.DoubleType
      twice(graft.functions.RepetitionImpl.stats(u).toObjectArray(dt).mkString("|"))
      assert((System.nanoTime() - t0) / 1000000 < 2000, s"expr fuzz case $i slow")
    }
  }

  private def mutate(bytes: Array[Byte], rng: scala.util.Random): Array[Byte] = {
    val mode = rng.nextInt(4)
    mode match {
      case 0 => // truncate
        java.util.Arrays.copyOf(bytes, 1 + rng.nextInt(bytes.length))
      case 1 => // flip a handful of bytes
        val m = bytes.clone()
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
        }
        m
      case 2 => // zero a window (kills offsets/keywords)
        val m = bytes.clone()
        val start = rng.nextInt(m.length)
        val len = math.min(m.length - start, 1 + rng.nextInt(64))
        java.util.Arrays.fill(m, start, start + len, 0.toByte)
        m
      case _ => // duplicate a slice into another position (desync traps)
        val m = bytes.clone()
        val from = rng.nextInt(m.length)
        val to = rng.nextInt(m.length)
        val len = math.min(math.min(m.length - from, m.length - to), 1 + rng.nextInt(32))
        System.arraycopy(bytes, from, m, to, len)
        m
    }
  }
}
