package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.pdf.{Lexer, Tok, PdfExtractor}
import graft.html.{Entities, HtmlExtractor}

/** Property-based checks (SURVEY.md §5.4, scalacheck directly — the
  * scalatestplus bridge isn't in the offline cache). The generator
  * roundtrip property itself is exercised exhaustively by RoundtripSpec
  * (1200 docs across the full feature matrix).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("TopKAgg: any partitioning of the input yields the exact sorted top-k") {
    import graft.ops.{Scored, TopKAgg}
    val genScored = for {
      cos <- Gen.chooseNum(-1.0, 1.0)
      id <- Gen.chooseNum(0L, 30L) // small id space → duplicates occur
    } yield Scored(cos, id)
    check("topk-partition-invariance", Prop.forAll(
      Gen.listOf(genScored), Gen.chooseNum(1, 5), Gen.chooseNum(1, 6)) {
      (xs: List[Scored], k: Int, nParts: Int) =>
        val agg = new TopKAgg(k)
        // truth: best-cos-first, vecId-asc ties, first occurrence per id
        val truth = xs.sortBy(s => (-s.cos, s.vecId))
          .distinctBy(_.vecId).take(k)
        // fold each partition with reduce, then merge across partitions
        val parts = xs.zipWithIndex.groupBy(_._2 % nParts).values
          .map(p => p.map(_._1).foldLeft(agg.zero)(agg.reduce))
        val merged = parts.foldLeft(agg.zero)(agg.merge)
        agg.finish(merged) == truth
    })
  }

  test("lexer never throws on arbitrary byte junk") {
    check("lexer-junk", Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) {
      bytes: Array[Byte] =>
        val lx = new Lexer(bytes)
        var t: Tok = lx.next()
        var n = 0
        while (t != Tok.TEof && n < 10000) { t = lx.next(); n += 1 }
        true
    })
  }

  test("HTML extractor never throws on arbitrary text") {
    check("html-junk", Prop.forAll(Gen.asciiPrintableStr) { s: String =>
      HtmlExtractor.extractFromString(s)
      true
    })
  }

  test("entity decode leaves entity-free strings unchanged") {
    check("entities-id", Prop.forAll(Gen.asciiPrintableStr.map(_.replace("&", ""))) {
      s: String => Entities.decode(s) == s
    })
  }

  test("PDF extractor never throws uncontrolled on corrupted payloads") {
    val base = gen.CorpusGen.doc(0L).payload
    val inf = new java.util.zip.Inflater()
    check("pdf-corrupt", Prop.forAll(Gen.chooseNum(1, base.length - 1),
      Gen.chooseNum(0, 255)) { (cut: Int, b: Int) =>
      val mutated = java.util.Arrays.copyOf(base, cut)
      if (cut > 10) mutated(cut / 2) = b.toByte
      try { PdfExtractor.extract(mutated, inf); () }
      catch { case _: Exception => () } // typed errors fine; no hangs/Errors
      true
    }, n = 100)
  }

  test("span invariants hold across the corpus (sorted, in-bounds)") {
    val inf = new java.util.zip.Inflater()
    (0 until 150 by 3).foreach { id =>
      val g = gen.CorpusGen.doc(id.toLong)
      val r = PdfExtractor.extract(g.payload, inf)
      var prev = 0
      r.spans.foreach { s =>
        assert(s.start >= prev && s.end <= r.text.length)
        prev = s.end
      }
    }
  }
}
