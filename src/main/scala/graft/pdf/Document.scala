package graft.pdf

import PdfObj._
import scala.collection.mutable

/** Parsed PDF document: xref-backed lazy object store + page tree
  * (SURVEY.md §2.2 X6, E1; ISO 32000-1 §7.7).
  *
  * One instance per input row; the `inflater` is lent by the
  * per-partition ExtractCtx so zlib state is reused across documents
  * (mapPartitions batching, SURVEY.md §4.3).
  */
final class PdfDocument(val bytes: Array[Byte],
                        val inflater: java.util.zip.Inflater) {
  import XrefWalk._

  final class PdfLoadException(msg: String) extends RuntimeException(msg)

  private val (xref: Map[Int, Entry], trailer: PDict) = {
    val viaStart =
      try {
        XrefWalk.findStartXref(bytes).map { off =>
          val r = XrefWalk.walk(bytes, off, inflater)
          // gate on USABLE entries: every classic xref carries at least
          // the object-0 free head, so Free-only tables (e.g. corrupt
          // in-use rows skipped by the tolerant lexer) must still fall
          // through to object-scan recovery
          val usable = r.entries.exists(_._2 != Free)
          if (!usable) None else Some((r.entries, r.trailer))
        }.flatten
      } catch { case _: Exception => None }
    viaStart.getOrElse {
      // recovery path: rebuild from `n g obj` scan; trailer found by scan
      val entries = XrefWalk.reconstruct(bytes)
      if (entries.isEmpty) throw new PdfLoadException("no xref and no objects found")
      val t = scanTrailerDict(entries)
      (entries, t)
    }
  }

  /** Recovery-mode trailer: look for a literal `trailer` dict; else find
    * any object with /Type/Catalog and synthesize /Root. Runs during
    * construction, so it parses locally (no class-field caches yet).
    */
  private def scanTrailerDict(entries: Map[Int, Entry]): PDict = {
    val s = new String(bytes, "ISO-8859-1")
    val ti = s.lastIndexOf("trailer")
    if (ti >= 0) {
      val lx = new Lexer(bytes, ti + "trailer".length, bytes.length)
      new ObjParser(lx, null).parseObj() match {
        case d: PDict if d.get("Root").isDefined => return d
        case _ => ()
      }
    }
    def rawObjAt(off: Long): PdfObj = {
      val lx = new Lexer(bytes, off.toInt, bytes.length)
      (lx.next(), lx.next(), lx.next()) match {
        case (Tok.TInt(_), Tok.TInt(_), Tok.TKw("obj")) =>
          new ObjParser(lx, null).parseObj()
        case _ => PNull
      }
    }
    val catalogNum = entries.toSeq.sortBy(_._1).collectFirst {
      case (num, InFile(off)) if (rawObjAt(off) match {
            case d: PDict => d.get("Type").contains(PName("Catalog"))
            case _ => false
          }) => num
    }
    catalogNum match {
      case Some(n) => PDict(Map("Root" -> PRef(n, 0)))
      case None => throw new PdfLoadException("no /Root recoverable")
    }
  }

  private val objCache = mutable.Map.empty[Int, PdfObj]
  private val objStmCache = mutable.Map.empty[Int, ObjStm.Loaded]
  private var resolveDepth = 0

  /** Load object `num` through the xref (cached). */
  def obj(num: Int): PdfObj = objCache.getOrElseUpdate(num, loadObj(num))

  private def loadObj(num: Int): PdfObj = xref.get(num) match {
    case Some(InFile(off)) if off >= 0 && off < bytes.length =>
      parseIndirectAt(off.toInt, num)
    case Some(InObjStm(stmNum, idx)) =>
      val loaded = objStmCache.getOrElseUpdate(stmNum, {
        obj(stmNum) match {
          case s: PStream => ObjStm.load(s, resolve, inflater)
          case _ => ObjStm.Loaded(Array.empty, Array.empty, Array.empty, 0)
        }
      })
      val byIdx = loaded.objAt(idx)
      // tolerate writers whose /Index position drifted: fall back to num scan
      byIdx match {
        case PNull => loaded.objByNum(num)
        case o => o
      }
    case Some(Free) => PNull // deleted by an incremental update (§7.5.4)
    case _ => PNull
  }

  /** Parse `n g obj … endobj` at a byte offset. Verifies the header
    * object number when possible; on mismatch, falls back to a
    * whole-file reconstruction entry (wrong-offset tolerance).
    */
  private def parseIndirectAt(off: Int, expectNum: Int): PdfObj = {
    val lx = new Lexer(bytes, off, bytes.length)
    val save = lx.pos
    (lx.next(), lx.next(), lx.next()) match {
      case (Tok.TInt(n), Tok.TInt(g), Tok.TKw("obj")) =>
        if (n.toInt != expectNum) {
          // stale offset — try reconstruction map once
          reconMap.get(expectNum) match {
            case Some(InFile(o2)) if o2.toInt != off =>
              return parseIndirectAt(o2.toInt, expectNum)
            case _ => () // parse what's here anyway
          }
        }
        // Decrypt with the key of the object that is ACTUALLY here (its
        // own header num/gen) — using expectNum on a stale-offset
        // fallback silently garbles strings/streams instead of failing
        // typed (ADVICE r3 #3). For matching headers this is identical.
        maybeDecrypt(n.toInt, g.toInt, new ObjParser(lx, resolveLength).parseObj())
      case _ =>
        lx.pos = save
        reconMap.get(expectNum) match {
          case Some(InFile(o2)) if o2.toInt != off => parseIndirectAt(o2.toInt, expectNum)
          case _ => PNull
        }
    }
  }

  private lazy val reconMap: Map[Int, Entry] = XrefWalk.reconstruct(bytes)

  /** /Length resolver for streams (may be an indirect ref, §7.3.8.1). */
  private val resolveLength: PdfObj => Option[Long] = {
    case PRef(n, _) =>
      if (resolveDepth > 8) None
      else {
        resolveDepth += 1
        try int(obj(n)) finally resolveDepth -= 1
      }
    case o => int(o)
  }

  /** Object number of the /Encrypt dict — its own strings (/O, /U)
    * stay plaintext (§7.6.2), as does the trailer (/ID).
    */
  private val encObjNum: Int = trailer.get("Encrypt") match {
    case Some(PRef(n, _)) => n
    case _ => -1
  }

  /** Standard-security-handler decryptor, built from the /Encrypt dict
    * with the EMPTY user password (ISO 32000-1 §7.6.3 — the common
    * "owner password only" crawl case). Null when the file is not
    * encrypted. Non-decryptable files stay typed error rows:
    * `encrypted:password` / `encrypted:unsupported` / `encrypted`.
    *
    * Initialized AFTER objCache/resolveLength (the /Encrypt dict loads
    * through the normal object path with `crypt` still null, i.e.
    * undecrypted — which is exactly what §7.6.2 requires for it).
    */
  private val crypt: Crypt.StdDecryptor = trailer.get("Encrypt") match {
    case None => null
    case Some(e) =>
      val encDict = dictOf(e)
      if (encDict.m.isEmpty) throw new PdfLoadException("encrypted")
      val firstId: Array[Byte] = trailer.get("ID").map(resolve) match {
        case Some(PArray(items)) if items.nonEmpty => resolve(items.head) match {
          case PString(b) => b
          case _ => Array.empty[Byte]
        }
        case _ => Array.empty[Byte]
      }
      Crypt.forDocument(encDict, resolve, firstId) match {
        case Right(dec) =>
          // anything cached while resolving /Encrypt was parsed plaintext
          objCache.clear(); objStmCache.clear()
          dec
        case Left(tag) => throw new PdfLoadException(tag)
      }
  }

  /** Decrypt strings/streams of a just-parsed top-level indirect object
    * (objects inside ObjStms are NOT individually encrypted — their
    * container stream was, §7.5.7).
    */
  private def maybeDecrypt(num: Int, gen: Int, o: PdfObj): PdfObj =
    if (crypt == null || num == encObjNum) o else crypt.decryptObj(num, gen, o)

  /** Chase indirect references to a direct object (cycle-bounded). */
  def resolve(o: PdfObj): PdfObj = {
    var cur = o
    var hops = 0
    while (hops < 32) {
      cur match {
        case PRef(n, _) => cur = obj(n); hops += 1
        case other => return other
      }
    }
    PNull
  }

  def dictOf(o: PdfObj): PDict = resolve(o) match {
    case d: PDict => d
    case PStream(d, _) => d
    case _ => Empty
  }

  /** Decode a stream object through its filter chain. */
  def decodeStream(s: PStream): Array[Byte] =
    Filters.decode(s.dict, s.raw, resolve, inflater)

  // --- Page tree (§7.7.3) ---------------------------------------------

  /** A leaf page with inherited attributes resolved (§7.7.3.4). */
  final case class Page(dict: PDict, resources: PDict, mediaBox: Vector[Double], rotate: Int)

  /** Leaf pages in page-tree order, /Resources //MediaBox //Rotate
    * inherited down intermediate /Pages nodes.
    */
  lazy val pages: Vector[Page] = {
    val root = dictOf(trailer.get("Root").getOrElse(PNull))
    val pagesRoot = root.get("Pages").getOrElse(PNull)
    val out = Vector.newBuilder[Page]
    val visited = mutable.Set.empty[PdfObj]
    def walk(node: PdfObj, inhRes: PDict, inhBox: Vector[Double], inhRot: Int, depth: Int): Unit = {
      if (depth > 64 || visited.contains(node)) return
      node match { case r: PRef => visited += r; case _ => () }
      val d = dictOf(node)
      val res = d.get("Resources").map(dictOf).filter(_.m.nonEmpty).getOrElse(inhRes)
      val box = d.get("MediaBox").map(resolve) match {
        case Some(PArray(items)) if items.size == 4 =>
          items.flatMap(i => num(resolve(i)))
        case _ => inhBox
      }
      val rot = d.get("Rotate").map(resolve).flatMap(int).map(_.toInt).getOrElse(inhRot)
      resolve(d.get("Type").getOrElse(PNull)) match {
        case PName("Pages") | PNull =>
          d.get("Kids").map(resolve) match {
            case Some(PArray(kids)) => kids.foreach(walk(_, res, box, rot, depth + 1))
            case _ =>
              // missing /Type but no /Kids: treat as a leaf if it has /Contents
              if (d.get("Contents").isDefined)
                out += Page(d, res, box, rot)
          }
        case PName("Page") => out += Page(d, res, box, rot)
        case _ => ()
      }
    }
    walk(pagesRoot, Empty, Vector(0, 0, 612, 792), 0, 0)
    out.result()
  }

  /** Page content: /Contents stream or array of streams — concatenated
    * with a single space between parts (§7.8.2).
    */
  def pageContent(p: Page): Array[Byte] = {
    def streamBytes(o: PdfObj): Array[Byte] = resolve(o) match {
      case s: PStream => decodeStream(s)
      case _ => Array.empty[Byte]
    }
    p.dict.get("Contents").map(resolve) match {
      case Some(s: PStream) => decodeStream(s)
      case Some(PArray(items)) =>
        val parts = items.map(streamBytes)
        if (parts.isEmpty) Array.empty[Byte]
        else {
          val total = parts.map(_.length).sum + (parts.size - 1)
          val out = new Array[Byte](total)
          var pos = 0
          var i = 0
          while (i < parts.size) {
            System.arraycopy(parts(i), 0, out, pos, parts(i).length)
            pos += parts(i).length
            if (i < parts.size - 1) { out(pos) = ' '; pos += 1 }
            i += 1
          }
          out
        }
      case _ => Array.empty[Byte]
    }
  }
}
