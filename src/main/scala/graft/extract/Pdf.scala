package graft.extract

import java.util.zip.Inflater

/** PDF text extraction — the engine's arm for the reference's
  * `process_pdf` (tools/file_parser.py:53-61, pypdf): page texts are
  * extracted in page-tree order and concatenated with NO separator
  * (`text += page.extract_text()`).
  *
  * This is an original, pure-JDK implementation of the classic-PDF subset
  * a text pipeline meets: sequential body objects (`N G obj ... endobj`),
  * direct or indirect /Length, /FlateDecode (zlib, `java.util.zip.Inflater`)
  * or unfiltered content streams, literal `(...)`/hex `<...>` strings with
  * the full escape table, and the text-showing operators.
  *
  * Documented extraction semantics (pypdf-shaped, pinned by FileParserSpec
  * vectors rather than byte-parity — pypdf is a positioning heuristic):
  *   - Tj, ', " and the strings inside TJ arrays append decoded text
  *   - a line-move operator (Td, TD, T*, Tm) between shows inserts '\n';
  *     ' and " imply the line move themselves
  *   - TJ kerning numbers are ignored (no space-guess heuristic)
  *   - string bytes decode as Latin-1 (PDFDocEncoding's printable range;
  *     the engine's corpora are byte-clean web text)
  *   - a non-empty page ends with '\n' (pypdf layout-mode terminates the
  *     last line); pages concatenate bare, per the reference loop
  * Unsupported (fail-loud): encrypted files, object/xref streams
  * (PDF 1.5+ cross-reference streams), non-Flate filters.
  */
object Pdf extends Serializable {

  // ---- object model ------------------------------------------------------

  sealed trait Obj
  final case class PNum(v: Double) extends Obj
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  case object PNull extends Obj
  final case class PBool(v: Boolean) extends Obj

  // ---- public API --------------------------------------------------------

  def extract(pdf: Array[Byte]): String = {
    if (pdf.length < 5 || !startsWith(pdf, 0, "%PDF-"))
      throw new IllegalArgumentException("pdf: missing %PDF- header")
    val objs = parseObjects(pdf)
    val pages = pageOrder(objs)
    val sb = new java.lang.StringBuilder()
    pages.foreach { page =>
      val content = contentBytes(page, objs)
      sb.append(extractContentText(content))
    }
    sb.toString
  }

  /** Per-page text of a decoded content stream (exposed for tests). */
  def extractContentText(content: Array[Byte]): String = {
    val lex = new Lexer(content)
    val out = new java.lang.StringBuilder()
    val operands = scala.collection.mutable.ArrayBuffer.empty[Obj]
    var breakPending = false
    def show(bytes: Array[Byte]): Unit = {
      if (breakPending && out.length > 0) out.append('\n')
      breakPending = false
      out.append(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    var tok = lex.nextToken()
    while (tok != null) {
      tok match {
        case OpTok(op) =>
          op match {
            case "Tj" => operands.lastOption.foreach {
              case PStr(b) => show(b); case _ => }
            case "'" =>
              breakPending = true
              operands.lastOption.foreach { case PStr(b) => show(b); case _ => }
            case "\"" =>
              breakPending = true
              operands.lastOption.foreach { case PStr(b) => show(b); case _ => }
            case "TJ" => operands.lastOption.foreach {
              case PArr(items) => items.foreach {
                case PStr(b) => show(b); case _ => }
              case _ => }
            case "Td" | "TD" | "T*" | "Tm" => breakPending = true
            case _ =>
          }
          operands.clear()
        case ObjTok(o) => operands += o
      }
      tok = lex.nextToken()
    }
    if (out.length > 0 && out.charAt(out.length - 1) != '\n') out.append('\n')
    out.toString
  }

  // ---- document structure ------------------------------------------------

  /** Sequential body scan: every `N G obj ... endobj`. Stream bodies are
    * skipped via /Length (or an `endstream` search when Length is
    * indirect), so binary payloads can't fake object boundaries.
    */
  private[extract] def parseObjects(pdf: Array[Byte]): Map[Int, Obj] = {
    val out = Map.newBuilder[Int, Obj]
    val lex = new Lexer(pdf)
    var found = 0
    var n = lex.nextObjHeader()
    while (n >= 0) {
      val obj = lex.parseObject()
      val withStream = if (lex.peekKeyword("stream")) {
        val dict = obj match {
          case d: PDict => d
          case _ => throw new IllegalArgumentException("pdf: stream without dict")
        }
        val raw = lex.readStreamBody(dict.m.get("Length"))
        PStream(dict, raw)
      } else obj
      lex.skipKeyword("endobj")
      out += n -> withStream
      found += 1
      n = lex.nextObjHeader()
    }
    if (found == 0)
      throw new IllegalArgumentException("pdf: no body objects found " +
        "(object/xref streams are not supported)")
    out.result()
  }

  private def resolve(o: Obj, objs: Map[Int, Obj]): Obj = o match {
    case PRef(n, _) => objs.getOrElse(n,
      throw new IllegalArgumentException(s"pdf: dangling reference $n 0 R"))
    case other => other
  }

  /** Page objects in page-tree order from the catalog (the object with
    * /Type /Catalog — robust to both classic and appended xref tables).
    */
  private def pageOrder(objs: Map[Int, Obj]): Vector[PDict] = {
    val catalog = objs.values.collectFirst {
      case d @ PDict(m) if m.get("Type").contains(PName("Catalog")) => d
    }.getOrElse(throw new IllegalArgumentException("pdf: no /Catalog object"))
    val rootPages = resolve(catalog.m.getOrElse("Pages",
      throw new IllegalArgumentException("pdf: catalog missing /Pages")), objs)
    val out = Vector.newBuilder[PDict]
    def walk(node: Obj, depth: Int): Unit = {
      if (depth > 64)
        throw new IllegalArgumentException("pdf: page tree too deep (cycle?)")
      resolve(node, objs) match {
        case d @ PDict(m) =>
          m.get("Type") match {
            case Some(PName("Page")) => out += d
            case _ =>
              m.get("Kids") match {
                case Some(k) => resolve(k, objs) match {
                  case PArr(kids) => kids.foreach(walk(_, depth + 1))
                  case _ => throw new IllegalArgumentException("pdf: /Kids not an array")
                }
                case None =>
                  throw new IllegalArgumentException("pdf: pages node without /Kids")
              }
          }
        case _ => throw new IllegalArgumentException("pdf: bad page tree node")
      }
    }
    walk(rootPages, 0)
    out.result()
  }

  /** Decoded, concatenated content for one page (/Contents may be one
    * stream or an array of streams).
    */
  private def contentBytes(page: PDict, objs: Map[Int, Obj]): Array[Byte] = {
    val content = page.m.get("Contents")
      .getOrElse(return Array.emptyByteArray)
    val streams = resolve(content, objs) match {
      case s: PStream => Vector(s)
      case PArr(items) => items.map(i => resolve(i, objs) match {
        case s: PStream => s
        case _ => throw new IllegalArgumentException("pdf: /Contents item not a stream")
      })
      case _ => throw new IllegalArgumentException("pdf: /Contents not a stream")
    }
    val buf = new java.io.ByteArrayOutputStream()
    streams.foreach { s => buf.write(decodeStream(s, objs)); buf.write('\n') }
    buf.toByteArray
  }

  private def decodeStream(s: PStream, objs: Map[Int, Obj]): Array[Byte] = {
    val filters = s.dict.m.get("Filter").map(f => resolve(f, objs)) match {
      case None => Vector.empty
      case Some(PName(n)) => Vector(n)
      case Some(PArr(fs)) => fs.map {
        case PName(n) => n
        case _ => throw new IllegalArgumentException("pdf: bad /Filter entry")
      }
      case Some(_) => throw new IllegalArgumentException("pdf: bad /Filter")
    }
    filters.foldLeft(s.raw) { (bytes, f) =>
      f match {
        case "FlateDecode" => inflate(bytes)
        case other => throw new IllegalArgumentException(
          s"pdf: unsupported filter /$other (FlateDecode only)")
      }
    }
  }

  private[extract] def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 << 10)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("pdf: truncated Flate stream")
        out.write(buf, 0, n)
        if (out.size > ZipArchive.MaxEntryBytes)
          throw new IllegalArgumentException("pdf: Flate stream exceeds size cap")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"pdf: bad Flate data: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(at + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  // ---- lexer -------------------------------------------------------------

  private[extract] sealed trait Token
  private[extract] final case class ObjTok(o: Obj) extends Token
  private[extract] final case class OpTok(op: String) extends Token

  /** COS-syntax lexer/parser over a byte window. Handles comments, the
    * delimiter set, literal-string escapes (incl. octal and line
    * continuations), hex strings, dicts, arrays, and `N G R` references.
    */
  private[extract] final class Lexer(b: Array[Byte]) {
    private var pos = 0

    private def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def isDelim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos) & 0xFF
        if (isWs(c)) pos += 1
        else if (c == '%') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    /** Advance to the next `N G obj` header; -1 when none remain. */
    def nextObjHeader(): Int = {
      while (pos < b.length) {
        skipWs()
        val mark = pos
        val n = tryInt()
        if (n >= 0) {
          skipWs()
          val g = tryInt()
          if (g >= 0) {
            skipWs()
            if (matchKeyword("obj")) return n
          }
          pos = mark + 1
        } else {
          // skip a token-ish run; stop scanning at xref/trailer
          if (matchKeyword("xref") || matchKeyword("trailer") ||
              matchKeyword("startxref")) {
            // keep scanning — updated files may append more body objects
            ()
          } else pos += 1
        }
      }
      -1
    }

    private def tryInt(): Int = {
      val start = pos
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) { pos = start; return -1 }
      }
      if (!any) { pos = start; -1 } else v.toInt
    }

    private def matchKeyword(kw: String): Boolean = {
      skipWs()
      if (startsWithAt(kw) &&
          (pos + kw.length >= b.length ||
            isWs(b(pos + kw.length) & 0xFF) || isDelim(b(pos + kw.length) & 0xFF))) {
        pos += kw.length; true
      } else false
    }

    private def startsWithAt(s: String): Boolean = {
      if (pos + s.length > b.length) return false
      var i = 0
      while (i < s.length) {
        if (b(pos + i) != s.charAt(i).toByte) return false
        i += 1
      }
      true
    }

    def peekKeyword(kw: String): Boolean = {
      val mark = pos
      val r = matchKeyword(kw)
      pos = mark
      r
    }

    def skipKeyword(kw: String): Unit =
      if (!matchKeyword(kw))
        throw new IllegalArgumentException(
          s"pdf: expected '$kw' at offset $pos")

    /** After a stream dict: consume `stream` EOL, the body, `endstream`. */
    def readStreamBody(length: Option[Obj]): Array[Byte] = {
      skipKeyword("stream")
      if (pos < b.length && b(pos) == '\r') pos += 1
      if (pos < b.length && b(pos) == '\n') pos += 1
      val start = pos
      val end = length match {
        case Some(PNum(n)) if n >= 0 && start + n.toInt <= b.length =>
          start + n.toInt
        case _ =>
          // indirect or missing /Length: scan for the endstream keyword
          // (EOL-preceded, so the 9-byte substring inside binary Flate
          // data cannot terminate the stream early)
          val idx = indexOfKeywordAfterEol("endstream", start)
          if (idx < 0)
            throw new IllegalArgumentException("pdf: unterminated stream")
          // trailing EOL before endstream belongs to the marker, not data
          var e = idx
          if (e > start && b(e - 1) == '\n') e -= 1
          if (e > start && b(e - 1) == '\r') e -= 1
          e
      }
      val body = java.util.Arrays.copyOfRange(b, start, end)
      pos = end
      skipWs()
      skipKeyword("endstream")
      body
    }

    /** First occurrence of `kw` preceded by an EOL byte (the spec requires
      * an EOL before `endstream`); a raw substring match inside stream
      * bytes without the boundary does not qualify.
      */
    private def indexOfKeywordAfterEol(kw: String, from: Int): Int = {
      var i = math.max(from, 1)
      val limit = b.length - kw.length
      while (i <= limit) {
        var j = 0
        var ok = b(i - 1) == '\n' || b(i - 1) == '\r'
        while (ok && j < kw.length) {
          if (b(i + j) != kw.charAt(j).toByte) ok = false
          j += 1
        }
        if (ok) return i
        i += 1
      }
      -1
    }

    /** One object: number/string/name/dict/array/ref/bool/null. */
    def parseObject(): Obj = {
      skipWs()
      if (pos >= b.length)
        throw new IllegalArgumentException("pdf: unexpected EOF")
      (b(pos) & 0xFF) match {
        case '<' if pos + 1 < b.length && b(pos + 1) == '<' => parseDict()
        case '<' => parseHexString()
        case '(' => parseLiteralString()
        case '/' => parseName()
        case '[' => parseArray()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ =>
          if (matchKeyword("true")) PBool(true)
          else if (matchKeyword("false")) PBool(false)
          else if (matchKeyword("null")) PNull
          else throw new IllegalArgumentException(
            s"pdf: unexpected byte '${(b(pos) & 0xFF).toChar}' at $pos")
      }
    }

    /** Content-stream token: an operand object or an operator keyword. */
    def nextToken(): Token = {
      skipWs()
      if (pos >= b.length) return null
      val c = b(pos) & 0xFF
      if (c == '<' || c == '(' || c == '/' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        ObjTok(parseObject())
      } else if (c == ']' || c == '>' || c == '}' || c == ')') {
        pos += 1 // stray delimiter in a malformed stream: skip
        nextToken()
      } else {
        val start = pos
        while (pos < b.length && !isWs(b(pos) & 0xFF) && !isDelim(b(pos) & 0xFF))
          pos += 1
        if (pos == start) { pos += 1; return nextToken() }
        val kw = new String(b, start, pos - start,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        kw match {
          case "true" => ObjTok(PBool(true))
          case "false" => ObjTok(PBool(false))
          case "null" => ObjTok(PNull)
          case "{" | "}" => nextToken()
          case op => OpTok(op)
        }
      }
    }

    private def parseDict(): PDict = {
      pos += 2 // <<
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (!(pos + 1 < b.length && b(pos) == '>' && b(pos + 1) == '>')) {
        val key = parseObject() match {
          case PName(n) => n
          case other => throw new IllegalArgumentException(
            s"pdf: dict key is not a name: $other")
        }
        m += key -> parseObject()
        skipWs()
        if (pos >= b.length)
          throw new IllegalArgumentException("pdf: unterminated dictionary")
      }
      pos += 2
      PDict(m.result())
    }

    private def parseArray(): PArr = {
      pos += 1 // [
      val items = Vector.newBuilder[Obj]
      skipWs()
      while (pos < b.length && b(pos) != ']') {
        items += parseObject()
        skipWs()
      }
      if (pos >= b.length)
        throw new IllegalArgumentException("pdf: unterminated array")
      pos += 1
      PArr(items.result())
    }

    private def parseName(): PName = {
      pos += 1 // /
      val sb = new java.lang.StringBuilder()
      while (pos < b.length && !isWs(b(pos) & 0xFF) && !isDelim(b(pos) & 0xFF)) {
        val c = b(pos) & 0xFF
        if (c == '#' && pos + 2 < b.length) {
          val hex = Character.digit(b(pos + 1), 16) * 16 +
            Character.digit(b(pos + 2), 16)
          if (hex >= 0) { sb.append(hex.toChar); pos += 3 }
          else { sb.append(c.toChar); pos += 1 }
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseNumberOrRef(): Obj = {
      val mark = pos
      val num = parseNumber()
      // `N G R` reference lookahead (both must be non-negative integers)
      if (num.v >= 0 && num.v == scala.math.floor(num.v)) {
        val afterNum = pos
        skipWs()
        val g = tryInt()
        if (g >= 0) {
          skipWs()
          if (pos < b.length && b(pos) == 'R' &&
              (pos + 1 >= b.length || isWs(b(pos + 1) & 0xFF) ||
                isDelim(b(pos + 1) & 0xFF))) {
            pos += 1
            return PRef(num.v.toInt, g)
          }
        }
        pos = afterNum
      }
      pos = pos.max(mark) // defensive; parseNumber always advances
      num
    }

    private def parseNumber(): PNum = {
      val start = pos
      if (pos < b.length && (b(pos) == '+' || b(pos) == '-')) pos += 1
      var seen = false
      while (pos < b.length &&
             ((b(pos) >= '0' && b(pos) <= '9') || b(pos) == '.')) {
        seen = true; pos += 1
      }
      if (!seen)
        throw new IllegalArgumentException(s"pdf: bad number at $start")
      PNum(new String(b, start, pos - start,
        java.nio.charset.StandardCharsets.ISO_8859_1).toDouble)
    }

    private def parseLiteralString(): PStr = {
      pos += 1 // (
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (pos >= b.length)
          throw new IllegalArgumentException("pdf: unterminated string")
        val c = b(pos) & 0xFF
        c match {
          case '(' => depth += 1; out.write(c); pos += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(c)
            pos += 1
          case '\\' =>
            pos += 1
            if (pos >= b.length)
              throw new IllegalArgumentException("pdf: dangling escape")
            val e = b(pos) & 0xFF
            e match {
              case 'n' => out.write('\n'); pos += 1
              case 'r' => out.write('\r'); pos += 1
              case 't' => out.write('\t'); pos += 1
              case 'b' => out.write('\b'); pos += 1
              case 'f' => out.write('\f'); pos += 1
              case '(' => out.write('('); pos += 1
              case ')' => out.write(')'); pos += 1
              case '\\' => out.write('\\'); pos += 1
              case '\r' =>
                pos += 1 // line continuation
                if (pos < b.length && b(pos) == '\n') pos += 1
              case '\n' => pos += 1 // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = 0
                var k = 0
                while (k < 3 && pos < b.length &&
                       b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other); pos += 1 // \x -> x
            }
          case '\r' =>
            // EOL inside a string is a single LF (PDF 7.3.4.2)
            out.write('\n'); pos += 1
            if (pos < b.length && b(pos) == '\n') pos += 1
          case _ => out.write(c); pos += 1
        }
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      pos += 1 // <
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (pos >= b.length)
          throw new IllegalArgumentException("pdf: unterminated hex string")
        val c = b(pos) & 0xFF
        if (c == '>') { done = true; pos += 1 }
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { out.write(hi * 16 + d); hi = -1 }
          } else if (!isWs(c))
            throw new IllegalArgumentException(
              s"pdf: bad hex digit '${c.toChar}'")
          pos += 1
        }
      }
      if (hi >= 0) out.write(hi * 16) // odd count: final digit padded with 0
      PStr(out.toByteArray)
    }
  }
}
