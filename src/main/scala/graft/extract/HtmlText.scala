package graft.extract

/** JVM re-implementation of the reference's HTML text extraction
  * (`/root/reference/src/retrievals/tools/file_parser.py:213-227`):
  *
  *   BeautifulSoup(html, 'html.parser').text
  *   then text.replace('\n\n\n','\n').replace('\n\n','\n').replace('  ',' ')
  *
  * Target semantics = CPython html.parser (convert_charrefs=True) driving
  * bs4 >= 4.9 (the contemporary release for the reference snapshot; bs4 is
  * an unpinned optional import there):
  *   - `.text` concatenates plain NavigableStrings in document order with no
  *     separator;
  *   - strings inside <script>/<style> (html.parser CDATA elements) become
  *     Script/Stylesheet containers and are EXCLUDED, as are strings whose
  *     direct parent is <template> (TemplateString), comments, doctype/
  *     declarations, processing instructions and marked sections;
  *   - character/entity references in data are decoded exactly like
  *     html.unescape (full HTML5 table incl. legacy no-semicolon names,
  *     windows-1252 numeric remapping, invalid-codepoint removal);
  *   - html.parser error tolerance: bare '<' as data, bogus comments,
  *     unterminated constructs at EOF re-emitted as data (except inside
  *     CDATA elements, where the tail is dropped);
  *   - bs4 auto-closes known HTML void elements, and an unmatched end tag
  *     pops the whole open-tag stack (bs4 _popToTag semantics).
  *
  * The three trailing replaces are single-pass, left-to-right, literal —
  * Python str.replace and java.lang.String.replace agree on this; a regex
  * or fixpoint loop would NOT be byte-identical.
  */
object HtmlText extends Serializable {

  /** CPython _markupbase raises AssertionError for malformed/unknown marked
    * sections; bs4 propagates it and the reference's FileParser.read catches
    * ANY exception and returns text '' (file_parser.py:218-221). This
    * private signal reproduces that whole-page failure mode.
    */
  private final class ParseFailure extends RuntimeException

  // bs4 HTMLTreeBuilder.empty_element_tags
  private val emptyElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "keygen",
    "link", "menuitem", "meta", "param", "source", "track", "wbr",
    "basefont", "bgsound", "command", "frame", "image", "isindex",
    "nextid", "spacer")

  private val cdataElements: Set[String] = Set("script", "style")

  @inline private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isNameChar(c: Char): Boolean =
    !(c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == ' ' ||
      c == '/' || c == '>' || c == '\u0000')

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  // ---- html.unescape parity ---------------------------------------------

  /** Decode character references exactly like CPython html.unescape. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val decoded = decodeCharref(s, i, out)
        if (decoded > i) i = decoded
        else { out.append('&'); i += 1 }
      }
    }
    out.toString
  }

  /** Attempt to decode a charref at position i (s(i)=='&'); appends the
    * replacement and returns the new position, or returns i if no match.
    */
  private def decodeCharref(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    if (i + 1 >= n) return i
    if (s.charAt(i + 1) == '#') {
      // numeric: &#[0-9]+;? or &#[xX][0-9a-fA-F]+;?
      var j = i + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val digitsStart = j
      while (j < n && isDigitIn(s.charAt(j), hex)) j += 1
      if (j == digitsStart) return i // no digits -> no match
      // parse with overflow clamp (anything > 0x10FFFF is invalid anyway)
      var num = 0L
      var k = digitsStart
      while (k < j) {
        if (num <= 0x110000L)
          num = num * (if (hex) 16 else 10) + Character.digit(s.charAt(k), if (hex) 16 else 10)
        k += 1
      }
      if (j < n && s.charAt(j) == ';') j += 1
      val cp = num
      HtmlEntities.invalidCharrefs.get(cp.toInt) match {
        case Some(rep) => out.append(rep)
        case None =>
          if ((cp >= 0xD800 && cp <= 0xDFFF) || cp > 0x10FFFF) out.append('\uFFFD')
          else if (HtmlEntities.invalidCodepoints.contains(cp.toInt)) ()
          else out.appendCodePoint(cp.toInt)
      }
      j
    } else {
      // named: [^\t\n\f <&#;]{1,32};?
      var j = i + 1
      val limit = math.min(n, i + 1 + 32)
      while (j < limit && !isNamedExcluded(s.charAt(j))) j += 1
      if (j == i + 1) return i // zero-length -> no match
      var group = s.substring(i + 1, j)
      if (j < n && s.charAt(j) == ';') { group = group + ";"; j += 1 }
      HtmlEntities.html5.get(group) match {
        case Some(v) => out.append(v); j
        case None =>
          // longest matching prefix of length >= 2 (CPython range(len-1,1,-1))
          var x = group.length - 1
          while (x >= 2) {
            HtmlEntities.html5.get(group.substring(0, x)) match {
              case Some(v) =>
                out.append(v).append(group.substring(x))
                return j
              case None => x -= 1
            }
          }
          out.append('&').append(group)
          j
      }
    }
  }

  @inline private def isDigitIn(c: Char, hex: Boolean): Boolean =
    if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    else c >= '0' && c <= '9'

  @inline private def isNamedExcluded(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\f' || c == ' ' || c == '<' ||
      c == '&' || c == '#' || c == ';'

  // ---- parser / .text ----------------------------------------------------

  /** BeautifulSoup(html, 'html.parser').text parity. */
  def soupText(html: String): String = {
    val s = html
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var stack = List.empty[String]
    var cdata: String = null // current CDATA element name, or null
    var i = 0

    @inline def parentExcludes: Boolean =
      stack.nonEmpty && stack.head == "template"

    def emitData(from: Int, until: Int): Unit =
      if (until > from && !parentExcludes)
        out.append(unescape(s.substring(from, until)))

    def popToTag(name: String): Unit = {
      // bs4 _popToTag: pops while searching; unmatched name empties the stack
      var st = stack
      var found = false
      while (st.nonEmpty && !found) {
        if (st.head == name) { st = st.tail; found = true }
        else st = st.tail
      }
      stack = if (found) st else Nil
    }

    /** goahead's incomplete-construct fallback at EOF (close()): emit
      * rawdata[lt:k] as (unescaped) data where k is just past the next '>'
      * from lt+1, else the next '<', else lt+1 — then CONTINUE parsing at k
      * (html.parser re-enters the loop; the remainder may hold real markup).
      */
    def bogusEof(lt: Int): Int = {
      val gt = s.indexOf('>', lt + 1)
      val k =
        if (gt >= 0) gt + 1
        else {
          val lt2 = s.indexOf('<', lt + 1)
          if (lt2 >= 0) lt2 else lt + 1
        }
      emitData(lt, k)
      k
    }

    while (i < n) {
      if (cdata != null) {
        // scan for </\s*name (case-insensitive)
        var close = -1
        var j = s.indexOf('<', i)
        while (close < 0 && j >= 0 && j + 1 < n) {
          if (s.charAt(j + 1) == '/') {
            var k = j + 2
            while (k < n && isWs(s.charAt(k))) k += 1
            if (k + cdata.length <= n &&
              s.regionMatches(true, k, cdata, 0, cdata.length)) close = j
          }
          if (close < 0) j = s.indexOf('<', j + 1)
        }
        if (close < 0) {
          // unterminated CDATA: html.parser drops the tail at EOF
          i = n
        } else {
          // content excluded (Script/Stylesheet); parse the end tag
          val gt = s.indexOf('>', close)
          if (gt < 0) { i = n } // dangling close fragment at EOF: dropped too
          else {
            popToTag(cdata)
            cdata = null
            i = gt + 1
          }
        }
      } else {
        val lt = s.indexOf('<', i)
        if (lt < 0) { emitData(i, n); i = n }
        else {
          emitData(i, lt)
          i = lt
          if (lt + 1 >= n) { emitData(lt, n); i = n } // lone '<' at EOF -> data
          else {
            val c1 = s.charAt(lt + 1)
            if (isNameStart(c1)) {
              i = parseStartTag(s, lt, onOpen = (name, selfClosing) => {
                if (!emptyElements.contains(name) && !selfClosing) {
                  stack = name :: stack
                  if (cdataElements.contains(name)) cdata = name
                }
              })
              if (i < 0) i = bogusEof(lt) // unterminated at EOF
            } else if (c1 == '/') {
              i = parseEndTag(s, lt, name => popToTag(name))
              if (i < 0) i = bogusEof(lt)
            } else if (s.startsWith("<!--", lt)) {
              val end = s.indexOf("-->", lt + 4)
              if (end < 0) i = bogusEof(lt)
              else i = end + 3
            } else if (s.startsWith("<![", lt)) {
              // marked section: close pattern depends on the section name
              // (parse_marked_section); malformed/unknown names FAIL the page
              val close = parseMarkedSection(s, lt)
              if (close < 0) i = bogusEof(lt) else i = close
            } else if (c1 == '!') {
              val gt = s.indexOf('>', lt + 2)
              if (gt < 0) i = bogusEof(lt) else i = gt + 1
            } else if (c1 == '?') {
              val gt = s.indexOf('>', lt + 2)
              if (gt < 0) i = bogusEof(lt) else i = gt + 1
            } else {
              // bare '<' treated as data
              if (!parentExcludes) out.append('<')
              i = lt + 1
            }
          }
        }
      }
    }
    out.toString
  }

  /** Parse a start tag at s(lt)=='<'; returns the index after '>' or -1 if
    * unterminated. Calls onOpen(name, selfClosing) when complete.
    */
  private def parseStartTag(s: String, lt: Int,
                            onOpen: (String, Boolean) => Unit): Int = {
    val n = s.length
    var j = lt + 1
    val nameStart = j
    j += 1
    while (j < n && isNameChar(s.charAt(j))) j += 1
    val name = s.substring(nameStart, j).toLowerCase
    // attributes until '>' with quote awareness
    while (j < n) {
      val c = s.charAt(j)
      if (c == '>') { onOpen(name, false); return j + 1 }
      if (c == '/' && j + 1 < n && s.charAt(j + 1) == '>') {
        onOpen(name, true); return j + 2
      }
      if (c == '"' || c == '\'') {
        val close = s.indexOf(c, j + 1)
        if (close < 0) return -1
        j = close + 1
      } else j += 1
    }
    -1
  }

  /** Parse an end tag at s(lt..lt+1)=="</"; returns index after '>' or -1.
    * Calls onClose(name) for a named end tag; `</>` consumes 3 chars; other
    * bogus end tags are skipped to '>'.
    */
  private def parseEndTag(s: String, lt: Int, onClose: String => Unit): Int = {
    val n = s.length
    var j = lt + 2
    while (j < n && isWs(s.charAt(j))) j += 1
    if (j < n && isNameStart(s.charAt(j))) {
      val nameStart = j
      j += 1
      while (j < n && isNameChar(s.charAt(j))) j += 1
      val name = s.substring(nameStart, j).toLowerCase
      val gt = s.indexOf('>', j)
      if (gt < 0) return -1
      onClose(name)
      gt + 1
    } else if (s.startsWith("</>", lt)) lt + 3
    else {
      // bogus comment: content to '>'
      val gt = s.indexOf('>', lt + 2)
      if (gt < 0) -1 else gt + 1
    }
  }

  // _markupbase.parse_marked_section name classes
  private val stdSections = Set("temp", "cdata", "ignore", "include", "rcdata")
  private val msSections = Set("if", "else", "endif")

  /** CPython `_markupbase.parse_marked_section` at s(lt..lt+2)=="<![":
    * scan the section name (`[a-zA-Z][-_.a-zA-Z0-9]*\s*`); CDATA-class names
    * close at the first `]\s*]\s*>`, MS-conditional names ("if"/"else"/
    * "endif") close at the first `]\s*>`, any other name (or a non-letter
    * where the name should start) raises — which fails the WHOLE page in the
    * reference (FileParser catches and returns ''). Returns the index after
    * the close, or -1 when incomplete at EOF (name or close runs off the
    * buffer — goahead's bogus-data fallback applies).
    */
  private def parseMarkedSection(s: String, lt: Int): Int = {
    val n = s.length
    val from = lt + 3
    if (from >= n) return -1 // _scan_name: i == n -> incomplete
    val c0 = s.charAt(from)
    if (!isNameStart(c0)) throw new ParseFailure // "expected name token"
    var j = from + 1
    while (j < n && (isNameStart(s.charAt(j)) || (s.charAt(j) >= '0' && s.charAt(j) <= '9') ||
      s.charAt(j) == '-' || s.charAt(j) == '_' || s.charAt(j) == '.')) j += 1
    val nameEnd = j
    while (j < n && isWs(s.charAt(j))) j += 1
    if (j == n) return -1 // name (incl. trailing ws) hits buffer end -> incomplete
    val name = s.substring(from, nameEnd).toLowerCase
    if (stdSections.contains(name)) searchMarkedClose(s, from, doubleBracket = true)
    else if (msSections.contains(name)) searchMarkedClose(s, from, doubleBracket = false)
    else throw new ParseFailure // unknown status keyword
  }

  /** First match of `]\s*]\s*>` (doubleBracket) or `]\s*>` at/after `from`;
    * returns the index after '>' or -1.
    */
  private def searchMarkedClose(s: String, from: Int, doubleBracket: Boolean): Int = {
    val n = s.length
    var j = s.indexOf(']', from)
    while (j >= 0) {
      var k = j + 1
      while (k < n && isWs(s.charAt(k))) k += 1
      if (doubleBracket) {
        if (k < n && s.charAt(k) == ']') {
          var m = k + 1
          while (m < n && isWs(s.charAt(m))) m += 1
          if (m < n && s.charAt(m) == '>') return m + 1
        }
      } else if (k < n && s.charAt(k) == '>') return k + 1
      j = s.indexOf(']', j + 1)
    }
    -1
  }

  // ---- the reference's whitespace normalization ---------------------------

  /** The exact three literal single-pass replaces (file_parser.py:224-226). */
  def normalize(text: String): String =
    text.replace("\n\n\n", "\n").replace("\n\n", "\n").replace("  ", " ")

  /** Full extraction: soup.text + normalize — the byte-identical per-url
    * invariant of the north rule. A parser AssertionError (malformed marked
    * section) fails the whole page in the reference — FileParser.read
    * catches it and returns '' (file_parser.py:218-221), reproduced here.
    */
  def extract(html: String): String =
    try normalize(soupText(html))
    catch { case _: ParseFailure => "" }

  /** Extraction from raw page bytes (UTF-8, matching `open(path).read()`
    * with a UTF-8 locale).
    */
  def extractBytes(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))
}
