package graft.extract

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Shared StAX plumbing for the OOXML parts (docx/pptx/xlsx are XML inside
  * a ZIP container). Pure JDK (`javax.xml.stream`), streaming — one pass,
  * no DOM materialization, so a multi-MB part costs O(text) not O(tree).
  * DTDs and external entities are disabled (offline executors; XXE guard).
  */
object StaxXml {

  /** XMLInputFactory is not specified thread-safe for concurrent reader
    * creation; executors run many partitions per JVM, so the factory is
    * per-thread.
    */
  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  def reader(part: Array[Byte]): XMLStreamReader =
    factories.get().createXMLStreamReader(new ByteArrayInputStream(part))

  /** Run `f` over a streaming reader, always closing it; XML failures are
    * rethrown as IllegalArgumentException with the part name for fail-loud
    * dispatch (FileParser.read catches and reports, file_parser.py:220-222).
    */
  def withReader[A](part: Array[Byte], name: String)(f: XMLStreamReader => A): A = {
    val r =
      try reader(part)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"$name: bad XML: ${e.getMessage}")
      }
    try f(r)
    catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(s"$name: bad XML: ${e.getMessage}")
    } finally r.close()
  }
}

/** Word (.docx) text extraction — the engine's arm for the reference's
  * `process_word` (tools/file_parser.py:96-106, python-docx) and the
  * word branch of `FileParser.read` (file_parser.py:206-209, textract).
  *
  * Paragraph text follows python-docx `Paragraph.text`: the concatenation
  * of the paragraph's run text, where `<w:t>` contributes its character
  * data, `<w:tab/>` a TAB and `<w:br/>`/`<w:cr/>` a NEWLINE. The document
  * text is then the reference composition (file_parser.py:101-106): each
  * paragraph stripped, empties skipped, survivors emitted with a trailing
  * newline each.
  *
  * Only `word/document.xml` is read (body text; headers/footers/comments
  * are separate parts python-docx also ignores in `.paragraphs`).
  */
object Docx extends Serializable {

  private val WNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
  private val WNsStrict = "http://purl.oclc.org/ooxml/wordprocessingml/main"

  private def isW(ns: String): Boolean = ns == WNs || ns == WNsStrict

  /** Paragraph texts of word/document.xml, python-docx `Paragraph.text`
    * semantics, document order. Tables are traversed too (their cells
    * contain w:p paragraphs — matching textract's flat text, which the
    * reference's word branch uses).
    */
  def paragraphs(docx: Array[Byte]): Vector[String] = {
    val part = ZipArchive.entry(docx, "word/document.xml")
    StaxXml.withReader(part, "docx") { r =>
      val out = Vector.newBuilder[String]
      var para: java.lang.StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if isW(ns(r)) =>
            r.getLocalName match {
              case "p"          => para = new java.lang.StringBuilder()
              case "t"          => inT = para != null
              case "tab"        => if (para != null) para.append('\t')
              case "br" | "cr"  => if (para != null) para.append('\n')
              case _            =>
            }
          case XMLStreamConstants.END_ELEMENT if isW(ns(r)) =>
            r.getLocalName match {
              case "p" if para != null => out += para.toString; para = null
              case "t"                 => inT = false
              case _                   =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            para.append(r.getText)
          case _ =>
        }
      }
      out.result()
    }
  }

  private def ns(r: XMLStreamReader): String = {
    val u = r.getNamespaceURI
    if (u == null) "" else u
  }

  /** Reference `process_word`: stripped non-empty paragraphs, each followed
    * by '\n' (file_parser.py:101-106). Strip is ASCII-whitespace (the
    * Python `str.strip()` default over the engine's byte-clean corpora).
    */
  def extract(docx: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder()
    paragraphs(docx).foreach { p =>
      val t = PyStr.strip(p)
      if (t.nonEmpty) { sb.append(t); sb.append('\n') }
    }
    sb.toString
  }
}

/** PowerPoint (.pptx) text extraction — the reference routes ppt through
  * textract then flattens newlines to spaces (file_parser.py:206-211).
  * Slides are read in slide-number order (`ppt/slides/slideN.xml`); within
  * a slide, each DrawingML paragraph `<a:p>` is the concatenation of its
  * `<a:t>` run text; paragraphs and slides join with '\n'. The ppt branch
  * of [[FileParser.read]] then applies the reference's `replace('\n',' ')`.
  */
object Pptx extends Serializable {

  private val ANs = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val ANsStrict = "http://purl.oclc.org/ooxml/drawingml/main"

  private def isA(ns: String): Boolean = ns == ANs || ns == ANsStrict

  private val SlideName = raw"ppt/slides/slide(\d+)\.xml".r

  def slideTexts(pptx: Array[Byte]): Vector[String] = {
    val slides = ZipArchive.entries(pptx).collect {
      case (SlideName(n), b) => n.toInt -> b
    }.sortBy(_._1)
    if (slides.isEmpty)
      throw new IllegalArgumentException("pptx: no ppt/slides/slideN.xml parts")
    slides.map { case (_, part) =>
      StaxXml.withReader(part, "pptx") { r =>
        val paras = Vector.newBuilder[String]
        var para: java.lang.StringBuilder = null
        var inT = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT
                if isA(nsOf(r)) =>
              r.getLocalName match {
                case "p"  => para = new java.lang.StringBuilder()
                case "t"  => inT = para != null
                case "br" => if (para != null) para.append('\n')
                case _    =>
              }
            case XMLStreamConstants.END_ELEMENT if isA(nsOf(r)) =>
              r.getLocalName match {
                case "p" if para != null => paras += para.toString; para = null
                case "t"                 => inT = false
                case _                   =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
              para.append(r.getText)
            case _ =>
          }
        }
        paras.result().mkString("\n")
      }
    }
  }

  private def nsOf(r: XMLStreamReader): String = {
    val u = r.getNamespaceURI
    if (u == null) "" else u
  }

  /** Slide texts joined with '\n' (textract-flat; the dispatcher's ppt
    * branch turns every '\n' into ' ' per file_parser.py:210-211).
    */
  def extract(pptx: Array[Byte]): String = slideTexts(pptx).mkString("\n")
}

/** Python `str.strip()` over ASCII whitespace — shared by the arms that
  * mirror reference `.strip()` calls. (The reference corpora are
  * byte-clean ASCII/UTF-8 web text; unicode-space stripping divergence is
  * out of contract and documented here.)
  */
private[extract] object PyStr {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000B' || c == '\f'
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isWs(s.charAt(i))) i += 1
    while (j > i && isWs(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }
}
