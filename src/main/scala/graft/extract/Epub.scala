package graft.extract

import javax.xml.stream.XMLStreamConstants

/** EPUB text extraction — the engine's arm for the reference's
  * `process_epub` (tools/file_parser.py:152-166, ebooklib + BeautifulSoup):
  * every XHTML document item is decoded as UTF-8, the items are joined
  * with '\n' in manifest order (ebooklib `get_items()` yields manifest
  * order), and the joined markup runs through soup-`.text` extraction —
  * here the byte-parity [[HtmlText.soupText]] kernel the html arm already
  * uses. Note the reference does NOT apply the whitespace normalize to the
  * epub path (process_epub is standalone, not a FileParser.read branch) —
  * reproduced exactly.
  *
  * Container resolution is the OCF chain: `META-INF/container.xml` names
  * the OPF package file; the OPF `<manifest>` lists the items whose
  * media-type is `application/xhtml+xml`.
  */
object Epub extends Serializable {

  def extract(epub: Array[Byte]): String =
    HtmlText.soupText(joinedDocuments(epub))

  /** XHTML items joined with '\n' (pre-soup form, exposed for tests). */
  def joinedDocuments(epub: Array[Byte]): String = {
    val entries = ZipArchive.entries(epub).toMap
    val container = entries.getOrElse("META-INF/container.xml",
      throw new IllegalArgumentException("epub: missing META-INF/container.xml"))
    val opfPath = rootfilePath(container)
    val opf = entries.getOrElse(opfPath,
      throw new IllegalArgumentException(s"epub: missing OPF '$opfPath'"))
    val baseDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i  => opfPath.substring(0, i + 1)
    }
    val hrefs = xhtmlHrefs(opf)
    if (hrefs.isEmpty)
      throw new IllegalArgumentException("epub: no xhtml items in manifest")
    hrefs.map { href =>
      val path = if (href.startsWith("/")) href.drop(1) else baseDir + href
      val bytes = entries.getOrElse(path,
        throw new IllegalArgumentException(s"epub: manifest item '$path' missing"))
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }.mkString("\n")
  }

  private def rootfilePath(container: Array[Byte]): String =
    StaxXml.withReader(container, "epub container") { r =>
      var path: String = null
      while (r.hasNext && path == null) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "rootfile")
          path = attr(r, "full-path")
      }
      if (path == null)
        throw new IllegalArgumentException("epub: container.xml has no rootfile")
      path
    }

  /** Manifest item hrefs with media-type application/xhtml+xml, in
    * manifest (= ebooklib get_items) order.
    */
  private def xhtmlHrefs(opf: Array[Byte]): Vector[String] =
    StaxXml.withReader(opf, "epub opf") { r =>
      val out = Vector.newBuilder[String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "item" &&
            attr(r, "media-type") == "application/xhtml+xml") {
          val href = attr(r, "href")
          if (href != null) out += href
        }
      }
      out.result()
    }

  private def attr(r: javax.xml.stream.XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
