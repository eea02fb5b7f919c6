package graft.extract

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, DeflaterOutputStream, ZipEntry, ZipOutputStream}

/** Deterministic in-memory builders for the non-HTML document formats the
  * extraction arms parse (docx/pptx/xlsx/csv/pdf/epub). These author the
  * synthetic corpora for the roundtrip contract queries, specs, and
  * benches — no external data, per the build rules; the independent-writer
  * cross-check is the Python-stdlib vector set under src/test/resources
  * (tools/gen_doc_vectors.py).
  *
  * Containers are structurally honest (content-types, rels, OCF chain) so
  * third-party readers accept them; entry timestamps are pinned for
  * deterministic bytes.
  */
object DocGen {

  private val FixedTime = 1577836800000L // 2020-01-01T00:00:00Z

  def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  private def zip(entries: Seq[(String, Array[Byte])],
                  storedFirst: Boolean = false): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    entries.zipWithIndex.foreach { case ((name, bytes), i) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      if (storedFirst && i == 0) {
        // OCF mimetype entry must be STORED and first
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        val crc = new CRC32(); crc.update(bytes)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e)
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    buf.toByteArray
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // ---- docx --------------------------------------------------------------

  /** One paragraph per input string; '\t' and '\n' inside a paragraph
    * become `<w:tab/>` / `<w:br/>` elements (their literal form is invalid
    * in w:t). Each text segment is split into two runs to exercise run
    * concatenation in the parser.
    */
  def docx(paragraphs: Seq[String]): Array[Byte] = {
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val body = paragraphs.map { p =>
      val runs = new java.lang.StringBuilder()
      var seg = new java.lang.StringBuilder()
      def flush(): Unit = {
        if (seg.length > 0) {
          val s = seg.toString
          val mid = s.length / 2
          runs.append(s"""<w:r><w:t xml:space="preserve">${xmlEscape(s.substring(0, mid))}</w:t></w:r>""")
          runs.append(s"""<w:r><w:t xml:space="preserve">${xmlEscape(s.substring(mid))}</w:t></w:r>""")
          seg = new java.lang.StringBuilder()
        }
      }
      p.foreach {
        case '\t' => flush(); runs.append("<w:r><w:tab/></w:r>")
        case '\n' => flush(); runs.append("<w:r><w:br/></w:r>")
        case c    => seg.append(c)
      }
      flush()
      s"<w:p>$runs</w:p>"
    }.mkString
    val document =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$w"><w:body>$body</w:body></w:document>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> utf8(contentTypes(
        "word/document.xml" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml")),
      "_rels/.rels" -> utf8(rels(
        "rId1" -> ("http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument",
          "word/document.xml"))),
      "word/document.xml" -> utf8(document)))
  }

  // ---- pptx --------------------------------------------------------------

  /** One slide per outer Seq element; inner strings are the slide's
    * DrawingML paragraphs.
    */
  def pptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    val p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    val slideEntries = slides.zipWithIndex.map { case (paras, i) =>
      val body = paras.map { t =>
        // '\n' inside a paragraph becomes a DrawingML <a:br/> run break
        val runs = t.split("\n", -1).map(seg =>
          s"<a:r><a:t>${xmlEscape(seg)}</a:t></a:r>").mkString("<a:br/>")
        s"""<a:p>$runs</a:p>"""
      }.mkString
      s"ppt/slides/slide${i + 1}.xml" ->
        utf8(s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
                |<p:sld xmlns:a="$a" xmlns:p="$p"><p:cSld><p:spTree>
                |<p:sp><p:txBody>$body</p:txBody></p:sp>
                |</p:spTree></p:cSld></p:sld>""".stripMargin)
    }
    zip(Seq(
      "[Content_Types].xml" -> utf8(contentTypes(
        slides.indices.map(i =>
          s"ppt/slides/slide${i + 1}.xml" ->
            "application/vnd.openxmlformats-officedocument.presentationml.slide+xml"): _*)),
      "_rels/.rels" -> utf8(rels(
        "rId1" -> ("http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument",
          "ppt/presentation.xml")))) ++ slideEntries)
  }

  // ---- xlsx --------------------------------------------------------------

  import TableJson.{Cell, CBool, CDouble, CLong, CNull, CStr}

  /** Single worksheet; header + rows. CNull cells are omitted (gaps),
    * strings go through sharedStrings, exercising the t="s" path.
    */
  def xlsx(header: Seq[String], rows: Seq[Seq[Cell]]): Array[Byte] = {
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int =
      shared.getOrElseUpdate(s, shared.size)
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new java.lang.StringBuilder()
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val allRows = header.map(h => CStr(h): Cell) +: rows
    val rowXml = allRows.zipWithIndex.map { case (cells, ri) =>
      val cellXml = cells.zipWithIndex.collect {
        case (c, ci) if c != CNull =>
          val ref = s"${colRef(ci)}${ri + 1}"
          c match {
            case CStr(s)    => s"""<c r="$ref" t="s"><v>${sharedIdx(s)}</v></c>"""
            case CLong(v)   => s"""<c r="$ref"><v>$v</v></c>"""
            case CDouble(v) => s"""<c r="$ref"><v>$v</v></c>"""
            case CBool(v)   => s"""<c r="$ref" t="b"><v>${if (v) 1 else 0}</v></c>"""
            case CNull      => ""
          }
      }.mkString
      s"""<row r="${ri + 1}">$cellXml</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$rowXml</sheetData></worksheet>""".stripMargin
    val sst = shared.keys.map(s =>
      s"""<si><t xml:space="preserve">${xmlEscape(s)}</t></si>""").mkString
    val main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    zip(Seq(
      "[Content_Types].xml" -> utf8(contentTypes(
        "xl/workbook.xml" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml",
        "xl/worksheets/sheet1.xml" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml",
        "xl/sharedStrings.xml" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml")),
      "_rels/.rels" -> utf8(rels(
        "rId1" -> ("http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument",
          "xl/workbook.xml"))),
      "xl/workbook.xml" -> utf8(
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="$main" xmlns:r="$rns">
           |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin),
      "xl/_rels/workbook.xml.rels" -> utf8(rels(
        "rId1" -> ("http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet",
          "worksheets/sheet1.xml"))),
      "xl/sharedStrings.xml" -> utf8(
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<sst xmlns="$main" count="${shared.size}" uniqueCount="${shared.size}">$sst</sst>""".stripMargin),
      "xl/worksheets/sheet1.xml" -> utf8(sheet)))
  }

  // ---- csv ---------------------------------------------------------------

  def csv(header: Seq[String], rows: Seq[Seq[String]]): Array[Byte] = {
    def field(s: String): String =
      if (s == null) ""
      else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    utf8((header +: rows).map(_.map(field).mkString(",")).mkString("\n") + "\n")
  }

  // ---- pdf ---------------------------------------------------------------

  /** Classic-xref PDF, one Flate-compressed content stream per page. Line
    * forms rotate Tj / TJ-with-kerning / ' to exercise every show
    * operator; specials in strings are backslash-escaped and non-printable
    * bytes go octal.
    */
  def pdf(pages: Seq[Seq[String]]): Array[Byte] = {
    def pdfStr(s: String): String = {
      val sb = new java.lang.StringBuilder("(")
      s.foreach {
        case '('  => sb.append("\\(")
        case ')'  => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case c if c > 255 =>
          // the simple-font text contract here is latin-1; silently
          // emitting the low byte would corrupt text — fail loudly
          throw new IllegalArgumentException(
            f"DocGen.pdf: char U+${c.toInt}%04X not representable in latin-1")
        case c if c < 32 || c > 126 => sb.append(f"\\${c.toInt}%03o")
        case c => sb.append(c)
      }
      sb.append(")").toString
    }
    def content(lines: Seq[String]): Array[Byte] = {
      val ops = new java.lang.StringBuilder("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, i) =>
        val move = if (i == 0) "" else "0 -14 Td\n"
        (i % 3) match {
          case 0 => ops.append(move).append(pdfStr(line)).append(" Tj\n")
          case 1 =>
            val mid = line.length / 2
            ops.append(move).append("[").append(pdfStr(line.substring(0, mid)))
              .append(" -250 ").append(pdfStr(line.substring(mid))).append("] TJ\n")
          case _ => // ' implies the line move itself
            ops.append(pdfStr(line)).append(" '\n")
        }
      }
      ops.append("ET\n")
      deflate(ops.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }

    val nPages = pages.length
    // object ids: 1 catalog, 2 pages, then per page i: (3+2i) page, (4+2i)
    // content, last: font
    val fontId = 3 + 2 * nPages
    val objects = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    objects += 1 -> utf8("<< /Type /Catalog /Pages 2 0 R >>")
    val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objects += 2 -> utf8(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageId = 3 + 2 * i
      val contId = 4 + 2 * i
      objects += pageId -> utf8(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontId 0 R >> >> /Contents $contId 0 R >>")
      val data = content(lines)
      val head = utf8(s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      val tail = utf8("\nendstream")
      objects += contId -> (head ++ data ++ tail)
    }
    objects += fontId -> utf8("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(utf8(s))
    w("%PDF-1.4\n%âãÏÓ\n")
    val offsets = new Array[Int](fontId + 1)
    objects.sortBy(_._1).foreach { case (id, body) =>
      offsets(id) = out.size
      w(s"$id 0 obj\n")
      out.write(body)
      w("\nendobj\n")
    }
    val xrefAt = out.size
    w(s"xref\n0 ${fontId + 1}\n")
    w("0000000000 65535 f \n")
    (1 to fontId).foreach(id => w(f"${offsets(id)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${fontId + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val d = new Deflater(Deflater.BEST_SPEED)
    val z = new DeflaterOutputStream(buf, d)
    z.write(data); z.close(); d.end()
    buf.toByteArray
  }

  // ---- epub --------------------------------------------------------------

  /** OCF container: stored mimetype, container.xml -> OPF -> one XHTML
    * chapter per input string (wrapped in a p tag, escaped).
    */
  def epub(chapters: Seq[String]): Array[Byte] = {
    val chapterEntries = chapters.zipWithIndex.map { case (text, i) =>
      s"OEBPS/ch${i + 1}.xhtml" ->
        utf8(s"<html><body><p>${xmlEscape(text)}</p></body></html>")
    }
    val manifest = chapters.indices.map(i =>
      s"""<item id="ch${i + 1}" href="ch${i + 1}.xhtml" media-type="application/xhtml+xml"/>""").mkString
    val spine = chapters.indices.map(i =>
      s"""<itemref idref="ch${i + 1}"/>""").mkString
    val opf =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
         |<metadata><dc:identifier xmlns:dc="http://purl.org/dc/elements/1.1/" id="uid">graft</dc:identifier></metadata>
         |<manifest>$manifest</manifest>
         |<spine>$spine</spine>
         |</package>""".stripMargin
    val container =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>
        |</container>""".stripMargin
    zip(Seq(
      "mimetype" -> utf8("application/epub+zip"),
      "META-INF/container.xml" -> utf8(container),
      "OEBPS/content.opf" -> utf8(opf)) ++ chapterEntries,
      storedFirst = true)
  }

  // ---- shared OPC boilerplate -------------------------------------------

  private def contentTypes(overrides: (String, String)*): String = {
    val o = overrides.map { case (part, tpe) =>
      s"""<Override PartName="/$part" ContentType="$tpe"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
       |<Default Extension="xml" ContentType="application/xml"/>
       |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
       |$o</Types>""".stripMargin
  }

  private def rels(entries: (String, (String, String))*): String = {
    val r = entries.map { case (id, (tpe, target)) =>
      s"""<Relationship Id="$id" Type="$tpe" Target="$target"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |$r</Relationships>""".stripMargin
  }
}
