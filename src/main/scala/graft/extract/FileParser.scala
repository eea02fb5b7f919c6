package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** Multi-format document dispatch — the engine's `FileParser`
  * (tools/file_parser.py:169-270) over in-memory payloads: suffix-routed
  * type detection with the reference's exact priority order, per-format
  * extraction, the shared three-literal-pass whitespace normalize
  * (file_parser.py:224-226), and error capture instead of propagation
  * (file_parser.py:220-222 returns `('', e)`).
  *
  * Differences from the reference, documented:
  *   - payloads are byte arrays (the engine's tables carry binary columns;
  *     there is no executor-local filesystem contract at 100 TB)
  *   - legacy OLE formats (.doc, .xls) fail loudly into the error arm —
  *     the reference shells out to textract/xlrd for those; the modern
  *     zip-container formats (.docx, .pptx, .xlsx) are parsed natively
  *   - `.epub` routes to [[Epub]] (the reference keeps process_epub as a
  *     standalone path; here it is reachable through read() too, without
  *     the normalize, preserving process_epub's output exactly)
  *
  * Every arm is a pure per-row kernel: [[extractColumn]] runs as a narrow
  * map over (path, payload) with no shuffle, so extraction parallelism is
  * exactly the scan parallelism at any corpus size.
  */
object FileParser extends Serializable {

  /** Reference get_type (file_parser.py:229-261) — same suffix sets, same
    * priority order (pdf, md, ppt, image, text, word, excel, html; epub
    * appended for the standalone reference path).
    *
    * DELIBERATE divergence (like the documented epub/normalize ones): the
    * reference matches suffixes case-SENSITIVELY (`str.endswith`), so
    * 'A.PDF' routes to None there but to the pdf arm here — uppercase
    * suffixes are routine in crawled corpora and silently dropping them is
    * the less useful behavior. Everything else (sets, priority) is exact.
    */
  def getType(path: String): Option[String] = {
    val p = path.toLowerCase
    if (p.endsWith(".pdf")) Some("pdf")
    else if (p.endsWith(".md")) Some("md")
    else if (p.endsWith(".pptx")) Some("ppt")
    else if (Seq(".jpg", ".jpeg", ".png", ".bmp").exists(p.endsWith)) Some("image")
    else if (p.endsWith(".txt") || p.endsWith(".text")) Some("text")
    else if (p.endsWith(".docx") || p.endsWith(".doc")) Some("word")
    else if (Seq(".xlsx", ".xls", ".csv").exists(p.endsWith)) Some("excel")
    else if (Seq(".html", ".htm", ".shtml", ".xhtml").exists(p.endsWith)) Some("html")
    else if (p.endsWith(".epub")) Some("epub")
    else None
  }

  /** Reference read() (file_parser.py:191-227): route, extract, normalize;
    * failures return ('', Some(message)). Types with no branch (image,
    * unknown) return the normalized empty string like the reference's
    * fall-through.
    */
  def read(path: String, payload: Array[Byte]): (String, Option[String]) = {
    val tpe = getType(path)
    try {
      val text = tpe match {
        case Some("md") | Some("text") =>
          new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        case Some("pdf")   => Pdf.extract(payload)
        case Some("excel") =>
          if (path.toLowerCase.endsWith(".csv")) Csv.extract(payload)
          else if (path.toLowerCase.endsWith(".xls"))
            throw new IllegalArgumentException(
              "legacy .xls (OLE) is not supported; convert to .xlsx")
          else Xlsx.extract(payload)
        case Some("word") =>
          if (path.toLowerCase.endsWith(".doc"))
            throw new IllegalArgumentException(
              "legacy .doc (OLE) is not supported; convert to .docx")
          else Docx.extract(payload)
        case Some("ppt") =>
          // reference ppt branch flattens newlines (file_parser.py:210-211)
          Pptx.extract(payload).replace('\n', ' ')
        case Some("html") =>
          HtmlText.soupText(new String(payload,
            java.nio.charset.StandardCharsets.UTF_8))
        case Some("epub") =>
          // standalone reference path — no normalize (file_parser.py:152-166)
          return (Epub.extract(payload), None)
        case _ => ""
      }
      (HtmlText.normalize(text), None)
    } catch {
      case e: Exception =>
        ("", Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Reference md5() (file_parser.py:263-270 — sha256 hex prefix, despite
    * the name): first 8 hex chars of the payload's sha256.
    */
  def contentKey(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    d.take(4).map(b => f"${b & 0xFF}%02x").mkString
  }

  /** Narrow per-row extraction over (path, binary) columns: adds
    * `<out>` (text) and `<out>_err` (null when clean). UDF-based like the
    * html kernel — a multi-format document parse is not SQL-expressible,
    * which is the point of the operator; the surrounding plan stays
    * declarative and the kernel is embarrassingly parallel.
    */
  def extractColumn(path: Column, payload: Column): Column = {
    val u = udf { (p: String, bytes: Array[Byte]) =>
      val (text, err) = read(p, bytes)
      (text, err.orNull)
    }
    u(path, payload)
  }

  /** Convenience frame form of [[extractColumn]]. The kernel result is
    * bound to ONE intermediate column before the field projection, so the
    * parse runs exactly once per row structurally — not relying on codegen
    * common-subexpression elimination to dedupe two getField references.
    */
  def extractDf(df: DataFrame, pathCol: String, payloadCol: String,
                outCol: String = "text"): DataFrame =
    df.withColumn("__fp", extractColumn(df(pathCol), df(payloadCol)))
      .withColumn(outCol, org.apache.spark.sql.functions.col("__fp._1"))
      .withColumn(s"${outCol}_err", org.apache.spark.sql.functions.col("__fp._2"))
      .drop("__fp")
}
