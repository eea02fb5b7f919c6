package graft.extract

import javax.xml.stream.{XMLStreamConstants, XMLStreamReader}

/** Tabular extraction — the engine's arm for the reference's
  * `process_excel` (tools/file_parser.py:109-119): read the table
  * (csv via pandas.read_csv, xlsx via pandas.read_excel), drop columns
  * containing any missing value (`dropna(axis=1)`), and emit
  * `to_json(force_ascii=False)` — i.e. orient='columns' JSON
  * `{"col":{"0":v0,"1":v1,...},...}` keyed by position-index labels.
  *
  * The pandas semantics reproduced here (and pinned by real-pandas
  * cross-validation vectors in FileParserSpec for the csv arm):
  *   - header = first record; data rows follow in order
  *   - csv column dtype inference: all-int -> int64, all-numeric -> float64,
  *     all-True/False -> bool, otherwise object (values stay strings)
  *   - empty cells are NaN; a NaN anywhere in a column drops the column
  *   - to_json escapes `"` `\` `/` and control chars; ints print bare,
  *     bools lowercase, floats with ujson double_precision=10 rendering
  *     (trailing zeros trimmed, at least one fraction digit)
  * Floats beyond 10 decimal places round half-even like ujson; exotic
  * magnitudes (|x| >= 1e16 or < 1e-10) are outside the documented contract.
  */
object TableJson extends Serializable {

  sealed trait Cell extends Serializable
  final case class CLong(v: Long) extends Cell
  final case class CDouble(v: Double) extends Cell
  final case class CStr(v: String) extends Cell
  final case class CBool(v: Boolean) extends Cell
  case object CNull extends Cell

  /** A parsed table: column names in order + per-column cells (row order).
    * Ragged input is normalized by the parsers (missing -> CNull).
    */
  final case class Table(names: Vector[String], cols: Vector[Vector[Cell]]) {
    require(names.length == cols.length, "names/cols arity mismatch")

    /** pandas `dropna(axis=1)`: drop any column containing a missing cell. */
    def dropNaColumns: Table = {
      val keep = names.indices.filter(i => !cols(i).contains(CNull)).toVector
      Table(keep.map(names), keep.map(cols))
    }
  }

  // ---- pandas to_json emitter -------------------------------------------

  def toJsonColumns(t: Table): String = {
    val sb = new java.lang.StringBuilder()
    sb.append('{')
    var ci = 0
    while (ci < t.names.length) {
      if (ci > 0) sb.append(',')
      appendJsonString(sb, t.names(ci))
      sb.append(":{")
      val col = t.cols(ci)
      var ri = 0
      while (ri < col.length) {
        if (ri > 0) sb.append(',')
        sb.append('"').append(ri).append("\":")
        appendCell(sb, col(ri))
        ri += 1
      }
      sb.append('}')
      ci += 1
    }
    sb.append('}')
    sb.toString
  }

  private def appendCell(sb: java.lang.StringBuilder, c: Cell): Unit = c match {
    case CLong(v)   => sb.append(v)
    case CBool(v)   => sb.append(if (v) "true" else "false")
    case CStr(v)    => appendJsonString(sb, v)
    case CDouble(v) => sb.append(renderDouble(v))
    case CNull      => sb.append("null")
  }

  /** ujson double_precision=10: fixed 10-dp half-even rounding, trailing
    * zeros trimmed, one fraction digit kept ("1.0", "12.5", "0.1").
    */
  def renderDouble(v: Double): String = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      throw new IllegalArgumentException(s"non-finite double in to_json: $v")
    val bd = new java.math.BigDecimal(v)
      .setScale(10, java.math.RoundingMode.HALF_EVEN)
      .stripTrailingZeros()
    val scaled = if (bd.scale() < 1) bd.setScale(1) else bd
    scaled.toPlainString
  }

  /** pandas/ujson JSON string escaping: `"` `\` `/` named controls, other
    * C0 controls as \u00XX; non-ASCII passes through (force_ascii=False,
    * the reference's call at file_parser.py:118).
    */
  private[extract] def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '/'  => sb.append("\\/")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _    => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}

/** RFC4180-shaped CSV parsing with pandas.read_csv column-dtype inference
  * (see [[TableJson]] for the reproduced semantics). One pass over the
  * bytes; quoted fields may contain commas, newlines, and doubled quotes.
  */
object Csv extends Serializable {
  import TableJson._

  /** Records as raw string fields (null = empty/missing field). */
  private[extract] def records(text: String): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    val rec = Vector.newBuilder[String]
    val field = new java.lang.StringBuilder()
    var sawAny = false // current record has content (guards blank-line skip)
    var inQuotes = false
    var recQuoted = false // any quoted section in the current record
    var i = 0
    val n = text.length
    def endField(): Unit = { rec += field.toString; field.setLength(0) }
    def endRecord(): Unit = {
      endField()
      val r = rec.result()
      // pandas skip_blank_lines: a record that is a single empty field
      // (i.e. an empty line) is skipped — but a lone quoted-empty field
      // ("") is a real one-missing-cell row, not a blank line (r7, per
      // pandas parity: read_csv yields a NaN row for it)
      if (!(r.length == 1 && r.head.isEmpty && !recQuoted)) out += r
      rec.clear(); sawAny = false; recQuoted = false
    }
    while (i < n) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && text.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQuotes = false
        } else field.append(c)
      } else c match {
        // pandas' C parser honors the quote char only at FIELD START; a
        // bare quote appearing mid-field is literal content (r7 — the old
        // behavior re-entered quote mode and swallowed the next comma)
        case '"' if field.length == 0 =>
          inQuotes = true; sawAny = true; recQuoted = true
        case ','  => endField(); sawAny = true
        case '\r' => if (i + 1 < n && text.charAt(i + 1) == '\n') i += 1
                     endRecord()
        case '\n' => endRecord()
        case _    => field.append(c); sawAny = true
      }
      i += 1
    }
    if (inQuotes)
      throw new IllegalArgumentException("csv: unterminated quoted field")
    if (sawAny || field.length > 0 || rec.result().nonEmpty) endRecord()
    out.result()
  }

  private val IntRe = raw"[+-]?\d+".r
  private val FloatRe = raw"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?".r
  private val BoolSet = Set("True", "False", "TRUE", "FALSE", "true", "false")

  /** Parse + infer column dtypes (pandas.read_csv shape). */
  def table(bytes: Array[Byte]): Table = {
    val recs = records(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    if (recs.isEmpty) throw new IllegalArgumentException("csv: empty input")
    val header = recs.head
    val width = header.length
    val rows = recs.tail.map { r =>
      if (r.length > width)
        throw new IllegalArgumentException(
          s"csv: row has ${r.length} fields, header has $width")
      r.padTo(width, "")
    }
    val cols = (0 until width).toVector.map { ci =>
      val raw = rows.map(_(ci))
      inferColumn(raw)
    }
    Table(header, cols)
  }

  private def inferColumn(raw: Vector[String]): Vector[Cell] = {
    val present = raw.filter(_.nonEmpty)
    def allMatch(re: scala.util.matching.Regex) =
      present.nonEmpty && present.forall(s => re.pattern.matcher(s).matches())
    if (present.nonEmpty && present.forall(BoolSet.contains)) {
      // pandas bool inference only applies to NaN-free columns
      if (present.length == raw.length)
        raw.map(s => CBool(s == "True" || s == "TRUE" || s == "true"))
      else raw.map(s => if (s.isEmpty) CNull else CStr(s))
    } else if (allMatch(IntRe) && present.length == raw.length &&
               present.forall(s => scala.util.Try(s.toLong).isSuccess))
      raw.map(s => CLong(s.toLong))
    else if (allMatch(FloatRe))
      // ints with missing cells also land here (NaN forces float64)
      raw.map(s => if (s.isEmpty) CNull else CDouble(s.toDouble))
    else
      raw.map(s => if (s.isEmpty) CNull else CStr(s))
  }

  /** Reference csv branch of process_excel: read_csv -> dropna(axis=1) ->
    * to_json (file_parser.py:112-119).
    */
  def extract(bytes: Array[Byte]): String =
    TableJson.toJsonColumns(table(bytes).dropNaColumns)
}

/** Excel (.xlsx) parsing — SpreadsheetML worksheet + shared strings, pure
  * StAX. The first sheet in workbook order is read (pandas.read_excel
  * default `sheet_name=0`); the first row is the header. Numeric cells
  * keep their stored form (integral -> int, else float) and columns are
  * unified like pandas: any float in a numeric column promotes the column
  * to float64; a string among numbers makes the column object (cells keep
  * their own types, which is how pandas renders object columns).
  */
object Xlsx extends Serializable {
  import TableJson._

  def extract(bytes: Array[Byte]): String =
    TableJson.toJsonColumns(table(bytes).dropNaColumns)

  def table(bytes: Array[Byte]): Table = {
    val entries = ZipArchive.entries(bytes).toMap
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetPath = firstSheetPath(entries)
    val part = entries.getOrElse(sheetPath,
      throw new IllegalArgumentException(s"xlsx: missing worksheet $sheetPath"))
    val grid = parseSheet(part, shared)
    if (grid.isEmpty) throw new IllegalArgumentException("xlsx: empty sheet")
    val header = grid.head.map {
      case CStr(s) => s
      case CLong(v) => v.toString
      case CDouble(v) => renderDouble(v)
      case CBool(v) => if (v) "True" else "False"
      case CNull => throw new IllegalArgumentException("xlsx: empty header cell")
    }
    val width = header.length
    val rows = grid.tail.map(_.padTo(width, CNull))
    val cols = (0 until width).toVector.map { ci =>
      unifyColumn(rows.map(_(ci)))
    }
    Table(header, cols)
  }

  /** First sheet target from workbook order via workbook rels; falls back
    * to the conventional sheet1 path for rels-less minimal containers.
    */
  private def firstSheetPath(entries: Map[String, Array[Byte]]): String = {
    val viaRels = for {
      wb <- entries.get("xl/workbook.xml")
      rid <- firstSheetRid(wb)
      rels <- entries.get("xl/_rels/workbook.xml.rels")
      target <- relTarget(rels, rid)
    } yield if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    viaRels.getOrElse("xl/worksheets/sheet1.xml")
  }

  private def firstSheetRid(wb: Array[Byte]): Option[String] =
    StaxXml.withReader(wb, "xlsx workbook") { r =>
      var rid: Option[String] = None
      while (r.hasNext && rid.isEmpty) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet")
          rid = Option(attr(r, "id"))
      }
      rid
    }

  private def relTarget(rels: Array[Byte], rid: String): Option[String] =
    StaxXml.withReader(rels, "xlsx rels") { r =>
      var target: Option[String] = None
      while (r.hasNext && target.isEmpty) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            attr(r, "Id") == rid)
          target = Option(attr(r, "Target"))
      }
      target
    }

  /** Attribute by local name (r:id et al. carry namespaces). */
  private def attr(r: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  private def parseSharedStrings(part: Array[Byte]): Vector[String] =
    StaxXml.withReader(part, "xlsx sharedStrings") { r =>
      val out = Vector.newBuilder[String]
      var cur: java.lang.StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => cur = new java.lang.StringBuilder()
            case "t"  => inT = cur != null
            case _    =>
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "si" if cur != null => out += cur.toString; cur = null
            case "t"                 => inT = false
            case _                   =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            cur.append(r.getText)
          case _ =>
        }
      }
      out.result()
    }

  /** Worksheet rows as cells; gaps from cell refs (r="B3") become CNull. */
  private def parseSheet(part: Array[Byte], shared: Vector[String]): Vector[Vector[Cell]] =
    StaxXml.withReader(part, "xlsx sheet") { r =>
      val rows = Vector.newBuilder[Vector[Cell]]
      var row: scala.collection.mutable.ArrayBuffer[Cell] = null
      var cellType: String = null
      var cellCol = -1
      var inV = false
      var sawVal = false // any v/t content in the current cell
      val vText = new java.lang.StringBuilder()
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty[Cell]
            case "c" if row != null =>
              cellType = Option(attr(r, "t")).getOrElse("n")
              cellCol = Option(attr(r, "r")).map(colIndex)
                .getOrElse(row.length)
              sawVal = false
              vText.setLength(0)
            // text ACCUMULATES across v/t elements: an inline string may
            // carry several rich-text runs (<is><r><t>..</t></r>...) and
            // pandas/openpyxl concatenate them
            case "v" | "t" if cellCol >= 0 => inV = true; sawVal = true
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "row" if row != null => rows += row.toVector; row = null
            case "c" if cellCol >= 0 =>
              if (sawVal && row != null) {
                while (row.length < cellCol) row += CNull
                val cell = decodeCell(cellType, vText.toString, shared)
                if (row.length == cellCol) row += cell else row(cellCol) = cell
              }
              cellCol = -1; cellType = null; sawVal = false
            case "v" | "t" => inV = false
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV =>
            vText.append(r.getText)
          case _ =>
        }
      }
      rows.result()
    }

  private def decodeCell(t: String, v: String, shared: Vector[String]): Cell = t match {
    case "s" =>
      val i = v.trim.toInt
      if (i < 0 || i >= shared.length)
        throw new IllegalArgumentException(s"xlsx: shared string index $i out of range")
      CStr(shared(i))
    case "str" | "inlineStr" => CStr(v)
    case "b" => CBool(v.trim == "1")
    case _ =>
      val d = v.trim.toDouble
      if (d == scala.math.rint(d) && scala.math.abs(d) < 1e15 && !v.contains(".") &&
          !v.toLowerCase.contains("e"))
        CLong(d.toLong)
      else CDouble(d)
  }

  /** Column letters of an A1-style ref -> 0-based index. */
  private[extract] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    if (acc == 0) throw new IllegalArgumentException(s"xlsx: bad cell ref '$ref'")
    acc - 1
  }

  /** pandas column unification: all-long -> int64; any double among
    * numerics -> float64; any string/bool mix -> object (cells keep type).
    */
  private def unifyColumn(cells: Vector[Cell]): Vector[Cell] = {
    val nonNull = cells.filter(_ != CNull)
    val allNum = nonNull.nonEmpty && nonNull.forall {
      case CLong(_) | CDouble(_) => true; case _ => false
    }
    if (allNum && nonNull.exists(_.isInstanceOf[CDouble]))
      cells.map { case CLong(v) => CDouble(v.toDouble); case c => c }
    else if (allNum && cells.contains(CNull))
      // NaN promotes int64 -> float64, like pandas
      cells.map { case CLong(v) => CDouble(v.toDouble); case c => c }
    else cells
  }
}
