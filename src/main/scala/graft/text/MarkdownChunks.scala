package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown header-aware chunking — the engine's arm for the reference's
  * `process_markdown` (tools/file_parser.py:122-149): split a markdown
  * document on ATX headers (#, ##, ### — the "Header 1/2/3" metadata the
  * reference reads), build the header prefix exactly as the reference
  * concatenates it (H1, then ' '+H2, then ' '+H3 — including the leading
  * space when a deeper header appears without a shallower one), re-split
  * bodies of >= 1024 chars, drop pieces under 10 chars, and emit
  * `"{header} {content.lower()}"` per chunk.
  *
  * The reference delegates the two splitters to caller-supplied LangChain
  * objects (head_splitter/md_splitter args); the composition above is the
  * reference's own logic and is reproduced exactly. The splitters
  * themselves are defined here (documented, deterministic):
  *   - header split: ATX headers at line starts (up to level 3, a space
  *     after the hashes); setting level k clears deeper levels; header
  *     lines are consumed into metadata, body lines keep their text; a
  *     block is the stripped '\n'-join of its lines
  *   - body re-split: greedy word packing to <= chunkSize chars
  * Note: the reference function `return`s inside its doc loop
  * (file_parser.py:149 — only the first header-block ever survives),
  * an evident indentation bug; this implementation processes all blocks
  * and documents the divergence here.
  *
  * The operator is a narrow per-row kernel + posexplode — no shuffle; at
  * any corpus size chunking parallelism equals scan parallelism.
  */
object MarkdownChunks extends Serializable {

  final case class Chunk(header: String, content: String)

  private val HeaderRe = raw"^(#{1,3})\s+(.*)$$".r

  /** Header-split: blocks of (active-header-path, body). */
  def headerBlocks(md: String): Vector[Chunk] = {
    val out = Vector.newBuilder[Chunk]
    val headers = new Array[String](3) // active H1/H2/H3
    var body = Vector.newBuilder[String]
    var bodyAny = false
    def flush(): Unit = {
      if (bodyAny) {
        val content = body.result().mkString("\n").trim
        if (content.nonEmpty) out += Chunk(headerPrefix(headers), content)
      }
      body = Vector.newBuilder[String]
      bodyAny = false
    }
    md.split("\n", -1).foreach { line =>
      line.stripTrailing() match {
        case HeaderRe(hashes, title) =>
          flush()
          val lvl = hashes.length - 1
          headers(lvl) = title.trim
          var i = lvl + 1
          while (i < 3) { headers(i) = null; i += 1 }
        case other =>
          body += other
          bodyAny = true
      }
    }
    flush()
    out.result()
  }

  /** The reference's header concatenation (file_parser.py:130-139): H1
    * appended bare; H2/H3 each preceded by ' ' — whether or not the
    * shallower level is set.
    */
  private def headerPrefix(headers: Array[String]): String = {
    val sb = new java.lang.StringBuilder()
    if (headers(0) != null) sb.append(headers(0))
    if (headers(1) != null) sb.append(' ').append(headers(1))
    if (headers(2) != null) sb.append(' ').append(headers(2))
    sb.toString
  }

  /** Greedy word packing to <= chunkSize chars (the md_splitter arm). */
  def packWords(content: String, chunkSize: Int): Vector[String] = {
    val words = content.split("\\s+").filter(_.nonEmpty)
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder()
    words.foreach { w =>
      if (cur.length > 0 && cur.length + 1 + w.length > chunkSize) {
        out += cur.toString
        cur.setLength(0)
      }
      if (cur.length > 0) cur.append(' ')
      cur.append(w)
    }
    if (cur.length > 0) out += cur.toString
    out.result()
  }

  /** Full reference composition for one document: header blocks, >= 1024
    * bodies re-split, >= 10-char pieces emitted as "header content.lower".
    */
  def chunkText(md: String, chunkSize: Int = 1024): Vector[String] =
    headerBlocks(md).flatMap { case Chunk(header, content) =>
      if (content.length >= chunkSize)
        packWords(content, chunkSize)
          .filter(_.length >= 10)
          .map(p => s"$header ${p.toLowerCase}")
      else if (content.length >= 10) Vector(s"$header ${content.toLowerCase}")
      else Vector.empty
    }

  /** Frame form: emits (parent columns..., chunk_pos, chunk_text) via a
    * narrow kernel + posexplode (mirrors TextFunctions.chunkDocs's shape).
    */
  def chunks(docs: DataFrame, textCol: String, chunkSize: Int = 1024): DataFrame = {
    val kernel = udf((md: String) => chunkText(md, chunkSize))
    docs
      .withColumn("__chunks", kernel(col(textCol)))
      .select(col("*"), posexplode(col("__chunks")))
      .withColumnRenamed("pos", "chunk_pos")
      .withColumnRenamed("col", "chunk_text")
      .drop("__chunks")
  }

  /** Column form of the per-doc kernel. */
  def chunkColumn(md: Column, chunkSize: Int = 1024): Column =
    udf((s: String) => chunkText(s, chunkSize)).apply(md)
}
