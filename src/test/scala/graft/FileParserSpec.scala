package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract._
import graft.extract.TableJson.{CBool, CDouble, CLong, CNull, CStr}

/** Non-HTML extraction arms: roundtrip through the engine's own DocGen
  * writers, plus cross-implementation vectors authored by an INDEPENDENT
  * writer (Python stdlib zipfile/zlib, tools/gen_doc_vectors.py) with
  * expectations from the reference semantics — and, for the tabular arms,
  * from REAL pandas `dropna(axis=1).to_json(force_ascii=False)` (the
  * reference's actual dependency, file_parser.py:109-119).
  */
class FileParserSpec extends AnyFunSuite {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/docfiles/$name")
    assert(in != null, s"missing test resource docfiles/$name")
    try in.readAllBytes() finally in.close()
  }

  private def expected(name: String): String =
    new String(vector(s"$name.expected.txt"),
      java.nio.charset.StandardCharsets.UTF_8)

  // ---- cross-implementation vectors (Python-stdlib writers) -------------

  for (name <- Seq("vec1.docx", "vec1.pptx", "vec1.csv", "vec1.xlsx",
                   "vec1.pdf", "vec2.pdf", "vec3.pdf", "vec1.epub")) {
    test(s"vector $name extracts to the reference-semantics expectation") {
      val (text, err) = FileParser.read(name, vector(name))
      assert(err.isEmpty, s"unexpected error: $err")
      assert(text == expected(name))
    }
  }

  // ---- docx -------------------------------------------------------------

  test("docx roundtrip: runs, tabs, breaks, escapes, empty paragraphs") {
    val paras = Seq("plain", "  strip me  ", "", "a\tb", "x\ny",
      "esc &<>\"' done", "中文 und ümlaut")
    val bytes = DocGen.docx(paras)
    assert(Docx.paragraphs(bytes) == paras.toVector)
    val want = paras.map(_.trim).filter(_.nonEmpty).map(_ + "\n").mkString
    assert(Docx.extract(bytes) == want)
  }

  test("docx: corrupt container and legacy .doc fail into the error arm") {
    val (t1, e1) = FileParser.read("f.docx", Array[Byte](1, 2, 3))
    assert(t1 == "" && e1.nonEmpty)
    val (t2, e2) = FileParser.read("f.doc", DocGen.docx(Seq("x")))
    assert(t2 == "" && e2.exists(_.contains("legacy .doc")))
  }

  // ---- pptx -------------------------------------------------------------

  test("pptx roundtrip: slides in numeric order, ppt branch flattens newlines") {
    val slides = Seq(Seq("s1 p1", "s1 p2"), Seq("s2 only"))
    val bytes = DocGen.pptx(slides)
    assert(Pptx.extract(bytes) == "s1 p1\ns1 p2\ns2 only")
    val (text, err) = FileParser.read("deck.pptx", bytes)
    assert(err.isEmpty)
    assert(text == "s1 p1 s1 p2 s2 only")
  }

  test("pptx: a:br run breaks surface as newlines (not glued words)") {
    val bytes = DocGen.pptx(Seq(Seq("line one\nline two")))
    assert(Pptx.extract(bytes) == "line one\nline two")
    assert(FileParser.read("d.pptx", bytes)._1 == "line one line two")
  }

  // ---- csv / xlsx / pandas json -----------------------------------------

  test("csv: quoting, dtype inference, NaN-column drop, pandas json forms") {
    val bytes = DocGen.csv(
      Seq("id", "name", "ok", "gap"),
      Seq(Seq("1", "a,b", "True", "x"),
          Seq("2", "q\"q\"", "False", null),
          Seq("3", "c/d", "True", "z")))
    val json = Csv.extract(bytes)
    assert(json ==
      """{"id":{"0":1,"1":2,"2":3},"name":{"0":"a,b","1":"q\"q\"","2":"c\/d"},"ok":{"0":true,"1":false,"2":true}}""")
  }

  test("csv: ints with missing cells promote to float64 before the drop") {
    // pandas: [1,,3] reads as float64 — the drop then removes it anyway;
    // a full float column survives with float rendering
    val bytes = DocGen.csv(Seq("a", "b"),
      Seq(Seq("1", "0.5"), Seq("", "1.0"), Seq("3", "12.25")))
    assert(Csv.extract(bytes) ==
      """{"b":{"0":0.5,"1":1.0,"2":12.25}}""")
  }

  test("csv arm matches REAL pandas on 43 fuzz tables") {
    // randomized headers/dtypes/missing-cells/special chars, expectations
    // from actual pandas read_csv -> dropna(axis=1) -> to_json
    // (tools/gen_doc_vectors.py's sibling block; committed vectors)
    val in = getClass.getResourceAsStream("/docfiles/csv_fuzz.json")
    assert(in != null)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = try mapper.readTree(in) finally in.close()
    var i = 0
    root.forEach { node =>
      val csv = node.get("csv").asText
      val expected = node.get("expected").asText
      val got = Csv.extract(csv.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(got == expected, s"fuzz case $i diverged from pandas:\n$csv")
      i += 1
    }
    assert(i == 43)
  }

  test("xlsx roundtrip: shared strings, numerics, gaps, dropna") {
    val bytes = DocGen.xlsx(
      Seq("name", "n", "f", "gappy"),
      Seq(Seq(CStr("ann"), CLong(1), CDouble(0.5), CStr("x")),
          Seq(CStr("bob"), CLong(2), CDouble(1.5), CNull),
          Seq(CStr("cat"), CLong(3), CDouble(2.25), CStr("y"))))
    assert(Xlsx.extract(bytes) ==
      """{"name":{"0":"ann","1":"bob","2":"cat"},"n":{"0":1,"1":2,"2":3},"f":{"0":0.5,"1":1.5,"2":2.25}}""")
  }

  test("xlsx: int column with a float cell promotes whole column to float64") {
    val bytes = DocGen.xlsx(Seq("v"),
      Seq(Seq(CLong(1)), Seq(CDouble(2.5)), Seq(CLong(3))))
    assert(Xlsx.extract(bytes) == """{"v":{"0":1.0,"1":2.5,"2":3.0}}""")
  }

  test("pandas double rendering matches ujson double_precision=10") {
    import TableJson.renderDouble
    assert(renderDouble(1.0) == "1.0")
    assert(renderDouble(51.6) == "51.6")
    assert(renderDouble(87.88) == "87.88")
    assert(renderDouble(0.1) == "0.1")
    assert(renderDouble(-2.5) == "-2.5")
    assert(renderDouble(1.0 / 3.0) == "0.3333333333")
  }

  // ---- pdf --------------------------------------------------------------

  test("pdf roundtrip: Tj/TJ/' operators, escapes, Flate, multi-page concat") {
    val pages = Seq(
      Seq("first line", "with (parens) and \\slash", "quote ' arm"),
      Seq("page two", "ümlaut and 中文? no — latin-1 only", "end"))
    // latin-1-able content only (documented string decoding contract)
    val safe = pages.map(_.map(_.filter(_ < 256)))
    val bytes = DocGen.pdf(safe)
    val want = safe.map(_.mkString("\n") + "\n").mkString
    assert(Pdf.extract(bytes) == want)
  }

  test("pdf content lexer: hex strings, octal escapes, continuations") {
    val content = "BT (a\\110b) Tj 0 -14 Td <48495F21> Tj (li\\\nne) ' ET"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // \110 = 'H'; hex 48 49 5F 21 = HI_!; \<newline> = continuation
    assert(Pdf.extractContentText(content) == "aHb\nHI_!\nline\n")
  }

  test("pdf: header and structure failures are loud") {
    intercept[IllegalArgumentException](Pdf.extract("nope".getBytes))
    intercept[IllegalArgumentException](
      Pdf.extract("%PDF-1.4\ngarbage without objects".getBytes))
    // the generator's latin-1 string contract fails loudly, never corrupts
    val e = intercept[IllegalArgumentException](DocGen.pdf(Seq(Seq("中文"))))
    assert(e.getMessage.contains("latin-1"))
  }

  // ---- epub -------------------------------------------------------------

  test("epub roundtrip: OCF chain, manifest order, soup text, no normalize") {
    val chapters = Seq("one", "two & <three>", "four")
    val bytes = DocGen.epub(chapters)
    assert(Epub.extract(bytes) == chapters.mkString("\n"))
    // reachable through read() with epub semantics preserved (no normalize):
    // craft chapters whose joined soup text contains '\n\n' to prove the
    // normalize is NOT applied on this arm
    val odd = DocGen.epub(Seq("a\n\nb", "c"))
    assert(FileParser.read("book.epub", odd)._1 == "a\n\nb\nc")
  }

  // ---- dispatcher -------------------------------------------------------

  test("getType mirrors the reference suffix priority") {
    assert(FileParser.getType("a.pdf").contains("pdf"))
    assert(FileParser.getType("a.md").contains("md"))
    assert(FileParser.getType("a.pptx").contains("ppt"))
    assert(FileParser.getType("a.png").contains("image"))
    assert(FileParser.getType("a.txt").contains("text"))
    assert(FileParser.getType("a.docx").contains("word"))
    assert(FileParser.getType("a.csv").contains("excel"))
    assert(FileParser.getType("a.xhtml").contains("html"))
    assert(FileParser.getType("a.epub").contains("epub"))
    assert(FileParser.getType("a.zip").isEmpty)
  }

  test("read: text/md passthrough + normalize; image/unknown empty; sha key") {
    val raw = "line one\n\n\nline two  spaced".getBytes
    assert(FileParser.read("notes.txt", raw)._1 == "line one\nline two spaced")
    assert(FileParser.read("notes.md", raw)._1 == "line one\nline two spaced")
    assert(FileParser.read("img.png", Array[Byte](1))._1 == "")
    assert(FileParser.read("mystery.bin", Array[Byte](1))._1 == "")
    // reference md5() is sha256[:8] (file_parser.py:263-270)
    assert(FileParser.contentKey("abc".getBytes) == "ba7816bf")
  }

  // ---- markdown chunking (process_markdown composition) -----------------

  test("markdown: header state machine, prefix composition, lowercase, filter") {
    import graft.text.MarkdownChunks
    val md =
      """# Top
        |Intro paragraph here.
        |## Sub One
        |Body of SUB one.
        |tiny
        |### Deep
        |Deep CONTENT line.
        |## Sub Two
        |short
        |# Reset
        |After reset BODY.""".stripMargin
    val chunks = MarkdownChunks.chunkText(md)
    assert(chunks == Vector(
      "Top intro paragraph here.",
      // 'tiny' rides the same block as the Sub One body ('\n'-joined)
      "Top Sub One body of sub one.\ntiny",
      "Top Sub One Deep deep content line.",
      // '## Sub Two' clears H3; its block is 'short' (5 chars) -> dropped
      "Reset after reset body."))
  }

  test("markdown: deeper header without shallower keeps the leading space") {
    import graft.text.MarkdownChunks
    // the reference appends ' '+H2 unconditionally (file_parser.py:134-136)
    val chunks = MarkdownChunks.chunkText("## Only Sub\ncontent goes here")
    assert(chunks == Vector(" Only Sub content goes here"))
  }

  test("markdown: >=1024-char bodies re-split by greedy word packing") {
    import graft.text.MarkdownChunks
    val body = (1 to 200).map(i => s"word$i").mkString(" ") // ~1490 chars
    val chunks = MarkdownChunks.chunkText(s"# H\n$body")
    assert(chunks.length == 2)
    assert(chunks.forall(_.startsWith("H ")))
    assert(chunks.forall(_.length <= 1024 + 2))
    // packing preserves every word exactly once, lowercased
    val words = chunks.flatMap(_.drop(2).split(" "))
    assert(words == (1 to 200).map(i => s"word$i"))
    // pieces under 10 chars are dropped even on the re-split arm
    val tail = MarkdownChunks.packWords("x" * 1020 + " tiny", 1024)
    assert(tail == Vector("x" * 1020, "tiny"))
    assert(MarkdownChunks.chunkText("# H\n" + "x" * 1020 + " tiny")
      == Vector("H " + "x" * 1020))
  }

  test("html arm matches the existing soup-text kernel") {
    val html = "<html><body><p>para</p><div>block</div></body></html>"
    val (text, err) = FileParser.read("page.html", html.getBytes)
    assert(err.isEmpty)
    assert(text == HtmlText.normalize(HtmlText.soupText(html)))
  }
}
