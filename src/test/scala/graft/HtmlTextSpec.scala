package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.HtmlText
import java.util.Base64
import scala.io.Source

/** Extraction parity vectors (FIXTURES.md §2). `extract_vectors.tsv` pairs
  * were produced by CPython's REAL stdlib html.parser (the exact tokenizer
  * the reference's BeautifulSoup invocation drives) plus the documented thin
  * bs4 string-container layer; `unescape_vectors.tsv` pairs come straight
  * from CPython html.unescape. Comparison is exact string (== byte equality
  * for the UTF-8 dumps).
  */
class HtmlTextSpec extends AnyFunSuite {

  private def loadVectors(resource: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(h, e) = line.split("\t", 2)
      (new String(Base64.getDecoder.decode(h), "UTF-8"),
        new String(Base64.getDecoder.decode(e), "UTF-8"))
    }.toList
    finally src.close()
  }

  test("html.unescape parity (CPython-generated vectors)") {
    val vectors = loadVectors("/unescape_vectors.tsv")
    assert(vectors.nonEmpty)
    var failures = List.empty[String]
    vectors.foreach { case (input, expected) =>
      val got = HtmlText.unescape(input)
      if (got != expected)
        failures ::= s"IN=${input.take(60)} GOT=$got WANT=$expected"
    }
    assert(failures.isEmpty, s"${failures.size} mismatches:\n${failures.take(10).mkString("\n")}")
  }

  test("full extraction parity (html.parser-generated vectors)") {
    val vectors = loadVectors("/extract_vectors.tsv")
    assert(vectors.length > 150)
    var failures = List.empty[String]
    vectors.foreach { case (html, expected) =>
      val got = HtmlText.extract(html)
      if (got != expected)
        failures ::= s"HTML=${html.take(80).replace("\n", "\\n")}\n  GOT =${got.take(120).replace("\n", "\\n")}\n  WANT=${expected.take(120).replace("\n", "\\n")}"
    }
    assert(failures.isEmpty, s"${failures.size} mismatches:\n${failures.take(8).mkString("\n---\n")}")
  }

  test("normalization is the exact single-pass literal replace chain") {
    // '\n\n\n\n' --replace(\n\n\n,\n)--> '\n\n' --replace(\n\n,\n)--> '\n'
    assert(HtmlText.normalize("a\n\n\n\nb") == "a\nb")
    assert(HtmlText.normalize("a\n\nb") == "a\nb")
    // four spaces: one pass of '  '->' ' collapses both pairs -> two spaces
    // (NOT one — a fixpoint loop would differ; this pins single-pass)
    assert(HtmlText.normalize("a    b") == "a  b")
    assert(HtmlText.normalize("a   b") == "a  b") // 3 -> pair + single
    assert(HtmlText.normalize("x") == "x")
  }

  test("extraction is deterministic and idempotent on plain text") {
    val t = "already plain text with no markup"
    assert(HtmlText.extract(t) == t)
    assert(HtmlText.extract(HtmlText.extract(t)) == HtmlText.extract(t))
  }
}
