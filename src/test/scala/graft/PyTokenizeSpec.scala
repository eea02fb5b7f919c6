package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tokenize.PyTokenize

/** Python `str.split()` parity vectors (FIXTURES.md §3). Expected values are
  * what CPython 3.x produces for `s.split()` on each input.
  */
class PyTokenizeSpec extends AnyFunSuite {

  private def check(s: String, expected: Seq[String]): Unit =
    assert(PyTokenize.split(s).toSeq == expected,
      s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")

  test("basic whitespace") {
    check("a b c", Seq("a", "b", "c"))
    check("  a  b  ", Seq("a", "b"))
    check("a\tb\nc\rd", Seq("a", "b", "c", "d"))
    check("a\u000bb\u000cc", Seq("a", "b", "c")) // VT, FF
  }

  test("empty and all-space") {
    check("", Seq())
    check("   ", Seq())
    check("\t\n\r", Seq())
  }

  test("unicode whitespace that Python splits on") {
    check("a\u00a0b", Seq("a", "b")) // NBSP: Python splits, Java regex backslash-s does not
    check("a\u2007b", Seq("a", "b")) // figure space (Zs)
    check("a\u202fb", Seq("a", "b")) // narrow NBSP (Zs)
    check("a\u1680b", Seq("a", "b")) // ogham space mark
    check("a\u2028b", Seq("a", "b")) // line separator (Zl)
    check("a\u2029b", Seq("a", "b")) // paragraph separator (Zp)
    check("a\u0085b", Seq("a", "b")) // NEL
    check("a\u001cb\u001dc\u001ed\u001fe", Seq("a", "b", "c", "d", "e")) // C0 seps
    check("a\u3000b", Seq("a", "b")) // ideographic space
    check("a\u2000b\u2003c\u200ad", Seq("a", "b", "c", "d")) // en-quad, em-space, hair space
  }

  test("non-whitespace that Python keeps") {
    check("a\u200bb", Seq("a\u200bb")) // zero-width space is NOT whitespace
    check("a\u180eb", Seq("a\u180eb")) // Mongolian vowel sep (Cf since Unicode 6.3)
    check("a_b-c", Seq("a_b-c"))
  }

  test("multibyte content preserved") {
    check("h\u00e9llo w\u00f6rld \u4f60\u597d", Seq("h\u00e9llo", "w\u00f6rld", "\u4f60\u597d"))
  }
}
