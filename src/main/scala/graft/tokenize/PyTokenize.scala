package graft.tokenize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization with Python `str.split()` parity.
  *
  * The reference tokenizes queries with bare `query.split()`
  * (`/root/reference/src/retrievals/models/retrieval_auto.py:390`) and expects
  * callers to pre-tokenize documents the same way (pluggable `tokenizer`
  * callable, `:380-381`). Python's no-argument `split()`:
  *   - splits on runs of any character where `str.isspace()` is true,
  *   - drops empty strings (leading/trailing/multiple separators),
  *   - on the empty string returns [].
  *
  * Python's isspace() covers ASCII \t\n\v\f\r space, the C1 controls
  * \x1c-\x1f and \x85 (NEL), and every Unicode Zs/Zl/Zp character including
  * U+00A0/U+2007/U+202F. Java's `Character.isWhitespace` excludes the
  * non-breaking members of Zs and U+0085, so we union it with
  * `Character.isSpaceChar` (all Zs/Zl/Zp) plus U+0085 explicitly.
  */
object PyTokenize extends Serializable {

  @inline def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c) || c == '\u0085'

  /** Exact Python str.split() on a JVM string. */
  def split(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isPySpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isPySpace(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.toArray
  }

  // NOTE: there is deliberately NO udf wrapper for [[split]] here — the
  // column-level tokenize path is the native codegen'd Catalyst expression
  // (graft.plans.PyWsTokenize); a Scala UDF would silently break
  // whole-stage codegen if someone reached for it. PlanHygieneSpec pins
  // the no-tokenize-UDF invariant on the contract plans.

  /** Codegen-friendly tokenizer: ASCII-whitespace regex split with empty
    * removal. Identical to [[split]] on text whose only whitespace is ASCII
    * \t\n\x0b\f\r/space — true of the synthetic corpora and most web text
    * after extraction normalization. Stays inside whole-stage codegen.
    */
  def asciiSplit(c: Column): Column =
    filter(org.apache.spark.sql.functions.split(c, "\\s+"), t => t =!= lit(""))

  /** Tokenize with optional lowercasing + stopword removal (reference:
    * `stop_words` hook at retrieval_auto.py:362-373, lowercasing at
    * tools/file_parser.py:145-147).
    */
  def tokens(c: Column, lowercase: Boolean = false, stopwords: Seq[String] = Nil): Column = {
    val base = asciiSplit(if (lowercase) lower(c) else c)
    // order/duplicate-preserving: array_except would dedup repeated
    // non-stopword tokens, corrupting tf and doc length downstream
    if (stopwords.isEmpty) base
    else filter(base, t => !array_contains(lit(stopwords.toArray), t))
  }
}
