package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  * All are single-pass, codegen-friendly column expressions (no UDFs), so
  * they fuse into one WholeStageCodegen span over the corpus scan.
  */
object TextAnalysis {

  /** Whitespace token count (cheap, exact wrt the engine tokenizer on
    * ASCII-whitespace text).
    */
  def tokenCount(text: Column): Column =
    size(graft.tokenize.PyTokenize.asciiSplit(text))

  /** BPE-ish subword count estimate: word-boundary pieces plus length/4
    * overflow per long word — a deterministic, vocabulary-free stand-in for
    * tokenizer-based counting (the real BPE vocab is a model artifact, out
    * of scope per SURVEY §2.8 F13 note).
    */
  def subwordCountEstimate(text: Column): Column = {
    val words = graft.tokenize.PyTokenize.asciiSplit(text)
    aggregate(words, lit(0),
      (acc, w) => acc + lit(1) + (length(w) / lit(4)).cast("int"))
  }

  /** GPT-2-style BPE pre-tokenizer pattern, restricted to lookahead-free
    * EXPLICIT ASCII classes so Java regex and RE2 (DuckDB) agree
    * match-for-match (Java's \s includes \x0B, RE2's does not — so no \s
    * anywhere): contractions, letter runs, digit runs, punctuation runs
    * (each optionally space-prefixed), whitespace runs.
    */
  val BpeWs = " \\t\\n\\f\\r"
  val BpePattern: String =
    s"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$BpeWs]+|[$BpeWs]+"

  /** BPE-ish regex piece count: non-whitespace matches of [[BpePattern]] —
    * the vocabulary-free token-budget estimator a training pipeline uses
    * for mixture weighting (the real BPE merge table is a model artifact,
    * out of scope). Oracle-checked: DuckDB recomputes the identical count.
    */
  def bpeishCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(BpePattern), lit(0)),
      p => !(p rlike s"^[$BpeWs]+$$")))

  /** Quality features per document (ratios in [0,1], safe on empty text). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast("double")
    val nonEmpty = n > 0
    def ratio(c: Column): Column = when(nonEmpty, c / n).otherwise(0.0)
    val words = graft.tokenize.PyTokenize.asciiSplit(text)
    val nWords = size(words).cast("double")
    Seq(
      "n_chars" -> length(text).cast("long"),
      "n_tokens" -> size(words).cast("long"),
      "mean_token_len" -> when(nWords > 0,
        aggregate(words, lit(0L), (a, w) => a + length(w)).cast("double") / nWords)
        .otherwise(0.0),
      "punct_ratio" -> ratio(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))),
      "digit_ratio" -> ratio(length(regexp_replace(text, "[^0-9]", ""))),
      "upper_ratio" -> ratio(length(regexp_replace(text, "[^A-Z]", ""))),
      "space_ratio" -> ratio(length(regexp_replace(text, "[^ ]", "")))
    )
  }

  /** Composite quality score: length-normalized, penalizing punct/digit
    * walls — a deterministic heuristic in [0,1] (shape of C4/Gopher-style
    * web-text filters, arithmetic only so it is SQL-oracle-checkable).
    */
  def qualityScore(text: Column): Column = {
    val feats = qualityFeatures(text).toMap
    val lenScore = least(feats("n_tokens").cast("double") / 100.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - feats("punct_ratio") * 5.0)
    val digitPenalty = greatest(lit(0.0), lit(1.0) - feats("digit_ratio") * 5.0)
    round(lenScore * punctPenalty * digitPenalty, 6)
  }

  /** Tiny per-language function-word lists for the n-gram/stopword
    * language-ID heuristic. Deterministic public common-word lists.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"))

  /** Language ID: per-language score = |tokens ∩ stopwords_lang| /
    * |tokens|; winner (ties -> lexicographically first language,
    * no-signal -> "und"). Pure array arithmetic, broadcastable lists.
    */
  def langId(text: Column): Column = {
    val toks = graft.tokenize.PyTokenize.asciiSplit(lower(text))
    val scores = langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      // negated score + asc sort pins ties to the lexicographically FIRST lang
      struct((-size(array_intersect(toks, lit(words.toArray)))).as("neg_score"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(scores: _*), asc = true).getItem(0)
    when(best.getField("neg_score") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: sha2-256 of whitespace-normalized, lowercased
    * text, first 16 hex chars (reference's file hash takes sha256[:8],
    * `tools/file_parser.py:263-270`; 16 here for collision headroom at
    * 10^12 docs).
    */
  def fingerprint(text: Column): Column =
    substring(sha2(
      regexp_replace(trim(lower(text)), "\\s+", " "), 256), 1, 16)
}
