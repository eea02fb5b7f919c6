package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** KWIC snippet / highlight generation: for each document, the best
  * fixed-width token window — the one covering the most DISTINCT query
  * terms, earliest window on ties. The result-page half of fulltext
  * search (Lucene's highlighter shape); the reference returns ranked ids
  * and leaves presentation to the caller.
  *
  * Scale shape: snippeting runs on the top-k hit docs of a result page,
  * never the corpus — callers restrict `tokenized` to hit docs first (the
  * contract query joins the BM25 top-10). The kernel is a typed map, one
  * incremental O(len) sliding pass per doc (per-term occurrence counts in
  * the window; no per-window rescans), so cost is rows x doc length.
  */
object Snippets {

  final case class Snippet(doc_id: Long, start: Int, n_matched: Int,
                           snippet: String)

  /** (doc_id, start, n_matched, snippet) for each (doc_id, terms) row:
    * `start` is the 1-based token offset of the best window, `n_matched`
    * its distinct-query-term coverage, `snippet` the window's tokens
    * joined by single spaces. Windows are `window` tokens wide; a doc
    * shorter than `window` yields one whole-doc window at start 1.
    */
  def bestWindow(tokenized: DataFrame, queryTerms: Set[String],
                 window: Int): DataFrame = {
    require(window >= 1, s"Snippets.bestWindow: window must be >= 1 (got $window)")
    val spark = tokenized.sparkSession
    import spark.implicits._
    val q = queryTerms // case-class capture keeps the closure small
    tokenized.select(col("doc_id").cast("long"), col("terms"))
      .as[(Long, Seq[String])]
      .map { case (docId, termsSeq) =>
        val terms = termsSeq.toIndexedSeq
        val (start, matched) = bestWindowOf(terms, q, window)
        val end = math.min(start - 1 + window, terms.length)
        Snippet(docId, start, matched,
          terms.slice(start - 1, end).mkString(" "))
      }
      .toDF()
  }

  /** One incremental sliding pass: (1-based best start, distinct matched).
    * Ties keep the earliest window (strict `>` on the running max).
    */
  private[graft] def bestWindowOf(terms: IndexedSeq[String],
                                  queryTerms: Set[String],
                                  window: Int): (Int, Int) = {
    val len = terms.length
    val nWindows = math.max(1, len - window + 1)
    val counts = new java.util.HashMap[String, Int]()
    var inWindow = 0
    def add(t: String): Unit = if (queryTerms.contains(t)) {
      val c = counts.merge(t, 1, (a, b) => a + b)
      if (c == 1) inWindow += 1
    }
    def remove(t: String): Unit = if (queryTerms.contains(t)) {
      val c = counts.merge(t, -1, (a, b) => a + b)
      if (c == 0) inWindow -= 1
    }
    var i = 0
    val first = math.min(window, len)
    while (i < first) { add(terms(i)); i += 1 }
    var best = inWindow
    var bestStart = 1
    var s = 2
    while (s <= nWindows) {
      remove(terms(s - 2))
      add(terms(s + window - 2))
      if (inWindow > best) { best = inWindow; bestStart = s }
      s += 1
    }
    (bestStart, best)
  }
}
