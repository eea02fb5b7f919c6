package graft

import org.apache.spark.sql.functions._
import graft.query.{Facets, Snippets}

/** KWIC snippet kernel == exhaustive per-window rescan (property), window
  * edge cases, and ES terms-facet semantics (distinct docs, null skip,
  * rank/topN bounds).
  */
class SnippetFacetSpec extends SparkSpec {
  import spark.implicits._

  // brute force: rescan every window, count distinct query terms
  private def brute(terms: IndexedSeq[String], q: Set[String],
                    w: Int): (Int, Int) = {
    val nWin = math.max(1, terms.length - w + 1)
    val counts = (1 to nWin).map { s =>
      terms.slice(s - 1, math.min(s - 1 + w, terms.length))
        .filter(q.contains).distinct.size
    }
    val best = counts.max
    (counts.indexOf(best) + 1, best)
  }

  test("sliding kernel == exhaustive window rescan (property)") {
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(12)(i => s"w$i")
    val q = Set("w0", "w3", "w7")
    for (_ <- 0 until 300) {
      val len = rnd.nextInt(40) // includes 0-length docs
      val terms = IndexedSeq.fill(len)(vocab(rnd.nextInt(vocab.length)))
      val w = 1 + rnd.nextInt(12)
      val got = Snippets.bestWindowOf(terms, q, w)
      assert(got == brute(terms, q, w), s"len=$len w=$w terms=$terms")
    }
  }

  test("bestWindow: earliest tie, short doc, repeated terms count once") {
    val tok = Seq(
      // w0 at 2 and 6: window 3 covers one at a time -> earliest (start 1)
      (1L, Seq("x", "w0", "x", "x", "x", "w0", "x")),
      // doc shorter than the window: whole doc, start 1
      (2L, Seq("w0", "w3")),
      // repeated query term in one window counts once; the (w0,w3) window wins
      (3L, Seq("w0", "w0", "w0", "x", "w0", "w3"))).toDF("doc_id", "terms")
    val got = Snippets.bestWindow(tok, Set("w0", "w3"), window = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 1, 1, "x w0 x")))
    assert(got(1) == ((2L, 1, 2, "w0 w3")))
    assert(got(2) == ((3L, 4, 2, "x w0 w3")))
  }

  test("termsFacet: distinct docs, null facets skipped, topN + rank order") {
    val hits = Seq(
      (1L, 10L), (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), // dup collapses
      (2L, 10L), (2L, 14L)).toDF("query_id", "doc_id")
    val docs = Seq(
      (10L, "en"), (11L, "en"), (12L, "fr"), (13L, null.asInstanceOf[String]),
      (14L, "de")).toDF("doc_id", "lang")
    val got = Facets.termsFacet(hits, docs, "lang", topN = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    // q1: en=2 (10,11), fr=1; null-lang doc 13 skipped; topN=2 caps
    // q2: de=1, en=1 -> facet asc tiebreak
    assert(got == Seq(
      (1L, "en", 2L, 1), (1L, "fr", 1L, 2),
      (2L, "de", 1L, 1), (2L, "en", 1L, 2)))
  }
}
