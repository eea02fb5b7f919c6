package graft

import graft.index.InvertedIndex
import graft.query.Phrase
import org.apache.spark.sql.functions._

/** Phrase candidate-then-verify semantics: sliding (overlapping) counts,
  * conjunctive candidate pruning, short-doc edges.
  */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private def tok(rows: (Long, String)*) =
    InvertedIndex.tokenize(rows.toDF("doc_id", "text"), "doc_id", "text")

  test("sliding phrase count includes overlapping matches") {
    val t = tok(
      0L -> "a a a",        // "a a" -> 2 overlapping matches
      1L -> "a b a b a",    // "a b" -> 2
      2L -> "b a",          // "a b" -> 0, "a a" -> 0
      3L -> "a")            // shorter than any 2-gram
    val counts = t.select(col("doc_id"),
        Phrase.phraseCount(col("terms"), Seq("a", "a")).as("aa"),
        Phrase.phraseCount(col("terms"), Seq("a", "b")).as("ab"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts(0L) == ((2L, 0L)))
    assert(counts(1L) == ((0L, 2L)))
    assert(counts(2L) == ((0L, 0L)))
    assert(counts(3L) == ((0L, 0L)))
  }

  test("candidates require ALL distinct terms; verify kills non-adjacent") {
    val t = tok(
      0L -> "x table deep scan y",  // both terms, NOT adjacent -> no hit
      1L -> "x table scan y",       // adjacent -> 1
      2L -> "table only here",      // missing 'scan' -> pruned pre-verify
      3L -> "scan table scan table scan") // 'table scan' x2
    val post = InvertedIndex.postings(t)
    assert(Phrase.candidates(post, Seq("table", "scan"))
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L, 3L))
    val hits = Phrase.topK(t, post, Seq("table", "scan"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .sortBy(_._3)
    assert(hits == Seq((3L, 2L, 1), (1L, 1L, 2)))
  }

  test("packed-index candidates == flat-postings candidates; tombstones honored") {
    val t = tok(
      0L -> "x table deep scan y",
      1L -> "x table scan y",
      2L -> "table only here",
      3L -> "scan table scan table scan")
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-idx").toString
    graft.index.PackedIndex.build(t, dir, shardBits = 1, groups = 2)
    val flat = Phrase.candidates(InvertedIndex.postings(t), Seq("table", "scan"))
      .collect().map(_.getLong(0)).toSet
    val packed = Phrase.candidatesPacked(spark, dir, Seq("table", "scan"))
      .collect().map(_.getLong(0)).toSet
    assert(packed == flat)
    graft.index.PackedIndex.delete(dir, Seq(3L))
    val afterDel = Phrase.candidatesPacked(spark, dir, Seq("table", "scan"))
      .collect().map(_.getLong(0)).toSet
    assert(afterDel == flat - 3L)
  }

  test("phraseCount == plain sliding count on random docs (property)") {
    val rnd = new scala.util.Random(17)
    val vocab = Array("a", "b", "c", "d")
    val docs = (0 until 60).map { i =>
      i.toLong -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val t = tok(docs: _*)
    for (phrase <- Seq(Seq("a"), Seq("a", "b"), Seq("b", "b"), Seq("a", "b", "a"))) {
      val got = t.select(col("doc_id"),
          Phrase.phraseCount(col("terms"), phrase).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val want = (0 to toks.length - phrase.length)
          .count(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
        assert(got(id) == want.toLong,
          s"doc $id '$text' phrase $phrase: got ${got(id)} want $want")
      }
    }
  }

  test("duplicate-term phrase uses distinct terms for candidates") {
    val t = tok(0L -> "go go go", 1L -> "go stop go")
    val post = InvertedIndex.postings(t)
    val hits = Phrase.topK(t, post, Seq("go", "go"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(0L -> 2L)) // "go go" twice in doc 0, zero in doc 1
  }
}
