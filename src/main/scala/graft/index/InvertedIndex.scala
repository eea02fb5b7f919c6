package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Bm25Params

/** Declarative (DataFrame/Catalyst) inverted-index construction and
  * exhaustive BM25 scoring.
  *
  * This is the *logical* index: flat postings `(term, doc_id, tf)`, doc
  * lengths, corpus stats and the eps-floored idf table, all as DataFrames so
  * Catalyst gets predicate pushdown / partial aggregation / broadcast
  * selection for free. The physically packed, block-compressed index used by
  * the WAND kernel lives in [[graft.index.PackedIndex]]; this flat form is
  * the correctness oracle and the build front-end (the packed form is derived
  * from these DataFrames).
  *
  * Reference semantics: BM25Okapi construction invoked at
  * `/root/reference/src/retrievals/models/retrieval_auto.py:384` — tf per
  * (doc, term), df per term, corpus avgdl, idf with epsilon floor (see
  * [[graft.core.Bm25]]).
  *
  * Scale notes (100 TB / 10^12 docs):
  *  - `explode(terms)` + `groupBy(doc_id, term)` is a map-side-combinable
  *    hash aggregation; the only shuffle is on (doc_id, term) which is
  *    near-uniform (doc_id dominates the key) — no stopword skew here.
  *  - df aggregation shuffles on `term` alone, which IS skewed in key
  *    frequency but not in bytes-per-key (one long per posting); partial
  *    aggregation collapses each map partition to one row per term first,
  *    so the reduce side sees at most numPartitions rows per term.
  *  - the idf table is vocabulary-sized (≪ corpus) and is broadcast.
  */
object InvertedIndex {

  /** (doc_id LONG, terms ARRAY<STRING>) from a text column.
    * @param exact true (default) -> the native PyWsTokenize Catalyst
    *              expression with full CPython whitespace parity; false ->
    *              the ASCII regex split (equal on ASCII-whitespace text and
    *              matched by the DuckDB oracles' regexp_split).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               lowercase: Boolean = false, stopwords: Seq[String] = Nil,
               exact: Boolean = true): DataFrame = {
    val text = if (lowercase) lower(col(textCol)) else col(textCol)
    val base =
      if (exact) graft.plans.GraftFunctions.py_ws_tokenize(text)
      else graft.tokenize.PyTokenize.asciiSplit(text)
    // order/duplicate-preserving stopword filter (array_except would return
    // DISTINCT tokens, corrupting tf and doc length)
    val terms =
      if (stopwords.isEmpty) base
      else filter(base, t => !array_contains(lit(stopwords.toArray), t))
    docs.select(col(idCol).cast("long").as("doc_id"), terms.as("terms"))
  }

  /** Flat postings (term, doc_id, tf) — operator A1 in SURVEY §2.4. */
  def postings(tokenized: DataFrame): DataFrame =
    tokenized
      .select(col("doc_id"), explode(col("terms")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (doc_id, dl) document lengths in tokens. */
  def docLens(tokenized: DataFrame): DataFrame =
    tokenized.select(col("doc_id"), size(col("terms")).cast("long").as("dl"))

  /** Single-row corpus stats (n, avgdl) — broadcast at query time.
    * avgdl is exact-Long-sum / count (order-independent, deterministic at
    * any parallelism), matching the in-JVM oracle bit-for-bit; a
    * double-accumulating avg() would drift by ulps with partitioning.
    */
  def corpusStats(docLensDf: DataFrame): DataFrame =
    docLensDf.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** (term, df) document frequency — operator A2. */
  def docFreq(postingsDf: DataFrame): DataFrame =
    postingsDf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** (term, df, idf) with the rank_bm25 epsilon floor. `n` is the corpus
    * size; the floor constant is `epsilon * avg(raw idf over whole vocab)`.
    * Two tiny aggregations over a vocabulary-sized table — cheap at any
    * corpus scale.
    */
  def idfTable(docFreqDf: DataFrame, n: Long, p: Bm25Params = Bm25Params()): DataFrame = {
    val eps = p.epsilon * avgRawIdf(docFreqDf, n)
    docFreqDf
      .withColumn("raw_idf",
        log(lit(n.toDouble) - col("df") + 0.5) - log(col("df") + 0.5))
      .withColumn("idf",
        when(col("raw_idf") < 0.0, lit(eps)).otherwise(col("raw_idf")))
      .select(col("term"), col("df"), col("idf"))
  }

  /** Deterministic vocabulary-average raw idf via the (df -> termCount)
    * histogram (see [[graft.core.Bm25.avgRawIdfFromHistogram]]). The
    * histogram has one row per distinct df value — tiny relative to the
    * vocabulary even at web scale.
    */
  def avgRawIdf(docFreqDf: DataFrame, n: Long): Double = {
    val hist = docFreqDf.groupBy(col("df")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    graft.core.Bm25.avgRawIdfFromHistogram(hist, n)
  }

  /** BM25 contribution column over (tf, dl) given broadcastable idf/avgdl. */
  def bm25Term(idf: Column, tf: Column, dl: Column, avgdl: Column, p: Bm25Params): Column =
    idf * tf * lit(p.k1 + 1.0) /
      (tf + lit(p.k1) * (lit(1.0) - lit(p.b) + lit(p.b) * dl / avgdl))

  /** Exhaustive BM25 scores for one query (list of raw tokens, duplicates
    * count per occurrence) over the whole corpus — semantics of
    * `bm25.get_scores` at retrieval_auto.py:391. Returns
    * (doc_id, score) for every doc containing at least one query term;
    * docs with no overlap score 0.0 in the reference and are omitted here
    * (callers needing the dense vector can right-join docLens with
    * coalesce(score, 0)).
    *
    * Plan shape: postings filtered by the tiny query-term set (predicate
    * pushdown to the source), broadcast-joined to the (terms × multiplicity)
    * table and the idf table, then one hash aggregation by doc_id.
    */
  def scoreQuery(postingsDf: DataFrame, idfDf: DataFrame, docLensDf: DataFrame,
                 avgdl: Double, queryTerms: Seq[String],
                 p: Bm25Params = Bm25Params()): DataFrame = {
    val spark = postingsDf.sparkSession
    import spark.implicits._
    val qt = queryTerms.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .toDF("term", "q_mult")
    postingsDf
      .join(broadcast(qt), "term")
      .join(broadcast(idfDf.select(col("term"), col("idf"))), "term")
      .join(docLensDf, "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(col("q_mult") *
        bm25Term(col("idf"), col("tf"), col("dl"), lit(avgdl), p)).as("score"))
  }

  /** Filtered retrieval (SURVEY §2.1 S9 — the Elasticsearch integration's
    * `bool: {must: match, filter: ...}` shape, retrieval_elastic semantics):
    * restrict the CANDIDATE set to `allowedDocs` while scoring with
    * FULL-corpus statistics — the filter never changes idf/avgdl, exactly
    * like an ES filter context. Candidates are removed by a doc_id
    * left-semi join on the postings BEFORE the score aggregation
    * (filter-then-score): at 100 TB a selective metadata filter kills most
    * postings before the groupBy shuffle, and Catalyst broadcasts the
    * allowed side when it is small (AQE decides at runtime).
    */
  def scoreQueryFiltered(postingsDf: DataFrame, idfDf: DataFrame,
                         docLensDf: DataFrame, avgdl: Double,
                         queryTerms: Seq[String], allowedDocs: DataFrame,
                         p: Bm25Params = Bm25Params()): DataFrame =
    scoreQuery(
      postingsDf.join(allowedDocs.select(col("doc_id")), Seq("doc_id"), "left_semi"),
      idfDf, docLensDf, avgdl, queryTerms, p)

  /** [[scoreQuery]] over a (doc_id, term, tf, dl) source (the shuffle-free
    * [[graft.index.PackedIndex.postingsWithDl]] kernel): dl rides each
    * posting row, so the docLens join disappears — the only wide operation
    * left is the final per-doc score aggregation (r7; at corpus scale this
    * removes both the explode+groupBy postings shuffle and the doc_id
    * join from every exhaustive-scoring query).
    */
  def scoreQueryPostingsDl(postingsDl: DataFrame, idfDf: DataFrame,
                           avgdl: Double, queryTerms: Seq[String],
                           p: Bm25Params = Bm25Params()): DataFrame = {
    val spark = postingsDl.sparkSession
    import spark.implicits._
    val qt = queryTerms.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .toDF("term", "q_mult")
    postingsDl
      .join(broadcast(qt), "term")
      .join(broadcast(idfDf.select(col("term"), col("idf"))), "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("q_mult") *
        bm25Term(col("idf"), col("tf"), col("dl"), lit(avgdl), p)).as("score"))
  }

  /** Rank the scored docs: score desc, doc_id asc tiebreak (pinned for
    * determinism — SURVEY §2.5 W1), keep top k.
    *
    * Physical shape: `orderBy(...).limit(k)` compiles to Catalyst's
    * `TakeOrderedAndProject` — per-partition bounded heaps merged on the
    * driver over k rows total. The alternative (a global `Window.orderBy`
    * with no partitionBy) funnels EVERY matched doc — potentially the whole
    * corpus for a stopword-ish query — through one task, a scale-killer at
    * 100x. The window here only assigns rank over the k surviving rows
    * (bounded, single tiny partition by construction). The multi-query
    * batched path windows per query_id ([[graft.query.Bm25Query]]).
    */
  def topK(scored: DataFrame, k: Int): DataFrame =
    rankBounded(scored.orderBy(col("score").desc, col("doc_id").asc).limit(k),
      col("doc_id"), col("score").desc, col("doc_id").asc)

  /** Assign rank 1..n over an ALREADY-BOUNDED frame (≤ k rows after a
    * limit). The single partition is intentional (input is k rows by
    * construction); partitioning on `pmod(key, 1)` — value-constant 0 but
    * NOT foldable, so Catalyst's EliminateWindowPartitions keeps it — stops
    * Spark from logging the "No Partition Defined" scale warning reserved
    * for genuinely unbounded global windows.
    *
    * @param key any numeric column of the frame (used only to defeat
    *            constant folding; its values never matter)
    */
  def rankBounded(bounded: DataFrame, key: Column, order: Column*): DataFrame = {
    val w = Window.partitionBy(pmod(key, lit(1))).orderBy(order: _*)
    bounded.withColumn("rank", row_number().over(w))
  }
}
