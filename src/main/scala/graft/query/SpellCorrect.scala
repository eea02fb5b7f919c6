package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spell correction / did-you-mean over the corpus vocabulary — the
  * query-assist arm every lexical search deployment carries (the
  * reference's retriever takes queries as given; this is engine-side
  * added capability like phrase/NEAR).
  *
  * Candidate generation is SymSpell-shaped and scale-safe: the term
  * dictionary explodes into single-character DELETION variants once
  * (V x avg_len rows, built offline next to the index), and a query term
  * joins the variant table through its own variants — two terms are
  * within Levenshtein distance 1 iff they share a variant-or-self string
  * (delete: the shorter IS a variant of the longer; substitute: both
  * delete the differing position; insert: symmetric to delete), so the
  * join prunes the vocabulary to a tiny candidate set WITHOUT an O(V)
  * scan per query term. Shared variants overmatch at distance 2 (e.g.
  * 'ab' vs 'ba' share variant 'a'), so candidates pass through the exact
  * codegen'd `levenshtein` filter — pruning is performance, the distance
  * predicate is the semantics, which makes the operator oracle-exact
  * against DuckDB's own levenshtein().
  *
  * Skew: a hot variant (short strings shared by many terms) is capped at
  * [[MaxTermsPerVariant]] keeping the highest-df terms — a dropped
  * candidate would have lost the df ranking anyway unless every kept
  * sibling outranks it, and the cap is recorded in the index frame for
  * drop accounting.
  */
object SpellCorrect {

  /** Per-variant candidate cap (keeps top-df terms). 1000 keeps every
    * realistic cell: English vocab puts < 300 length-<=6 terms on one
    * deletion variant; only degenerate synthetic vocabs go higher.
    */
  val MaxTermsPerVariant = 1000

  /** All single-character deletion variants of `term` plus the term
    * itself, as a deduplicated array column.
    */
  private def variantsCol(term: org.apache.spark.sql.Column) =
    array_distinct(concat(
      array(term),
      transform(sequence(lit(1), length(term)),
        i => concat(term.substr(lit(1), i - 1),
          term.substr(i + 1, length(term))))))

  /** (variant, term, df) deletion index over a (term, df) dictionary —
    * built once per index lifecycle; hot variants capped at
    * [[MaxTermsPerVariant]] by descending df (ties: term asc).
    */
  def deletionIndex(dict: DataFrame,
                    maxTermsPerVariant: Int = MaxTermsPerVariant): DataFrame = {
    val exploded = dict
      .select(col("term"), col("df").cast("long").as("df"),
        explode(variantsCol(col("term"))).as("variant"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("variant"))
      .orderBy(col("df").desc, col("term").asc)
    exploded
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxTermsPerVariant)
      .drop("__r")
  }

  /** Vocabulary (term, df) from a tokenized (doc_id, terms) frame. */
  def dictionary(tokenized: DataFrame): DataFrame =
    tokenized
      .select(col("doc_id"), explode(array_distinct(col("terms"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-k suggestions within Levenshtein distance <= 1 for each query
    * term, ranked by (df desc, term asc). `queries` is (query_id, term).
    * The query side is tiny and broadcast; the variant join prunes, the
    * exact levenshtein predicate decides.
    */
  def suggest(queries: DataFrame, deletionIdx: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(col("query_id"), col("term").as("q_term"),
        explode(variantsCol(col("term"))).as("variant"))
    val cand = broadcast(q)
      .join(deletionIdx, Seq("variant"))
      .select(col("query_id"), col("q_term"), col("term"), col("df"))
      .distinct()
      .filter(levenshtein(col("q_term"), col("term")) <= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), col("q_term"))
      .orderBy(col("df").desc, col("term").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("q_term"), col("term").as("suggestion"),
        col("df"), col("rank"))
  }

  /** Autocomplete / prefix suggest: top-k dictionary terms starting with
    * `prefix`, ranked by (df desc, term asc). Declarative filter-then-rank:
    * against a persisted dictionary the prefix predicate pushes down to the
    * parquet scan (StringStartsWith), orderBy+limit bounds the rows
    * (TakeOrderedAndProject) before the rank window touches them.
    */
  def prefixSuggest(dict: DataFrame, prefix: String, k: Int): DataFrame = {
    require(prefix.nonEmpty, "SpellCorrect.prefixSuggest: empty prefix")
    val bounded = dict
      .filter(col("term").startsWith(prefix))
      .select(col("term"), col("df").cast("long").as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(k)
    graft.index.InvertedIndex.rankBounded(bounded, length(col("term")),
      col("df").desc, col("term").asc)
  }

  /** ES fuzziness=1 expansion set: ALL distinct vocabulary terms within
    * Levenshtein distance <= 1 of any of `terms` (including the terms
    * themselves when indexed), sorted asc for a deterministic rewrite
    * order. Same candidate join as [[suggest]] with the exact levenshtein
    * predicate deciding; collected to the driver because the result IS the
    * rewritten query (bounded by the distance-1 neighborhoods — a few
    * dozen terms — the same driver residency as the query batch itself).
    *
    * NOTE on the cap: a deletion index built with the default
    * [[MaxTermsPerVariant]] can in principle drop a distance-1 neighbor of
    * a degenerate hot variant; build the index uncapped (Int.MaxValue) if
    * exhaustive expansion must be guaranteed on adversarial vocabularies.
    */
  def expandTerms(spark: SparkSession, terms: Seq[String],
                  deletionIdx: DataFrame): Seq[String] =
    expandBatch(spark, Seq(0L -> terms), deletionIdx)
      .getOrElse(0L, Seq.empty)

  /** Batch form of [[expandTerms]]: ONE Spark job expands every query's
    * token set (the whole batch's (query_id, token) pairs ride a single
    * broadcast variant join), returning query_id -> sorted distinct
    * expansion. Queries with no indexed neighbor are absent from the map.
    */
  def expandBatch(spark: SparkSession, queries: Seq[(Long, Seq[String])],
                  deletionIdx: DataFrame): Map[Long, Seq[String]] = {
    import spark.implicits._
    val pairs = queries.flatMap { case (id, ts) => ts.distinct.map(id -> _) }
    if (pairs.isEmpty) return Map.empty
    val q = pairs.toDF("query_id", "q_term")
      .select(col("query_id"), col("q_term"),
        explode(variantsCol(col("q_term"))).as("variant"))
    broadcast(q)
      .join(deletionIdx, Seq("variant"))
      .filter(levenshtein(col("q_term"), col("term")) <= 1)
      .select(col("query_id"), col("term")).distinct()
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSeq.sorted).toMap
  }

  /** Fuzzy (typo-tolerant) BM25 retrieval: rewrite each query's tokens to
    * their distance-1 vocabulary expansion (distinct union, each expanded
    * term scoring once with its own idf — the ES `fuzziness: 1` match
    * shape) and serve the rewrite through the block-max WAND kernel.
    * Queries whose expansion is empty return no rows (nothing to score).
    */
  def fuzzySearch(spark: SparkSession, indexDir: String,
                  queries: Seq[(Long, String)], k: Int,
                  deletionIdx: DataFrame): DataFrame = {
    val tokenized = queries.map { case (id, text) =>
      id -> graft.tokenize.PyTokenize.split(text).toSeq
    }
    val expanded = expandBatch(spark, tokenized, deletionIdx)
    val rewritten = tokenized.collect {
      case (id, _) if expanded.contains(id) => id -> expanded(id).mkString(" ")
    }
    Wand.search(spark, indexDir, rewritten, k)
  }

  /** One-call form over a tokenized corpus (dictionary + index built
    * inline — serving deployments persist [[deletionIndex]] instead).
    */
  def suggestFromCorpus(spark: SparkSession, tokenized: DataFrame,
                        queryTerms: Seq[(Long, String)], k: Int): DataFrame = {
    import spark.implicits._
    suggest(queryTerms.toDF("query_id", "term"),
      deletionIndex(dictionary(tokenized)), k)
  }
}
