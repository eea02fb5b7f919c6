package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phrase search WITHOUT a positional index — the candidate-then-verify
  * shape engines use when positions aren't stored (reference analogue:
  * none; the reference has no phrase operator — this extends the engine's
  * fulltext surface): conjunctive candidate generation from the inverted
  * postings (docs containing ALL distinct phrase terms — an aggregation
  * that kills most of the corpus before any text is touched), then exact
  * sliding-window adjacency verification over ONLY the candidates' token
  * arrays (left-semi join; the corpus text is never shuffled).
  *
  * tf = number of sliding phrase matches (overlaps counted); top-k by
  * (phrase_tf desc, doc_id asc) — deterministic, SQL-expressible, so the
  * whole operator carries an exact DuckDB oracle (q_phrase_topk).
  */
object Phrase {

  /** Sliding-window occurrence count of `phrase` in a token-array column
    * (overlapping matches count). Pure declarative Catalyst — the phrase is
    * a literal, so the whole predicate folds into one codegen'd aggregate
    * over a per-row sequence.
    */
  def phraseCount(terms: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phraseCount: empty phrase")
    val L = phrase.length
    when(size(terms) < L, lit(0L)).otherwise(
      aggregate(
        sequence(lit(0), size(terms) - L),
        lit(0L),
        (acc, i) => acc + when(
          phrase.zipWithIndex.map { case (p, j) =>
            get(terms, i + lit(j)) === lit(p)
          }.reduce(_ && _), lit(1L)).otherwise(lit(0L))))
  }

  /** Docs whose postings contain EVERY distinct phrase term (conjunctive
    * candidate set). The term IN-filter pushes to the postings source; the
    * aggregation emits doc ids only.
    */
  def candidates(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    val distinctTerms = phrase.distinct
    postings.filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === distinctTerms.size)
      .select(col("doc_id"))
  }

  /** Conjunctive candidates straight from a PACKED index dir: the term
    * IN-filter pushes to the postings parquet, block headers prune nothing
    * here (all blocks of a matching term decode), but only the phrase
    * terms' lists are ever read — the production shape for phrase search
    * against the stored index. Honors tombstones.
    */
  def candidatesPacked(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, phrase: Seq[String]): DataFrame = {
    import spark.implicits._
    val distinctTerms = phrase.distinct
    val tomb = graft.index.PackedIndex.loadTombstones(indexDir)
    val bcTomb = spark.sparkContext.broadcast(tomb)
    val pairs = graft.index.PackedIndex.loadPostings(spark, indexDir)
      .filter(col("term").isin(distinctTerms: _*))
      .flatMap { pp =>
        val t = bcTomb.value
        pp.blocks.iterator.flatMap(_.toCodec.decodeDocIds.iterator)
          .filter(d => java.util.Arrays.binarySearch(t, d) < 0)
          .map(d => (d, pp.term))
      }.toDF("doc_id", "term")
    pairs.groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === distinctTerms.size)
      .select(col("doc_id"))
  }

  /** Top-k docs by sliding phrase count. `tokenized` is (doc_id, terms);
    * `postings` is the flat (term, doc_id, tf) table over the same corpus.
    */
  def topK(tokenized: DataFrame, postings: DataFrame,
           phrase: Seq[String], k: Int): DataFrame = {
    val counted = tokenized
      .join(candidates(postings, phrase), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), phraseCount(col("terms"), phrase).as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
    val bounded = counted
      .orderBy(col("phrase_tf").desc, col("doc_id").asc).limit(k)
    graft.index.InvertedIndex.rankBounded(bounded, col("doc_id"),
      col("phrase_tf").desc, col("doc_id").asc)
  }
}
