package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-level retriever surface — the Spark equivalent of the reference's
  * `BaseRetriever` ABC (`models/retrieval_auto.py:21-37`): a strategy object
  * producing (query_id, doc_id, score, rank) for a query batch.
  */
trait Retriever extends Serializable {
  def search(spark: SparkSession, queries: Seq[(Long, String)], k: Int): DataFrame
}

/** Sparse lexical retriever over a packed index dir — `BM25Retrieval`.
  * `allowedDocs` is the optional ES-style filter context (candidates
  * restricted, stats full-corpus); `minShouldMatch` the ES msm gate
  * (docs must match >= m distinct query terms); tombstoned docs are
  * always excluded. All options compose.
  */
final class Bm25WandRetriever(indexDir: String,
                              allowedDocs: Option[Array[Long]] = None,
                              minShouldMatch: Int = 1)
    extends Retriever {
  override def search(spark: SparkSession, queries: Seq[(Long, String)],
                      k: Int): DataFrame =
    Wand.search(spark, indexDir, queries, k, allowedDocs,
      minShouldMatch = minShouldMatch)
}

/** Dense retriever over an embeddings table — the `AutoModelForRetrieval`
  * cosine path with a pluggable query encoder (the reference's neural
  * encoder is a model artifact; any deterministic text->vector function
  * slots in).
  */
final class CosineRetriever(corpus: DataFrame,
                            encode: String => Array[Double]) extends Retriever {
  override def search(spark: SparkSession, queries: Seq[(Long, String)],
                      k: Int): DataFrame = {
    import spark.implicits._
    val q = queries.map { case (id, text) => (id, encode(text)) }
      .toDF("query_id", "qvec")
    graft.ann.Ann.bruteForceTopK(q, corpus, k)
      .withColumnRenamed("vec_id", "doc_id")
      .withColumnRenamed("cos", "score")
  }
}

/** Positional retriever over a packed index's positional arm —
  * phrase / ordered-proximity / unordered-NEAR semantics selected by
  * `mode`, served through the batched kernel ([[Phrase.search]]). Query
  * text is tokenized with the engine's exact tokenizer and mapped to the
  * mode's [[PositionalQuery]]. score = the match count (an exact integer),
  * so the rank order is SQL-replicable and positional members keep
  * ensembles oracle-checkable.
  */
final class PositionalRetriever(indexDir: String,
                                mode: PositionalMode = PositionalMode.PhraseMode)
    extends Retriever {
  override def search(spark: SparkSession, queries: Seq[(Long, String)],
                      k: Int): DataFrame =
    Phrase.search(spark, indexDir,
      queries.map { case (id, text) => id -> mode.parse(text) }, k)
}

/** Typo-tolerant lexical retriever (ES `fuzziness: 1` match): queries are
  * rewritten to their distance-1 vocabulary expansion through a persisted
  * SymSpell deletion index and served via the WAND kernel
  * ([[SpellCorrect.fuzzySearch]]). Slots into ensembles like any other
  * member — a fuzzy + exact RRF fusion is the classic typo-robust serving
  * stack.
  */
final class FuzzyRetriever(indexDir: String, deletionIdx: DataFrame)
    extends Retriever {
  override def search(spark: SparkSession, queries: Seq[(Long, String)],
                      k: Int): DataFrame =
    SpellCorrect.fuzzySearch(spark, indexDir, queries, k, deletionIdx)
}

/** Rank-stability adapter: re-ranks an inner retriever's hits on the score
  * ROUNDED to `digits` decimal places (ties broken doc_id asc), fetching
  * `overfetch` raw hits per query so near-ties at the k boundary are
  * resolved on the rounded value — the same rounding/tie-break contract the
  * oracle-checked BM25 contract queries pin, exposed as a composable
  * Retriever so ensembles over raw-double scorers are SQL-replicable.
  * (As with those queries, a doc outside the raw top-`overfetch` that
  * rounds into the top-k is not recovered — size `overfetch` >> k.)
  */
final class RoundedRankRetriever(inner: Retriever, digits: Int,
                                 overfetch: Int = 200) extends Retriever {
  override def search(spark: SparkSession, queries: Seq[(Long, String)],
                      k: Int): DataFrame = {
    require(overfetch >= k,
      s"RoundedRankRetriever: overfetch=$overfetch < k=$k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    inner.search(spark, queries, overfetch)
      .withColumn("score", round(col("score"), digits))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }
}

/** RRF ensemble of retrievers — `EnsembleRetriever`
  * (`models/retrieval_auto.py:448-476`): per-retriever rank lists fused by
  * weighted reciprocal rank.
  */
final class EnsembleRetriever(retrievers: Seq[(Retriever, Double)],
                              kRrf: Int = 60) extends Retriever {
  override def search(spark: SparkSession, queries: Seq[(Long, String)],
                      k: Int): DataFrame = {
    val ranked = retrievers.zipWithIndex.map { case ((r, w), i) =>
      r.search(spark, queries, k)
        .select(lit(s"r$i").as("retriever"), col("query_id"), col("doc_id"),
          col("rank"), lit(w).as("weight"))
    }.reduce(_ unionByName _)
    graft.fuse.Fusion.rrf(ranked, kRrf, k)
  }
}
