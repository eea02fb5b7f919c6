package graft.fuse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Result fusion + candidate/label dataflow ops — SURVEY §2.3/§2.4/§2.6.
  *
  * These mirror the reference's retrieval post-processing:
  *   - RRF ensemble (`EnsembleRetriever.search`,
  *     `/root/reference/src/retrievals/models/retrieval_auto.py:463-476`)
  *   - chunk-score max-merge (`BaseRanker.rerank`, `base.py:294-300`)
  *   - candidate long table (`get_candidate_dict`, `retrieval_auto.py:138-155`)
  *   - ground-truth labeling (`get_rerank_df`, `retrieval_auto.py:157-192`)
  *   - hard-negative mining (`pipelines/build_hn.py:21-22,94-130`)
  */
object Fusion {

  /** Reciprocal-rank fusion. Input: per-retriever rankings
    * (retriever, query_id, doc_id, rank, weight), rank 1-based. Output:
    * (query_id, doc_id, rrf_score, rank) top-k per query.
    * Semantics: score(doc) = sum over retrievers of w_r / (k_rrf + rank_r).
    */
  def rrf(rankings: DataFrame, kRrf: Int = 60, topK: Int = 10): DataFrame = {
    val fused = rankings
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("weight") / (lit(kRrf) + col("rank"))).as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** Chunk->parent max-merge: (chunk_id, parent_id, score) ->
    * (parent_id, score) keeping the max chunk score per parent, ordered
    * desc with parent_id tiebreak (argsort parity needs a pinned tiebreak).
    */
  def maxMerge(chunkScores: DataFrame): DataFrame =
    chunkScores
      .groupBy(col("parent_id"))
      .agg(max(col("score")).as("score"))

  /** Ground-truth labeling: candidates (query_id, doc_id, score) vs long
    * qrels (query_id, doc_id) -> adds label 1/0. Broadcast-joins qrels when
    * small; plain equi-join otherwise (Catalyst picks).
    */
  def label(candidates: DataFrame, qrels: DataFrame): DataFrame =
    candidates.join(
      qrels.select(col("query_id"), col("doc_id"), lit(1).as("label")),
      Seq("query_id", "doc_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(0)))

  /** Hard-negative candidates: ranked docs in rank window [lo, hi), minus
    * positives (left-anti), then n deterministic pseudo-random picks per
    * query. The reference uses `random.sample` (`build_hn.py:130`); for a
    * reproducible distributed engine the sample is pinned by ordering on
    * md5("query:doc:seed") — stable across runs and partitioning, and
    * replicable by any engine with a standard md5 (the DuckDB oracle
    * computes the identical pick; xxhash64 would be Spark-only).
    */
  def hardNegatives(ranking: DataFrame, qrels: DataFrame,
                    lo: Int, hi: Int, n: Int, seed: Int = 42): DataFrame = {
    val windowed = ranking.filter(col("rank") >= lo && col("rank") < hi)
    val negatives = windowed.join(qrels, Seq("query_id", "doc_id"), "left_anti")
    val pickKey = md5(concat_ws(":",
      col("query_id").cast("string"), col("doc_id").cast("string"),
      lit(seed.toString)))
    val w = Window.partitionBy(col("query_id")).orderBy(pickKey, col("doc_id"))
    negatives.withColumn("pick", row_number().over(w))
      .filter(col("pick") <= n)
      .drop("pick")
  }
}
