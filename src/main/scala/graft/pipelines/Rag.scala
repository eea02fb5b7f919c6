package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.query.Retriever

/** Composed RAG pipeline — the Spark shape of `SimpleRAG.process_query`
  * (`/root/reference/src/retrievals/pipelines/rag.py:77-109`):
  *
  *   retrieve top-k  ->  (optional) chunk-rerank max-merge  ->  context
  *   assembly ("\n".join of result contents in rank order, `_prepare_context`
  *   rag.py:99-101)  ->  citation extraction (`extract_citations`
  *   rag.py:103-109).
  *
  * The generator itself is a model artifact and is NOT ported (same scope
  * rule as encoders); the pipeline output is the assembled per-query context
  * plus the parsed citation set — everything the reference computes before
  * and after the LLM call.
  *
  * Plan shape: one retriever search (k rows per query), a broadcast-sized
  * join back to doc text restricted to the hit doc_ids, one groupBy(query_id)
  * for assembly — rank-ordered via array_sort(collect_list(struct)) whose
  * group size is exactly k, so the agg buffers are bounded by construction.
  */
object Rag {

  /** Run the pipeline for a query batch. Returns one row per query:
    * (query_id, context STRING, cites ARRAY<INT>).
    *
    * @param docs    (doc_id, text) source the contexts are assembled from
    * @param reranker optional chunk-level rerank hook: given the joined
    *                 (query_id, doc_id, score, rank, text) hits, return the
    *                 same shape re-scored (the reference's
    *                 `reranker.rerank`); defaults to identity.
    */
  def processQueries(spark: SparkSession, retriever: Retriever,
                     queries: Seq[(Long, String)], docs: DataFrame, topK: Int,
                     reranker: DataFrame => DataFrame = identity): DataFrame = {
    val hits = retriever.search(spark, queries, topK)
    val withText = reranker(
      hits.join(docs.select(col("doc_id"), col("text")), "doc_id"))
    withText
      .groupBy(col("query_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("rank"), col("text")))),
          s => s.getField("text"))).as("context"))
      .withColumn("cites", TextFunctions.citations(col("context")))
  }

  /** Chunk-level rerank hook for long documents (`BaseRanker.rerank` +
    * max-merge, base.py:277-300): split each hit's text into token windows,
    * score chunks with `chunkScore`, keep the max chunk score per doc, and
    * re-rank per query (score desc, doc_id asc).
    */
  def chunkRerank(chunkTokens: Int, overlap: Int)(
      chunkScore: org.apache.spark.sql.Column => org.apache.spark.sql.Column)(
      hits: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = TextFunctions.chunkDocs(
      hits.select(col("query_id"), col("doc_id"), col("text")),
      "doc_id", "text", chunkTokens, overlap)
    val merged = chunks
      .withColumn("chunk_score", chunkScore(col("chunk_text")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("chunk_score")).as("score"), first(col("text")).as("text"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    merged.withColumn("rank", row_number().over(w))
  }
}
