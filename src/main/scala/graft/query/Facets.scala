package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Elasticsearch-style terms aggregation (facets) over a retrieval match
  * set: count matched documents per value of a metadata field and keep the
  * top facet values. The engine-side half of "search + drill-down" — the
  * reference treats queries as given and returns ranked ids only; facets
  * are the aggregation every search UI layers on top.
  *
  * Scale shape: `hits` is typically `Wand.search(..., k = 0)` (the full
  * match set). The distinct + join + count plan is fully declarative —
  * partial aggregation map-side, the doc-metadata join shuffles on doc_id
  * (both sides huge at 100 TB: a plain shuffle join is the right physical
  * strategy, and Catalyst picks it), and only nQueries x nFacetValues rows
  * reach the rank window.
  */
object Facets {

  /** Top-`topN` facet values per query: (query_id, facet, n_docs, rank),
    * ranked by (n_docs desc, facet asc). `hits` needs (query_id, doc_id)
    * (extra columns ignored; duplicate doc rows collapse), `docs` provides
    * (doc_id, `field`). Docs whose field value is null are skipped (ES
    * missing-bucket semantics are an explicit opt-in, not a default).
    */
  def termsFacet(hits: DataFrame, docs: DataFrame, field: String,
                 topN: Int): DataFrame = {
    require(topN > 0, s"Facets.termsFacet: topN must be positive (got $topN)")
    val counts = hits.select(col("query_id"), col("doc_id")).distinct()
      .join(docs.select(col("doc_id"), col(field).as("facet")), "doc_id")
      .filter(col("facet").isNotNull)
      .groupBy(col("query_id"), col("facet"))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").desc, col("facet").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("query_id"), col("facet"), col("n_docs"), col("rank"))
  }
}
