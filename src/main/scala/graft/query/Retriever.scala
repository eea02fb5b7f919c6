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
