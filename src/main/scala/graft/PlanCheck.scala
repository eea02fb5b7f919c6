package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints formatted physical plans for the hot paths so plan hygiene
  * (pushdown, pruning, broadcast, codegen spans) can be inspected.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    // 1. packed postings scan with term pushdown
    val idxDir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, 2000, 8).toDF(), idxDir, shardBits = 8, groups = 2)
    println("=== packed postings scan, term IN filter ===")
    index.PackedIndex.loadPostings(spark, idxDir)
      .filter(col("term").isin("the", "w5", "w100"))
      .explain("formatted")

    println("=== batched BM25 DataFrame path ===")
    val tok = DocsCorpus.tokenized(spark, dir)
    val post = index.InvertedIndex.postings(tok)
    val dls = index.InvertedIndex.docLens(tok)
    val st = index.InvertedIndex.corpusStats(dls).first()
    val idf = index.InvertedIndex.idfTable(index.InvertedIndex.docFreq(post), st.getLong(0))
    query.Bm25Query.scoreBatch(post, idf, dls, st.getDouble(1),
      query.Bm25Query.queryTerms(DocsCorpus.fixedQueryBatch(spark)))
      .explain("formatted")

    println("=== parquet scan with filter+projection pushdown ===")
    DocsCorpus.documents(spark, dir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), length(col("text")).as("len"))
      .explain("formatted")

    println("=== ann brute force (broadcast expected) ===")
    val emb = DocsCorpus.table(spark, dir, "embeddings")
    ann.Ann.bruteForceTopK(
      emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.select(col("vec_id"), col("embedding").as("vec")), 10)
      .explain("formatted")
    spark.stop()
  }
}
