package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-equivalent single-node baseline: the reference's BM25 path
  * scores ALL docs per query in one process
  * (`models/retrieval_auto.py:391-393`, rank_bm25 exhaustive get_scores).
  * This main times our in-JVM exhaustive oracle (same algorithm, same
  * arithmetic — if anything faster than the Python/numpy original) on the
  * same corpus + query batch the engine benches use, giving the
  * "matches-or-beats the reference's single-node throughput" comparison.
  */
object OracleBench {
  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(100000L)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same corpus as the engine benches (build once to stage docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-obench").toString
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, nPages, 64).toDF(), dir,
      shardBits = 12, groups = 2)
    val docs = corpus.PagesPipeline.tokenized(spark.read.parquet(s"$dir/docs_raw"))
      .select(col("doc_id"), col("terms")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray)).sortBy(_._1)
    spark.stop()

    println(s"corpus loaded into single JVM: ${docs.length} docs")
    val oracle = new core.Bm25.Oracle(docs.map(_._2).toIndexedSeq)
    val queries = Bench.queryBatch(nQueries)

    // warm-up then timed: exhaustive top-10 per query, single thread
    queries.take(20).foreach(q => oracle.topK(tokenize.PyTokenize.split(q._2).toSeq, 10))
    val t0 = System.nanoTime()
    var hits = 0L
    queries.foreach { case (_, text) =>
      hits += oracle.topK(tokenize.PyTokenize.split(text).toSeq, 10).length
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"exhaustive single-thread oracle: $nQueries queries in $sec%.2f s = ${nQueries / sec}%.2f q/s ($hits hits)")
  }
}
