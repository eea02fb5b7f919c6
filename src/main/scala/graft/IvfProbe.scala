package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ann.Ann

/** Prints the IVF (nProbe, recall, scanned_fraction) operating-point table
  * on a testdata sf dir for a grid of Lloyd iteration counts — the evidence
  * behind the q_ann_ivf_topk nProbe choice and the DedupAnnSpec recall gate.
  * Usage: runMain graft.IvfProbe [sfDir] [nCells]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nCells = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = DocsCorpus.table(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Ann.bruteForceTopK(queries, corpus, 10)
    for (iters <- Seq(0, 2, 4, 8)) {
      val cents = Ann.lloyd(corpus, Ann.seedCentroids(corpus, nCells), iters)
      val withCell = Ann.assignCells(corpus, cents)
      println(s"--- lloyd iters=$iters nCells=$nCells ---")
      Ann.ivfSweep(queries, withCell, cents, exact, 10,
        Seq(1, 2, 3, 4, 6, 8, 12, 16)).collect().foreach { r =>
        println(f"nProbe=${r.getInt(0)}%2d recall=${r.getDouble(1)}%.3f scanned=${r.getDouble(2)}%.3f")
      }
    }
    spark.stop()
  }
}
