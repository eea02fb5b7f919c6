package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** A/B the extract stage at a core count: with and without persist. */
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val path = args.lift(1).getOrElse("/tmp/scalepages400")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = spark.read.parquet(path)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[xp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 2)
      time(s"extract count (no persist) $r") {
        corpus.PagesPipeline.extracted(pages).count()
      }
    for (r <- 1 to 2) {
      val e = corpus.PagesPipeline.extracted(pages).persist(StorageLevel.MEMORY_AND_DISK)
      time(s"extract persist $r") { e.count() }
      time(s"re-read cached $r") { e.count() }
      e.unpersist(true)
    }
    spark.stop()
  }
}
