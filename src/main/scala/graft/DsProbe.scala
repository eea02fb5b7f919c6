package graft

import org.apache.spark.sql.SparkSession

/** Isolated re-measurement of the Dataset-batch serving path
  * (`wand_query_ds_10k` in the round bench): in the full Bench run that
  * line shares a JVM with five heavier queries, so a shared-host/GC tail
  * can masquerade as a path regression. This probe runs ONLY: build the
  * standard 100k-page index, then N repetitions of the 10k-query
  * Wand.searchDs batch, CPU-sentinel-bracketed, one line per rep.
  *
  * Usage: runMain graft.DsProbe [nPages] [nQueries] [reps]
  */
object DsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = args.headOption.map(_.toLong).getOrElse(100000L)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(10000)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calib0 = Bench.calibMops()
    val dir = java.nio.file.Files.createTempDirectory("graft-dsprobe").toString
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, nPages, cpus.toInt * 2).toDF(), dir,
      shardBits = 12, groups = 2)
    import spark.implicits._
    val batch = Bench.queryBatch(nQueries).toDF("query_id", "text")
    for (r <- 1 to reps) {
      val t = System.nanoTime()
      val n = query.Wand.searchDs(spark, dir, batch, k = 10, chunkSize = 2500).count()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"""{"probe":"ds_10k","rep":$r,"sec":$sec%.2f,"qps":${nQueries / sec}%.0f,"hits":$n}""")
    }
    val calib1 = Bench.calibMops()
    println(s"""{"probe":"ds_10k_meta","n_pages":$nPages,"n_queries":$nQueries,"cpu_calib_start_mops":${f"$calib0%.0f"},"cpu_calib_end_mops":${f"$calib1%.0f"}}""")
    spark.stop()
  }
}
