package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling for filtered retrieval at scale: build (or reuse) a
  * packed index over a staged pages corpus, then time the same query batch
  * unfiltered vs ES-filter-context allowlists of decreasing selectivity —
  * evidencing that the WAND allowlist-advance path gets FASTER as the
  * filter gets more selective (it may jump whole block ranges), never
  * slower.
  *
  * Usage: FilterProbe <pagesParquet> <nPages> <nQueries> [indexDir]
  */
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val pagesPath = args(0)
    val nPages = args(1).toLong
    val nQueries = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = args.lift(3).getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft-fprobe").toString
      corpus.PagesPipeline.buildIndex(
        spark.read.parquet(pagesPath), d, shardBits = 12, groups = 2)
      d
    }
    val queries = Bench.queryBatch(nQueries)
    def timed(label: String)(f: => Long): Unit = {
      f // warm-up
      val t0 = System.nanoTime()
      val hits = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","sec":$sec%.2f,"qps":${nQueries / sec}%.1f,"hits":$hits}""")
    }
    timed("unfiltered") {
      query.Wand.search(spark, dir, queries, 10).count()
    }
    for (everyNth <- Seq(10L, 100L, 1000L)) {
      val allowed = (0L until nPages by everyNth).toArray
      timed(s"filtered_1_in_$everyNth") {
        query.Wand.search(spark, dir, queries, 10, Some(allowed)).count()
      }
    }
    spark.stop()
  }
}
