package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling: build once, run the WAND query batch repeatedly. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = args.headOption.map(_.toLong).getOrElse(50000L)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val t0 = System.nanoTime()
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, nPages, cpus.toInt * 2).toDF(), dir,
      shardBits = 12, groups = 2)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val rnd = new scala.util.Random(7)
    val stop = Array("the", "of", "and", "to", "in", "is")
    val queries = (0 until nQueries).map { qi =>
      val terms = (0 until 2 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextDouble() < 0.3) stop(rnd.nextInt(stop.length))
        else s"w${rnd.nextInt(5000)}"
      }
      qi.toLong -> terms.mkString(" ")
    }
    for (r <- 1 to 4) {
      val t = System.nanoTime()
      val n = query.Wand.search(spark, dir, queries, 10).count()
      println(f"run $r: ${(System.nanoTime() - t) / 1e9}%.2f s, $n hits, ${nQueries / ((System.nanoTime() - t) / 1e9)}%.1f q/s")
    }
    spark.stop()
  }
}
