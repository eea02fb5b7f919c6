package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Ad-hoc profiling: build once, run the WAND query batch repeatedly,
  * dumping per-stage task counts + times.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = args.headOption.map(_.toLong).getOrElse(100000L)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(400)
    val shardBits = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var logStages = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (logStages) {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"wall=${dur.getOrElse(-1L)}ms name=${si.name.take(60)}")
        }
    })
    val dir = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val t0 = System.nanoTime()
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, nPages, 256).toDF(), dir,
      shardBits = shardBits, groups = 2)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val queries = Bench.queryBatch(nQueries)
    for (r <- 1 to 3) {
      if (r == 3) logStages = true
      val t = System.nanoTime()
      val n = query.Wand.search(spark, dir, queries, 10).count()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"run $r: $sec%.2f s, $n hits, ${nQueries / sec}%.1f q/s")
    }
    spark.stop()
  }
}
