package graft

import org.apache.spark.sql.SparkSession

/** Throwaway-style micro-probe: times the proximity/NEAR rescan contract
  * queries in isolation (used to validate the position-array let-binding).
  */
object ProxTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q_proximity_topk", "q_near_topk"); r <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"""{"q":"$q","rep":$r,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    spark.stop()
  }
}
