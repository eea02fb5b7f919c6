package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates Spark local-mode scaling: pure-compute stage, no persist/IO. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // pure codegen compute
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      spark.range(0, 2000000000L, 1, 256)
        .select(bit_xor(xxhash64(col("id")))).collect()
      println(f"[cpu] codegen pass $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JVM-kernel compute (typed map, like our extract/pack kernels)
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      spark.range(0, 2000000L, 1, 256).as[Long].map { i =>
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < 2000) { h ^= i + j; h *= 0x100000001b3L; j += 1 }
        h
      }.reduce(_ ^ _)
      println(f"[cpu] kernel pass $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // string/alloc heavy (like extraction)
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      spark.range(0, 400000L, 1, 256).as[Long].map { i =>
        val sb = new StringBuilder
        var j = 0
        while (j < 300) { sb.append("word").append((i + j) % 997).append(' '); j += 1 }
        graft.tokenize.PyTokenize.split(sb.toString).length.toLong
      }.reduce(_ + _)
      println(f"[cpu] alloc pass $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
