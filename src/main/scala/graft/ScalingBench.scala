package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Two-parallelism scaling evidence for the north rule: the same build +
  * query job at N and 4N cores (local[8] vs local[32] — the sandbox
  * stand-in for N vs 4N executors), reporting both throughputs and the
  * scaling efficiency into BENCH/BASELINE.md.
  *
  * The input is IDENTICAL at both levels: the pages corpus is materialized
  * to parquet once, and both sessions read the same files with the same
  * splits. Sessions run sequentially in one JVM (stop() then rebuild).
  */
object ScalingBench {

  final case class Run(cores: Int, buildSec: Double, buildDocsPerSec: Double,
                       querySec: Double, qps: Double)

  def runAt(cores: Int, pagesPath: String, nPages: Long, nQueries: Int): Run = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dir = Files.createTempDirectory(s"graft-scale-$cores").toString
      val pages = spark.read.parquet(pagesPath)
      val t0 = System.nanoTime()
      corpus.PagesPipeline.buildIndex(pages, dir, shardBits = 12, groups = 2)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val queries = Bench.queryBatch(nQueries)
      query.Wand.search(spark, dir, queries, k = 10).count() // warm-up
      val t1 = System.nanoTime()
      query.Wand.search(spark, dir, queries, k = 10).count()
      val querySec = (System.nanoTime() - t1) / 1e9
      Run(cores, buildSec, nPages / buildSec, querySec, nQueries / querySec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAGES", "100000").toLong
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES", "400").toInt
    val lowCores = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val highCores = lowCores * 4

    // materialize identical input once
    val pagesPath = Files.createTempDirectory("graft-scale-pages").toString + "/pages"
    locally {
      val s = SparkSession.builder().master(s"local[$highCores]")
        .config("spark.sql.shuffle.partitions", highCores)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      corpus.PagesGen.pages(s, nPages, partitions = 64).toDF()
        .write.mode("overwrite").parquet(pagesPath)
      s.stop()
    }

    val low = runAt(lowCores, pagesPath, nPages, nQueries)
    val high = runAt(highCores, pagesPath, nPages, nQueries)
    val buildEff = high.buildDocsPerSec / (4.0 * low.buildDocsPerSec)
    val queryEff = high.qps / (4.0 * low.qps)

    val md =
      s"""# BENCH — measured numbers (this round)
         |
         |Corpus: ${nPages} synthesized Common-Crawl-style pages (PagesGen seed=42,
         |~1-3 KB html each), identical parquet input for both runs.
         |Job: full north-rule pipeline — extract (byte-identical kernel) ->
         |tokenize -> dense docIds -> packed postings (delta+varint blocks,
         |block-max metadata, 2 checkpointed groups, doc-sharded 2^12) ->
         |block-max WAND top-10 for ${nQueries} mixed hot/rare queries.
         |
         || cores | build sec | build docs/sec | query sec | query q/s |
         ||---|---|---|---|---|
         || ${low.cores} (N) | ${f"${low.buildSec}%.1f"} | ${f"${low.buildDocsPerSec}%.0f"} | ${f"${low.querySec}%.1f"} | ${f"${low.qps}%.1f"} |
         || ${high.cores} (4N) | ${f"${high.buildSec}%.1f"} | ${f"${high.buildDocsPerSec}%.0f"} | ${f"${high.querySec}%.1f"} | ${f"${high.qps}%.1f"} |
         |
         |**Build-throughput scaling efficiency (N -> 4N): ${f"$buildEff%.3f"}**
         |(north-rule criterion: >= 0.8). Query-batch efficiency: ${f"$queryEff%.3f"}.
         |
         |Method note: local[${low.cores}] vs local[${high.cores}] on one JVM is the
         |sandbox stand-in for N vs 4N executors (same input files, same splits,
         |sequential sessions). Throughput = rows / wall seconds of the full
         |checkpointed build including parquet writes and manifest commits.
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
    println(s"""{"build_eff":${f"$buildEff%.3f"},"query_eff":${f"$queryEff%.3f"}}""")
  }
}
