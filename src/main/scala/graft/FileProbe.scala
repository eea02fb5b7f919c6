package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.{DocGen, FileParser}

/** Throughput probe for the multi-format extraction arms: stage a corpus
  * of real document binaries (one format per run arm) as a parquet of
  * (doc_id, path, payload), then measure FileParser extraction docs/s and
  * payload MB/s at a given core count. The extraction plan is a single
  * narrow map over the scan — no shuffle, no collect — so measured
  * throughput scales with cores/executors by construction; run at two
  * core counts for the scaling-efficiency evidence.
  *
  * Usage: runMain graft.FileProbe [nDocs] [cores] [formats-csv] [stageDir]
  */
object FileProbe {

  private val Words = Vector("data", "spark", "index", "query", "scan",
    "table", "merge", "batch", "shard", "score", "tokens", "pages", "filter",
    "join", "window", "stream", "vector", "corpus", "rank", "hash")

  /** Deterministic ~1.5 KB document text for an id (xorshift). */
  private def docText(id: Long): String = {
    var x = id * 0x9E3779B97F4A7C15L + 1
    def next(): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      ((x >>> 33) % Words.length).toInt
    }
    val sb = new java.lang.StringBuilder(1600)
    var i = 0
    val n = 180 + (id % 60).toInt
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Words(next()))
      i += 1
    }
    sb.toString
  }

  private def payload(fmt: String, id: Long): Array[Byte] = {
    val text = docText(id)
    val paras = text.split(" (?=s)").toSeq // pseudo-paragraph split
    fmt match {
      case "docx" => DocGen.docx(paras)
      case "pptx" => DocGen.pptx(paras.grouped(3).toSeq)
      case "pdf"  => DocGen.pdf(paras.grouped(4).toSeq)
      case "epub" => DocGen.epub(paras)
      case "html" =>
        s"<html><body>${paras.map(p => s"<p>${DocGen.xmlEscape(p)}</p>").mkString}</body></html>"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(s"format? $other")
    }
  }

  def stage(spark: SparkSession, fmt: String, nDocs: Long, dir: String): String = {
    import spark.implicits._
    val out = s"$dir/$fmt-$nDocs"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$out/_SUCCESS")))
      return out
    spark.range(nDocs)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .map { id => (id, s"doc_$id.$fmt", payload(fmt, id)) }
      .toDF("doc_id", "path", "payload")
      .write.mode("overwrite").parquet(out)
    out
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val cores = args.lift(1).getOrElse("32")
    val formats = args.lift(2).getOrElse("docx,pdf,pptx,epub,html").split(",").toSeq
    val stageDir = args.lift(3).getOrElse("/dev/shm/graft-tmp/fileprobe")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .appName("graft-file-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    formats.foreach { fmt =>
      val t0 = System.nanoTime()
      val path = stage(spark, fmt, nDocs, stageDir)
      val stagedSec = (System.nanoTime() - t0) / 1e9
      val df = spark.read.parquet(path)
      val bytes = df.agg(sum(length(col("payload")))).first().getLong(0)

      def run(): (Long, Long) = {
        val ex = FileParser.extractDf(df, "path", "payload")
        val r = ex.agg(
          sum(length(col("text"))).as("chars"),
          sum(when(col("text_err").isNotNull, 1L).otherwise(0L)).as("errs"))
          .first()
        (r.getLong(0), r.getLong(1))
      }
      run() // warm
      val reps = 3
      var best = Double.MaxValue
      var lastChars = 0L
      var errs = 0L
      for (_ <- 1 to reps) {
        val t1 = System.nanoTime()
        val (c, e) = run()
        val sec = (System.nanoTime() - t1) / 1e9
        if (sec < best) best = sec
        lastChars = c; errs = e
      }
      println(f"[fileprobe] fmt=$fmt cores=$cores docs=$nDocs " +
        f"staged=$stagedSec%.1fs payloadMB=${bytes / 1e6}%.1f " +
        f"best=$best%.2fs docs_per_sec=${nDocs / best}%.0f " +
        f"mb_per_sec=${bytes / 1e6 / best}%.1f chars=$lastChars errs=$errs")
      require(errs == 0L, s"extraction errors in probe: $errs")
    }
    spark.stop()
  }
}
