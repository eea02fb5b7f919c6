package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the index build at a given core count. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val nPages = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-bprobe").toString
    time("gen+write pages") {
      corpus.PagesGen.pages(spark, nPages, 256).toDF()
        .write.mode("overwrite").parquet(s"$tmp/pages")
    }
    val pages = spark.read.parquet(s"$tmp/pages")
    val ex = time("extract persist") {
      val e = corpus.PagesPipeline.extracted(pages)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val docs = time("docIds") { val d = index.DocIds.assignDense(ex); d.count(); d }
    val tok = time("tokenize persist") {
      val t = corpus.PagesPipeline.tokenized(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val post = time("postingsDl persist") {
      val p = index.PackedIndex.postingsWithDl(tok)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val stats = time("corpus stats") {
      val row = index.InvertedIndex.corpusStats(index.InvertedIndex.docLens(tok)).first()
      index.IndexStats(row.getLong(0), row.getDouble(1), 0.0, 1.2, 0.75, 0.25, 10, 128)
    }
    (0 until 2).foreach { g =>
      time(s"pack group $g") {
        index.PackedIndex.packGroup(
          post.filter(shiftright(col("doc_id"), 10).cast("int") % 2 === g), stats)
          .write.mode("overwrite").partitionBy("shard").parquet(s"$tmp/idx/grp=$g")
      }
    }
    spark.stop()
  }
}
