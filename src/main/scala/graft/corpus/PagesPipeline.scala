package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Bm25Params
import graft.extract.HtmlText
import graft.index.{DocIds, InvertedIndex, PackedIndex}

/** The full north-rule pipeline over the pages table:
  * pages -> byte-identical extraction -> dense docIds -> tokenize ->
  * packed postings index (checkpointed groups) -> WAND top-k queries.
  *
  * Plan shape: extraction and tokenization are narrow (single pass over the
  * pages scan, html column pruned away right after the kernel); docId
  * assignment adds no shuffle; the only wide stages are the posting
  * aggregation and the (shard, term) pack shuffle — see PackedIndex.
  */
object PagesPipeline {

  private val extractUdf = udf((html: Array[Byte]) =>
    if (html == null) null else HtmlText.extractBytes(html))

  /** pages -> (url, warc_ts, lang, text): uses the materialized `text` when
    * present, else runs the extraction kernel on `html` (reference: FileParser
    * populates text once; our invariant is byte-identical re-derivation).
    */
  def extracted(pages: DataFrame): DataFrame =
    pages.select(col("url"), col("warc_ts"), col("lang"),
      coalesce(col("text"), extractUdf(col("html"))).as("text"))

  /** extracted + dense doc_id (0..N-1, layout-stable). */
  def docs(pages: DataFrame): DataFrame =
    DocIds.assignDense(extracted(pages))

  /** (doc_id, terms) for the index build. */
  def tokenized(docsDf: DataFrame): DataFrame =
    InvertedIndex.tokenize(docsDf, "doc_id", "text")

  /** End-to-end index build from raw pages; returns per-group manifests.
    * The extraction output is staged to parquet under the index dir (one
    * extraction pass ever — docId counting and the tokenize consumers scan
    * the staged artifact), making the most expensive stage itself a
    * resumable checkpoint.
    */
  def buildIndex(pages: DataFrame, dir: String, shardBits: Int = 0,
                 groups: Int = 4, p: Bm25Params = Bm25Params(),
                 io: graft.io.TableIO = graft.io.ParquetDirIO): Seq[PackedIndex.GroupManifest] = {
    val spark = pages.sparkSession
    val rawPath = java.nio.file.Paths.get(dir, "docs_raw").toString
    // ONE staged artifact: extracted text WITH dense doc_id. Tokenization is
    // re-derived on the fly by each consumer (cheap, narrow), so the build
    // never writes/reads the much larger terms-array form, and the group
    // jobs' doc_id range predicates push straight into this parquet.
    if (!io.committed(rawPath)) io.write(DocIds.assignDense(extracted(pages)), rawPath)
    val raw = io.read(spark, rawPath)
    PackedIndex.build(tokenized(raw), dir, shardBits, groups, p,
      io = io, stageInput = false)
  }

  /** Incremental ingest: extract + append new pages to an existing index
    * (docIds continue above the current corpus; result is bit-identical to
    * a full rebuild over old+new — see PackedIndex.append).
    */
  def appendPages(newPages: DataFrame, dir: String): PackedIndex.GroupManifest = {
    val spark = newPages.sparkSession
    // manifest-derived (NOT stats.json): a retried append after a crash
    // between the stats and manifest commits must offset new docIds by the
    // pre-append corpus size, not the already-bumped stats value
    val existingN = PackedIndex.committedDocs(dir)
    val grp = 1 + new java.io.File(s"$dir/manifest").listFiles()
      .iterator.map(_.getName)
      .collect { case nm if nm.startsWith("group-") && nm.endsWith(".json") =>
        nm.stripPrefix("group-").stripSuffix(".json").toInt
      }.foldLeft(-1)(math.max)
    val io = graft.io.ParquetDirIO
    val rawPath = java.nio.file.Paths.get(dir, s"docs_raw_append_$grp").toString
    if (!io.committed(rawPath)) io.write(extracted(newPages), rawPath)
    val raw = io.read(spark, rawPath)
    val withIds = DocIds.assignDense(raw)
      .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id") + existingN)
    PackedIndex.append(tokenized(withIds), dir)
  }
}
