package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Bm25Params
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persisted packed posting-list row: all blocks of one term within one
  * doc-shard. Doc-partitioned (shard = doc_id >> shardBits) so a WAND task
  * holds EVERY query term's postings for its doc range — the standard
  * web-search sharding; per-shard top-k heaps then merge globally
  * (reference analogue: faiss shard search + ResultHeap merge,
  * `/root/reference/src/retrievals/models/retrieval_auto.py:335-347`).
  */
final case class PackedBlock(
    base: Long, maxDoc: Long, count: Int, maxTfNorm: Double,
    docs: Array[Byte], tfs: Array[Byte], dls: Array[Byte])

final case class PackedPostings(shard: Int, term: String, blocks: Array[PackedBlock])

/** Corpus-level stats persisted with the index (tiny JSON sidecar). */
final case class IndexStats(
    n: Long, avgdl: Double, avgRawIdf: Double,
    k1: Double, b: Double, epsilon: Double,
    shardBits: Int, blockSize: Int) {
  def params: Bm25Params = Bm25Params(k1, b, epsilon)
  /** eps-floored idf for a query term given its global df (0 if absent). */
  def idf(df: Long): Double = {
    val raw = graft.core.Bm25.rawIdf(n, df)
    if (raw < 0) epsilon * avgRawIdf else raw
  }
}

/** Build + store of the packed inverted index.
  *
  * Layout under `dir/`:
  *   postings/grp=G/shard=S/  (parquet) packed rows, doc-partitioned
  *   df/                      (parquet) (term, df) global document frequency
  *   stats.json                          IndexStats
  *   manifest/group-G.json               per-group build checkpoint + metrics
  *
  * Resumability (north rule): the build runs group by group (groups = shard
  * ranges); each group's parquet is fully written BEFORE its manifest file is
  * created, so a crash leaves either a complete group+manifest or a group
  * that will be rebuilt. `build` skips groups whose manifest exists.
  * Manifests double as per-partition lineage + build metrics
  * (docs/postings/terms/bytes/wallMs per group).
  *
  * Skew: shuffle key for the pack stage is (shard, term) — stopword-heavy
  * terms are split across every doc-shard, so no single reducer sees a full
  * global posting list (salted-by-construction); within a shard a hot term
  * is further split into fixed-size blocks (long-posting-list splitting).
  */
object PackedIndex {

  // ---- tokenized -> postings with dl ----------------------------------

  /** (doc_id, term, tf, dl) from (doc_id, terms) without a doc_lens join:
    * dl is projected before the explode so the only wide op is the
    * map-side-combinable (doc_id, term) count.
    */
  def postingsWithDl(tokenized: DataFrame): DataFrame =
    tokenized
      .select(col("doc_id"), size(col("terms")).cast("long").as("dl"),
        explode(col("terms")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  // ---- pack ------------------------------------------------------------

  /** Pack one group's postings into PackedPostings rows. Input must contain
    * (doc_id, term, tf, dl); rows are shuffled to co-locate (shard, term)
    * and sorted so the packer streams consecutive runs.
    */
  /** Per-build counters filled by the pack tasks (terms, postings,
    * compressed bytes) — avoids a second read of the committed output just
    * to produce manifest metrics.
    */
  final class PackCounters(spark: SparkSession) extends Serializable {
    val terms = spark.sparkContext.longAccumulator("packedTerms")
    val postings = spark.sparkContext.longAccumulator("packedPostings")
    val bytes = spark.sparkContext.longAccumulator("packedBytes")
  }

  def packGroup(postingsDl: DataFrame, stats: IndexStats,
                counters: Option[PackCounters] = None): Dataset[PackedPostings] = {
    val spark = postingsDl.sparkSession
    import spark.implicits._
    val p = stats.params
    val avgdl = stats.avgdl
    val blockSize = stats.blockSize
    val withShard = postingsDl
      .withColumn("shard", shiftright(col("doc_id"), stats.shardBits).cast("int"))
      .select(col("shard"), col("term"), col("doc_id"), col("tf"), col("dl"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("term"), col("doc_id"))
      .as[(Int, String, Long, Long, Long)]

    withShard.mapPartitions { it =>
      new Iterator[PackedPostings] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): PackedPostings = {
          val (shard, term, _, _, _) = buf.head
          val docs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val tfs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val dls = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (buf.hasNext && buf.head._1 == shard && buf.head._2 == term) {
            val (_, _, d, tf, dl) = buf.next()
            docs += d; tfs += tf; dls += dl
          }
          val norm = (tf: Long, dl: Long) =>
            tf.toDouble / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))
          val blocks = Codec.pack(docs.toArray, tfs.toArray, dls.toArray, norm, blockSize)
            .map(b => PackedBlock(b.baseDocId, b.maxDocId, b.count, b.maxTfNorm,
              b.docs, b.tfs, b.dls)).toArray
          counters.foreach { c =>
            c.terms.add(1L)
            c.postings.add(docs.length.toLong)
            c.bytes.add(blocks.iterator.map(b =>
              b.docs.length.toLong + b.tfs.length + b.dls.length).sum)
          }
          PackedPostings(shard, term, blocks)
        }
      }
    }
  }

  // ---- full build with checkpoints ------------------------------------

  /** Build the packed index from a (doc_id, terms) frame.
    *
    * @param groups number of sequential commit units (shard ranges); each is
    *               an independent Spark job whose output is checkpointed.
    * @return per-group metrics (including skipped/resumed groups).
    */
  def build(tokenizedIn: DataFrame, dir: String,
            shardBits: Int = 16, groups: Int = 4,
            p: Bm25Params = Bm25Params(),
            blockSize: Int = Codec.DefaultBlockSize): Seq[GroupManifest] = {
    val spark = tokenizedIn.sparkSession
    Files.createDirectories(Paths.get(dir, "manifest"))
    // The tokenized frame feeds stats, df, AND every group job. Upstream it
    // usually contains the extraction kernel — recomputing that per consumer
    // would multiply the most expensive narrow stage. Persist once for the
    // build, spilling to disk if it outgrows memory (the 100TB equivalent is
    // materializing the extract+tokenize stage as its own table/snapshot).
    val tokenized = tokenizedIn.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try buildFrom(tokenized, dir, shardBits, groups, p, blockSize)
    finally tokenized.unpersist()
  }

  private def buildFrom(tokenized: DataFrame, dir: String,
                        shardBits: Int, groups: Int,
                        p: Bm25Params,
                        blockSize: Int): Seq[GroupManifest] = {
    val spark = tokenized.sparkSession

    // The flat postings feed the df table AND every group's pack job;
    // persist once (the 100TB equivalent: a materialized postings stage).
    val postingsDl = postingsWithDl(tokenized).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stage 1: corpus stats + df table (skipped on resume if present)
      val stats: IndexStats =
        if (Files.exists(Paths.get(dir, "stats.json"))) readStats(dir)
        else {
          val row = InvertedIndex.corpusStats(InvertedIndex.docLens(tokenized)).first()
          val n = row.getLong(0)
          val avgdl = row.getDouble(1)
          val dfTable = postingsDl.groupBy(col("term")).agg(count(lit(1)).as("df"))
          dfTable.write.mode(SaveMode.Overwrite).parquet(s"$dir/df")
          val avgRawIdf =
            InvertedIndex.avgRawIdf(spark.read.parquet(s"$dir/df"), n)
          val s = IndexStats(n, avgdl, avgRawIdf, p.k1, p.b, p.epsilon, shardBits, blockSize)
          writeStats(dir, s)
          s
        }

      (0 until groups).map { g =>
        val manifestPath = Paths.get(dir, "manifest", s"group-$g.json")
        if (Files.exists(manifestPath)) readManifest(manifestPath) // resume: skip
        else {
          val t0 = System.nanoTime()
          val counters = new PackCounters(spark)
          val groupPostings = postingsDl.filter(
            shiftright(col("doc_id"), shardBits).cast("int") % groups === g)
          val packed = packGroup(groupPostings, stats, Some(counters))
          packed.write.mode(SaveMode.Overwrite)
            .partitionBy("shard").parquet(s"$dir/postings/grp=$g")
          val man = GroupManifest(g, counters.terms.value, counters.postings.value,
            counters.bytes.value, (System.nanoTime() - t0) / 1e6)
          writeManifest(manifestPath, man) // committed LAST -> crash-safe
          man
        }
      }
    } finally postingsDl.unpersist()
  }

  def loadPostings(spark: SparkSession, dir: String): Dataset[PackedPostings] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/postings")
      .select("shard", "term", "blocks").as[PackedPostings]
  }

  def loadDf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/df")

  // ---- tiny JSON sidecars ---------------------------------------------

  final case class GroupManifest(group: Int, terms: Long, postings: Long,
                                 bytes: Long, wallMs: Double)

  def writeStats(dir: String, s: IndexStats): Unit =
    atomicWrite(Paths.get(dir, "stats.json"),
      s"""{"n":${s.n},"avgdl":${s.avgdl},"avgRawIdf":${s.avgRawIdf},"k1":${s.k1},"b":${s.b},"epsilon":${s.epsilon},"shardBits":${s.shardBits},"blockSize":${s.blockSize}}""")

  def readStats(dir: String): IndexStats = {
    val m = readJsonFlat(Files.readString(Paths.get(dir, "stats.json")))
    IndexStats(m("n").toLong, m("avgdl").toDouble, m("avgRawIdf").toDouble,
      m("k1").toDouble, m("b").toDouble, m("epsilon").toDouble,
      m("shardBits").toDouble.toInt, m("blockSize").toDouble.toInt)
  }

  private def writeManifest(path: java.nio.file.Path, m: GroupManifest): Unit =
    atomicWrite(path,
      s"""{"group":${m.group},"terms":${m.terms},"postings":${m.postings},"bytes":${m.bytes},"wallMs":${m.wallMs}}""")

  private def readManifest(path: java.nio.file.Path): GroupManifest = {
    val m = readJsonFlat(Files.readString(path))
    GroupManifest(m("group").toDouble.toInt, m("terms").toLong,
      m("postings").toLong, m("bytes").toLong, m("wallMs").toDouble)
  }

  /** Parse a flat one-level JSON object of numbers (no strings/nesting). */
  private def readJsonFlat(s: String): Map[String, String] =
    s.trim.stripPrefix("{").stripSuffix("}").split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim
    }.toMap

  private def atomicWrite(path: java.nio.file.Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
