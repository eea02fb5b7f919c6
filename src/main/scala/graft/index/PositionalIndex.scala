package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{LocalMetaIO, MetaIO, ParquetDirIO, TableIO}

/** Persisted positional posting row: all positional blocks of one term
  * within one doc-shard (see [[Codec.PosBlock]]).
  */
final case class PackedPosBlock(
    base: Long, maxDoc: Long, count: Int,
    docs: Array[Byte], cnts: Array[Byte], poss: Array[Byte]) {
  def toCodec: Codec.PosBlock =
    Codec.PosBlock(base, maxDoc, count, docs, cnts, poss)
}

final case class PosPostings(shard: Int, term: String, nPostings: Long,
                             blocks: Array[PackedPosBlock])

/** Optional POSITIONAL arm of the packed index: per-posting term-occurrence
  * offsets, stored as a parallel `positions/` table under the index dir and
  * sharded identically to the scoring postings (shard = doc_id >>
  * shardBits from stats.json), so every term of a doc lands in the same
  * shard and phrase verification is shard-local — no per-doc shuffle, the
  * same co-location argument as the WAND kernel.
  *
  * This removes phrase search's dependence on retaining the tokenized
  * corpus next to the index ([[graft.query.Phrase.topK]] re-reads candidate
  * token arrays; [[graft.query.Phrase.topKPositional]] works from the index
  * alone). No reference analogue — the reference has no phrase operator —
  * engine-surface extension per SURVEY §2.10.
  *
  * Build contract: call after (or any time later than) the scoring build
  * with the SAME tokenized frame; the table is rewritten wholesale. The
  * scoring index remains the source of truth for corpus stats and
  * commit/append lineage — an appended index needs `build` re-run to keep
  * the positional arm complete ([[graft.query.Phrase.topKPositional]]
  * cross-checks each queried term's positional posting count against the
  * scoring df table, so a stale arm fails loudly instead of silently
  * missing phrase hits).
  */
object PositionalIndex {

  /** (doc_id, term, positions) with NO shuffle: a doc's term-occurrence
    * offsets are a pure function of its own token array (the positional
    * sibling of [[PackedIndex.postingsWithDl]]).
    */
  def positionsPerDoc(tokenized: DataFrame): Dataset[(Long, String, Array[Long])] = {
    val spark = tokenized.sparkSession
    import spark.implicits._
    tokenized.select(col("doc_id"), col("terms"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, terms) =>
        val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()
        var i = 0
        terms.foreach { t =>
          val buf = m.computeIfAbsent(t,
            _ => scala.collection.mutable.ArrayBuffer.empty[Long])
          buf += i.toLong
          i += 1
        }
        val out = new Array[(Long, String, Array[Long])](m.size)
        var j = 0
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          out(j) = (id, e.getKey, e.getValue.toArray) // appended in order -> sorted
          j += 1
        }
        out
      }
  }

  /** Build (or rebuild) the positional arm under `dir/positions` from the
    * index's corpus. Same pack-shuffle shape as the scoring build: one
    * (shard, term) repartition with x4 over-decomposition, streamed runs.
    */
  def build(tokenized: DataFrame, dir: String,
            io: TableIO = ParquetDirIO,
            meta: MetaIO = LocalMetaIO): Unit = {
    val spark = tokenized.sparkSession
    import spark.implicits._
    val stats = PackedIndex.readStats(dir, meta)
    val parts = math.max(spark.sparkContext.defaultParallelism * 4, 16)
    val blockSize = stats.blockSize
    val withShard = positionsPerDoc(tokenized)
      .toDF("doc_id", "term", "positions")
      .withColumn("shard", shiftright(col("doc_id"), stats.shardBits).cast("int"))
      .repartition(parts, col("shard"))
      .sortWithinPartitions(col("shard"), col("term"), col("doc_id"))
      .select(col("shard"), col("term"), col("doc_id"), col("positions"))
      .as[(Int, String, Long, Array[Long])]
    val packed = withShard.mapPartitions { it =>
      new Iterator[PosPostings] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): PosPostings = {
          val (shard, term, _, _) = buf.head
          val docs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val poss = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
          while (buf.hasNext && buf.head._1 == shard && buf.head._2 == term) {
            val (_, _, d, p) = buf.next()
            docs += d; poss += p
          }
          val blocks = Codec.packPositions(docs.toArray, poss.toArray, blockSize)
            .map(b => PackedPosBlock(b.baseDocId, b.maxDocId, b.count,
              b.docs, b.cnts, b.poss)).toArray
          PosPostings(shard, term, docs.length.toLong, blocks)
        }
      }
    }
    io.write(packed.toDF(), s"$dir/positions")
  }

  /** Read the positional arm; fails loudly when absent. */
  def load(spark: SparkSession, dir: String,
           io: TableIO = ParquetDirIO,
           meta: MetaIO = LocalMetaIO): Dataset[PosPostings] = {
    import spark.implicits._
    require(io.committed(s"$dir/positions"),
      s"PositionalIndex.load: no committed positional arm at $dir/positions " +
        "— run PositionalIndex.build over the index corpus first")
    io.read(spark, s"$dir/positions")
      .selectExpr("shard", "term", "nPostings", "blocks")
      .as[PosPostings]
  }
}
