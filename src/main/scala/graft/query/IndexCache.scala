package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.io.{LocalMetaIO, MetaIO, ParquetDirIO, TableIO}
import graft.index.PackedIndex

/** Session-scoped (driver-side) cache of an index's query-time term->df
  * map, keyed by the stats.json version token.
  *
  * Why: every [[Wand.prepare]] batch otherwise runs one pushdown-filtered
  * Spark scan of the df table — correct, but a fixed per-batch floor
  * (~0.1-0.3 s of job scheduling) that dominates high-QPS serving of small
  * batches. For vocabularies up to [[MaxCachedTerms]] the whole map is
  * collected ONCE per index version and term lookups become driver-local;
  * larger vocabularies fall back to the per-batch scan (recorded so the
  * size check itself isn't repeated per batch).
  *
  * Invalidation: append/compact write a fresh df dir and atomically flip
  * stats.json's dfDir pointer, so the stats.json version token
  * ([[MetaIO.version]]) changes exactly when the df content may have.
  * Tombstones are deliberately NOT cached here — delete() touches only
  * tombstones.txt, which this cache never serves.
  */
object IndexCache {

  /** ~40 bytes/entry -> <=40 MB of driver heap at the cap. Web-scale
    * vocabularies (larger) use the per-batch pushdown scan path.
    */
  val MaxCachedTerms: Long = 1000000L

  // dir -> (stats.json version, Some(term->df) | None=vocabulary too large).
  // Keyed by dir alone: the io/meta arguments only matter on the loading
  // call — mixing different TableIO implementations for one dir string is
  // not a supported pattern (the dir names one physical index).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[Map[String, Long]])]()

  // observability for tests/benchmarks
  private val loadCounter = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def loads: Long = loadCounter.get()
  private[graft] def invalidateAll(): Unit = cache.clear()

  /** The full term->df map for the index, or None when the vocabulary
    * exceeds [[MaxCachedTerms]]. Thread-safe; at most one load per (dir,
    * version).
    */
  def dfMap(spark: SparkSession, dir: String,
            io: TableIO = ParquetDirIO,
            meta: MetaIO = LocalMetaIO): Option[Map[String, Long]] = {
    val ver = meta.version(s"$dir/stats.json")
    val hit = cache.get(dir)
    if (hit != null && hit._1 == ver) hit._2
    else {
      val loaded = load(spark, dir, io, meta)
      cache.put(dir, (ver, loaded))
      loaded
    }
  }

  private def load(spark: SparkSession, dir: String, io: TableIO,
                   meta: MetaIO): Option[Map[String, Long]] = {
    loadCounter.incrementAndGet()
    // ONE job: collect up to the cap + 1 rows — an over-cap vocabulary is
    // detected from the overflow row without a separate count() pass
    val rows = PackedIndex.loadDf(spark, dir, io, meta)
      .select(col("term"), col("df"))
      .limit(MaxCachedTerms.toInt + 1).collect()
    if (rows.length > MaxCachedTerms) None
    else Some(rows.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}
