package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{LocalMetaIO, MetaIO, ParquetDirIO, TableIO}

/** PERSISTED IVF index — the dense sibling of the packed BM25 index:
  * build/train once, serve many query batches from storage (reference
  * analogue: faiss write_index/read_index + incremental `add`,
  * `/root/reference/src/retrievals/models/retrieval_auto.py:89,294-303`).
  *
  * Layout under `dir/`:
  *   cells/ (+ cells-aN/)   (parquet) (vec_id, vec, cell_id) — one segment
  *                          per build/append commit; rows are CLUSTERED by
  *                          cell_id via a sorted repartition, so parquet
  *                          row-group stats prune non-probed cells and a
  *                          query batch reads ~nProbe/nCells of the data
  *                          (cell_id stays a DATA column — a dir per cell
  *                          would mean driver-serial commits and a
  *                          scheduler task per dir, the same reasoning as
  *                          the postings shard column)
  *   cells.list             segment list sidecar (MetaIO-atomic flip, the
  *                          PositionalIndex pattern: a crashed append
  *                          leaves an invisible orphan dir)
  *   centroids.tsv          trained centroids (small: nCells x dim)
  *   ivf.json               stats: nCells, dim, nVecs
  *
  * Append contract: new vectors are assigned against the FROZEN trained
  * centroids (exactly faiss `index.add` after `train` — recall for new
  * data tracks how well the training sample covered it; retrain = rebuild).
  * Served results are bit-identical to the in-memory [[Ann.ivfTopK]] over
  * the same vectors and centroids (IvfIndexSpec pins it), so the
  * q_ann_ivf_sweep quality/cost table applies to the persisted form
  * unchanged.
  */
object IvfIndex {

  /** Train (seed + Lloyd) and persist. `corpus` is (vec_id, vec). */
  def build(corpus: DataFrame, dir: String, nCells: Int, iters: Int,
            io: TableIO = ParquetDirIO,
            meta: MetaIO = LocalMetaIO): Unit = {
    val c = corpus.select(col("vec_id").cast("long"),
      col("vec").cast("array<double>").as("vec"))
    val centroids = Ann.lloyd(c, Ann.seedCentroids(c, nCells), iters)
    val cents = centroids
      .select(col("cell_id").cast("long"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, s"IvfIndex.build: no centroids at $dir")
    meta.mkdirs(dir)
    val assigned = Ann.assignCells(c, centsDf(corpus.sparkSession, cents))
    writeSegment(assigned, s"$dir/cells", io)
    val nVecs = io.read(corpus.sparkSession, s"$dir/cells").count()
    meta.writeAtomic(s"$dir/centroids.tsv", cents.map { case (id, v) =>
      s"$id\t${v.mkString(",")}"
    }.mkString("\n"))
    meta.writeAtomic(s"$dir/ivf.json",
      s"""{"nCells":${cents.length},"dim":${cents.head._2.length},"nVecs":$nVecs}""")
    meta.writeAtomic(s"$dir/cells.list", "cells")
  }

  /** Add vectors against the frozen centroids: a fresh segment dir, then
    * the segment list flips atomically (crash leaves an invisible orphan a
    * retry overwrites). Stats update after the data commit.
    */
  def append(newVecs: DataFrame, dir: String,
             io: TableIO = ParquetDirIO,
             meta: MetaIO = LocalMetaIO): Unit = {
    val spark = newVecs.sparkSession
    val segs = segmentList(dir, meta)
    require(io.committed(s"$dir/${segs.head}"),
      s"IvfIndex.append: no committed index at $dir — run build first")
    val cents = loadCentroids(dir, meta)
    val c = newVecs.select(col("vec_id").cast("long"),
      col("vec").cast("array<double>").as("vec"))
    val next = s"cells-a${segs.length}"
    writeSegment(Ann.assignCells(c, centsDf(spark, cents)), s"$dir/$next", io)
    val nNew = io.read(spark, s"$dir/$next").count()
    val stats = readStats(dir, meta)
    meta.writeAtomic(s"$dir/cells.list", (segs :+ next).mkString("\n"))
    meta.writeAtomic(s"$dir/ivf.json",
      s"""{"nCells":${stats("nCells")},"dim":${stats("dim")},"nVecs":${stats("nVecs") + nNew}}""")
  }

  /** Top-k cosine over the persisted index: probe selection runs
    * driver-side against the loaded centroids (tiny), then ONE scan of the
    * committed cell segments with `cell_id IN (probed)` pushed into the
    * parquet scan — row-group stats prune non-probed cells, so the scan
    * reads ~|probed|/nCells of the index (plan-verified in IvfIndexSpec).
    * Bit-identical to [[Ann.ivfTopK]] on the same vectors/centroids.
    *
    * `allowedIds` (optional) is the ES-filter-context allowlist the BM25
    * paths carry: only listed vec_ids may be scored, applied as a filter
    * on the pruned scan BEFORE ranking (candidates restricted, similarity
    * unchanged). Tombstoned ids ([[delete]]) are always excluded.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int, nProbe: Int,
             allowedIds: Option[Array[Long]] = None,
             io: TableIO = ParquetDirIO,
             meta: MetaIO = LocalMetaIO): DataFrame = {
    val cents = loadCentroids(dir, meta)
    val probes = Ann.probeCells(queries, centsDf(spark, cents), nProbe)
      .localCheckpoint() // pinned: reused for the pushdown filter AND the join
    val probedCells = probes.select(col("cell_id"))
      .distinct().collect().map(_.getLong(0)).sorted
    val tomb = loadTombstones(dir, meta)
    var cells = loadCells(spark, dir, io, meta)
      .filter(col("cell_id").isin(probedCells: _*))
    allowedIds.foreach { ids =>
      cells = cells.filter(col("vec_id").isin(ids.toSeq: _*))
    }
    if (tomb.nonEmpty)
      cells = cells.filter(!col("vec_id").isin(tomb.toSeq: _*))
    Ann.ivfTopKWithProbes(probes, cells, k)
  }

  /** Visibility-only delete, the dense sibling of PackedIndex.delete:
    * tombstoned vec_ids are excluded from every search without rewriting
    * cell segments or retraining. Atomic merged-set publish; idempotent.
    * Bounded like the BM25 tombstones (the set rides into the scan filter).
    */
  def delete(dir: String, vecIds: Seq[Long],
             maxTombstones: Int = graft.index.PackedIndex.MaxTombstones,
             meta: MetaIO = LocalMetaIO): Unit = {
    val merged = (loadTombstones(dir, meta) ++ vecIds).distinct.sorted
    require(merged.length <= maxTombstones,
      s"IvfIndex.delete: tombstone set would reach ${merged.length} ids " +
        s"(bound $maxTombstones) — rebuild over the filtered corpus for mass deletes")
    meta.writeAtomic(s"$dir/tombstones.txt", merged.mkString("\n"))
  }

  def loadTombstones(dir: String,
                     meta: MetaIO = LocalMetaIO): Array[Long] =
    if (!meta.exists(s"$dir/tombstones.txt")) Array.empty[Long]
    else meta.readString(s"$dir/tombstones.txt").split("\n").iterator
      .map(_.trim).filter(_.nonEmpty).map(_.toLong).toArray

  // ---- internals -------------------------------------------------------

  /** Cluster a segment's rows by cell before writing so parquet row-group
    * min/max on cell_id make the probe-time IN filter prune.
    */
  private def writeSegment(assigned: DataFrame, location: String,
                           io: TableIO): Unit = {
    val spark = assigned.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 4)
    io.write(assigned
      .repartition(parts, col("cell_id"))
      .sortWithinPartitions(col("cell_id"), col("vec_id"))
      .select(col("vec_id"), col("vec"), col("cell_id")), location)
  }

  private def segmentList(dir: String, meta: MetaIO): Seq[String] =
    if (meta.exists(s"$dir/cells.list"))
      meta.readString(s"$dir/cells.list")
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    else Seq("cells")

  /** Union of committed cell segments. */
  def loadCells(spark: SparkSession, dir: String,
                io: TableIO = ParquetDirIO,
                meta: MetaIO = LocalMetaIO): DataFrame = {
    val segs = segmentList(dir, meta)
    segs.foreach { s =>
      require(io.committed(s"$dir/$s"),
        s"IvfIndex.loadCells: segment $s missing/uncommitted at $dir")
    }
    segs.iterator
      .map(s => io.read(spark, s"$dir/$s").selectExpr("vec_id", "vec", "cell_id"))
      .reduce(_ unionByName _)
  }

  def loadCentroids(dir: String,
                    meta: MetaIO = LocalMetaIO): Array[(Long, Array[Double])] =
    meta.readString(s"$dir/centroids.tsv").split("\n").iterator
      .map(_.trim).filter(_.nonEmpty).map { line =>
        val Array(id, vs) = line.split("\t", 2)
        id.toLong -> vs.split(",").map(_.toDouble)
      }.toArray.sortBy(_._1)

  private def centsDf(spark: SparkSession,
                      cents: Array[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("cell_id", "cvec")
  }

  private def readStats(dir: String, meta: MetaIO): Map[String, Long] =
    meta.readString(s"$dir/ivf.json").trim
      .stripPrefix("{").stripSuffix("}").split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
      }.toMap
}
