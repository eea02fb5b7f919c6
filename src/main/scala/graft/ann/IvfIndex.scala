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
  *   cells.list             segment list sidecar — the COMMIT MARKER,
  *                          always written LAST (MetaIO-atomic flip, the
  *                          PositionalIndex pattern: a crash leaves an
  *                          invisible orphan dir a retry overwrites)
  *   centroids.tsv          trained centroids (small: nCells x dim)
  *   ivf.json               stats: nCells, dim, nVecs — nVecs is always
  *                          RECOMPUTED from the committed segments after a
  *                          list flip, never incremented, so a crash
  *                          between the flip and the stats write leaves a
  *                          stale-but-self-healing value (the next
  *                          append/search-stats refresh recomputes it)
  *
  * Append contract: new vectors are assigned against the FROZEN trained
  * centroids (exactly faiss `index.add` after `train` — recall for new
  * data tracks how well the training sample covered it). Retraining is a
  * REBUILD INTO A FRESH DIR + caller-side swap (the compact() pattern):
  * build() refuses a dir with a committed segment list, because
  * overwriting the base segment in place would expose mixed old/new
  * state to concurrent readers with no error.
  *
  * Idempotency: both build and append accept an optional segment NAME.
  * An append whose name is already in the committed list is a no-op —
  * the hook exactly-once ingestion rides (streaming/IvfIngest derives the
  * name from the micro-batch id, so a replayed batch after a crash
  * re-lands on the same segment instead of duplicating vectors).
  *
  * Served results are bit-identical to the in-memory [[Ann.ivfTopK]] over
  * the same vectors and centroids (IvfIndexSpec pins it), so the
  * q_ann_ivf_sweep quality/cost table applies to the persisted form
  * unchanged.
  */
object IvfIndex {

  /** Train (seed + Lloyd) and persist into a FRESH dir (see class doc).
    * `corpus` is (vec_id, vec). Commit order: segment -> centroids ->
    * stats -> cells.list (marker LAST); a crashed build is invisible and
    * a retry overwrites every partial artifact.
    */
  def build(corpus: DataFrame, dir: String, nCells: Int, iters: Int,
            io: TableIO = ParquetDirIO,
            meta: MetaIO = LocalMetaIO,
            segmentName: String = "cells"): Unit = {
    require(!meta.exists(s"$dir/cells.list"),
      s"IvfIndex.build: $dir already holds a committed index — retrain " +
        "rebuilds into a fresh dir and the caller swaps (the compact() pattern)")
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
    writeSegment(assigned, s"$dir/$segmentName", io)
    val nVecs = io.read(corpus.sparkSession, s"$dir/$segmentName").count()
    meta.writeAtomic(s"$dir/centroids.tsv", cents.map { case (id, v) =>
      s"$id\t${v.mkString(",")}"
    }.mkString("\n"))
    meta.writeAtomic(s"$dir/ivf.json",
      s"""{"nCells":${cents.length},"dim":${cents.head._2.length},"nVecs":$nVecs}""")
    meta.writeAtomic(s"$dir/cells.list", segmentName) // commit marker LAST
  }

  /** Add vectors against the frozen centroids: a fresh segment dir, then
    * the segment list flips atomically; stats recompute AFTER the flip
    * (see class doc). A crash leaves an invisible orphan a retry
    * overwrites; an append whose `segmentName` is already committed is a
    * no-op (it still refreshes stats, healing a crashed prior attempt).
    */
  def append(newVecs: DataFrame, dir: String,
             io: TableIO = ParquetDirIO,
             meta: MetaIO = LocalMetaIO,
             segmentName: Option[String] = None): Unit = {
    val spark = newVecs.sparkSession
    val segs = segmentList(dir, meta)
    require(io.committed(s"$dir/${segs.head}"),
      s"IvfIndex.append: no committed index at $dir — run build first")
    val next = segmentName.getOrElse(s"cells-a${segs.length}")
    if (!segs.contains(next)) {
      val cents = loadCentroids(dir, meta)
      val c = newVecs.select(col("vec_id").cast("long"),
        col("vec").cast("array<double>").as("vec"))
      writeSegment(Ann.assignCells(c, centsDf(spark, cents)), s"$dir/$next", io)
      meta.writeAtomic(s"$dir/cells.list", (segs :+ next).mkString("\n"))
    }
    // stats from the COMMITTED data, never incremental — self-healing
    val stats = readStats(dir, meta)
    val nVecs = loadCells(spark, dir, io, meta).count()
    meta.writeAtomic(s"$dir/ivf.json",
      s"""{"nCells":${stats("nCells")},"dim":${stats("dim")},"nVecs":$nVecs}""")
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
    import spark.implicits._
    val cents = loadCentroids(dir, meta)
    val probes = Ann.probeCells(queries, centsDf(spark, cents), nProbe)
      .localCheckpoint() // pinned: reused for the pushdown filter AND the join
    val probedCells = probes.select(col("cell_id"))
      .distinct().collect().map(_.getLong(0)).sorted
    val tomb = loadTombstones(dir, meta)
    // id-set filters: small sets ride the scan as pushdown-friendly IN
    // predicates; large sets switch to broadcast joins (a 100k-element In
    // bloats the plan and evaluates per row-group slower than a hash
    // probe) — one shared threshold with the WAND term filters so the two
    // serving paths can't drift
    val isinMax = graft.query.Wand.IsinThreshold
    var cells = loadCells(spark, dir, io, meta)
    cells =
      if (probedCells.length <= isinMax)
        cells.filter(col("cell_id").isin(probedCells: _*))
      else
        cells.join(broadcast(probedCells.toSeq.toDF("cell_id")),
          Seq("cell_id"), "left_semi")
    allowedIds.foreach { ids =>
      cells =
        if (ids.length <= isinMax) cells.filter(col("vec_id").isin(ids.toSeq: _*))
        else cells.join(broadcast(ids.toSeq.toDF("vec_id")), Seq("vec_id"), "left_semi")
    }
    if (tomb.nonEmpty) {
      cells =
        if (tomb.length <= isinMax) cells.filter(!col("vec_id").isin(tomb.toSeq: _*))
        else cells.join(broadcast(tomb.toSeq.toDF("vec_id")), Seq("vec_id"), "left_anti")
    }
    // serve through the heap kernel, not the join+window plan: at the
    // 2M-vector probe the latter was SLOWER than a full brute-force scan
    // (it materializes scanned x probing-queries rows through a shuffle);
    // the kernel form is result-identical and 3-10x faster
    Ann.ivfTopKKernel(probes, cells, k)
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
