package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phrase search WITHOUT a positional index — the candidate-then-verify
  * shape engines use when positions aren't stored (reference analogue:
  * none; the reference has no phrase operator — this extends the engine's
  * fulltext surface): conjunctive candidate generation from the inverted
  * postings (docs containing ALL distinct phrase terms — an aggregation
  * that kills most of the corpus before any text is touched), then exact
  * sliding-window adjacency verification over ONLY the candidates' token
  * arrays (left-semi join; the corpus text is never shuffled).
  *
  * tf = number of sliding phrase matches (overlaps counted); top-k by
  * (phrase_tf desc, doc_id asc) — deterministic, SQL-expressible, so the
  * whole operator carries an exact DuckDB oracle (q_phrase_topk).
  */
object Phrase {

  /** Sliding-window occurrence count of `phrase` in a token-array column
    * (overlapping matches count). Pure declarative Catalyst — the phrase is
    * a literal, so the whole predicate folds into one codegen'd aggregate
    * over a per-row sequence.
    */
  def phraseCount(terms: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phraseCount: empty phrase")
    val L = phrase.length
    when(size(terms) < L, lit(0L)).otherwise(
      aggregate(
        sequence(lit(0), size(terms) - L),
        lit(0L),
        (acc, i) => acc + when(
          phrase.zipWithIndex.map { case (p, j) =>
            get(terms, i + lit(j)) === lit(p)
          }.reduce(_ && _), lit(1L)).otherwise(lit(0L))))
  }

  /** Let-binding for per-term position arrays: each term's sorted position
    * array is computed ONCE per row and handed to `body`. Catalyst has no
    * let — a Column spliced into a higher-order-function lambda is
    * re-evaluated on EVERY lambda invocation, so the window-count folds
    * below would otherwise re-filter the whole token array per anchor
    * position (O(len^2 x terms) per doc, measured as the dominant cost of
    * the proximity/NEAR rescan paths). A transform over a singleton struct
    * array evaluates the captured arrays exactly once.
    */
  private def withPositions(termsCol: Column, terms: Seq[String])(
      body: Seq[Column] => Column): Column = {
    val idx = sequence(lit(1), size(termsCol))
    val arrays = struct(terms.zipWithIndex.map { case (t, i) =>
      filter(idx, j => get(termsCol, j - 1) === lit(t)).as(s"p$i")
    }: _*)
    element_at(transform(array(arrays), s =>
      body(terms.indices.map(i => s.getField(s"p$i")))), 1)
  }

  /** Ordered proximity count: number of (p, q) occurrence pairs with
    * `a` at p, `b` at q, and 0 < q - p <= slop (an ordered within-window
    * co-occurrence count; slop = 1 degenerates to the bigram phrase count).
    * Declarative Catalyst like [[phraseCount]] — SQL-expressible, so the
    * operator carries an exact DuckDB oracle (nested list lambdas).
    */
  def proximityCount(terms: Column, a: String, b: String, slop: Int): Column = {
    require(slop >= 1, "proximityCount: slop must be >= 1")
    when(size(terms) < 1, lit(0L)).otherwise(
      withPositions(terms, Seq(a, b)) { case Seq(posA, posB) =>
        aggregate(posA, lit(0L), (acc, p) =>
          acc + size(filter(posB, q => q > p && q <= p + lit(slop))).cast("long"))
      })
  }

  /** Top-k docs by ordered proximity count (corpus-rescan verify path —
    * the positional-index sibling is [[proximityTopKPositional]]).
    * `postings` is unused (kept for source compatibility): candidates come
    * from an `array_contains` prefilter on the token arrays — the same
    * conjunctive predicate the postings semi-join expressed, evaluated
    * where the data already sits (no postings aggregation, no join, no
    * shuffle; the count kernel is the positional arm's, shared).
    */
  def proximityTopK(tokenized: DataFrame, postings: DataFrame,
                    a: String, b: String, slop: Int, k: Int): DataFrame = {
    require(slop >= 1, "proximityTopK: slop must be >= 1")
    rescanTopK(tokenized, Array(a, b), "prox_tf", k)(proximityKernelCount(slop))
  }

  /** Ordered proximity top-k from the POSITIONAL index arm alone: same
    * shard-local kernel shape as [[topKPositional]], counting for every
    * co-occurring doc the pairs (p in pos(a), q in pos(b)) with
    * 0 < q - p <= slop via two binary searches per leader position.
    * Count-identical to [[proximityTopK]] (PhraseSpec property + shared
    * DuckDB oracle). Honors tombstones; stale arm fails loudly.
    */
  def proximityTopKPositional(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String, a: String, b: String,
                              slop: Int, k: Int,
                              io: graft.io.TableIO = graft.io.ParquetDirIO,
                              meta: graft.io.MetaIO = graft.io.LocalMetaIO): DataFrame = {
    require(slop >= 1, "proximityTopKPositional: slop must be >= 1")
    positionalKernelTopK(spark, indexDir, Seq(a, b), k, "prox_tf", io, meta)(
      proximityKernelCount(slop))
  }

  /** Per-doc ordered-proximity kernel over slot position arrays: count of
    * (a at p, b at q) pairs with 0 < q - p <= slop. Shared by the
    * single-query and batched serving paths.
    */
  private[query] def proximityKernelCount(slop: Int): Array[Array[Long]] => Long = {
    (slotPos: Array[Array[Long]]) =>
      val posA = slotPos(0)
      val posB = slotPos(1)
      var cnt = 0L
      var i = 0
      while (i < posA.length) {
        val p = posA(i)
        // count posB in (p, p + slop]
        val lo = {
          val r = java.util.Arrays.binarySearch(posB, p + 1)
          if (r >= 0) r else -r - 1
        }
        val hi = {
          val r = java.util.Arrays.binarySearch(posB, p + slop + 1)
          if (r >= 0) r else -r - 1
        }
        cnt += hi - lo
        i += 1
      }
      cnt
  }

  /** Unordered multi-term proximity (the standard NEAR/n operator): count
    * of occurrences p of `terms.head` (the anchor term) such that EVERY
    * other term has an occurrence within `slop` tokens of p in EITHER
    * direction (|q - p| <= slop). slop >= 1; terms must be distinct and
    * >= 2 (positions of distinct terms can never coincide, so q != p is
    * automatic). Declarative Catalyst like [[phraseCount]]/[[proximityCount]]
    * — SQL-expressible, so the operator carries an exact DuckDB oracle.
    */
  def nearCount(termsCol: Column, terms: Seq[String], slop: Int): Column = {
    require(slop >= 1, "nearCount: slop must be >= 1")
    require(terms.length >= 2 && terms.distinct == terms,
      "nearCount: need >= 2 distinct terms")
    when(size(termsCol) < 1, lit(0L)).otherwise(
      withPositions(termsCol, terms) { ps =>
        aggregate(ps.head, lit(0L), (acc, p) =>
          acc + when(
            ps.tail.map(pt =>
              exists(pt, q => q >= p - slop && q <= p + slop))
              .reduce(_ && _),
            lit(1L)).otherwise(lit(0L)))
      })
  }

  /** Top-k docs by unordered NEAR count (corpus-rescan verify path — the
    * positional-index sibling is [[nearTopKPositional]]). `postings` is
    * unused (kept for source compatibility) — see [[proximityTopK]].
    */
  def nearTopK(tokenized: DataFrame, postings: DataFrame,
               terms: Seq[String], slop: Int, k: Int): DataFrame = {
    require(slop >= 1, "nearTopK: slop must be >= 1")
    require(terms.length >= 2 && terms.distinct == terms,
      "nearTopK: need >= 2 distinct terms")
    rescanTopK(tokenized, terms.toArray, "near_tf", k)(nearKernelCount(slop))
  }

  /** Unordered NEAR top-k from the POSITIONAL index arm alone: same
    * shard-local kernel shape as [[topKPositional]]; per anchor position,
    * each follower term is probed with two binary searches for an
    * occurrence in [p - slop, p + slop]. Count-identical to [[nearTopK]]
    * (PhraseSpec property + shared DuckDB oracle). Honors tombstones;
    * stale arm fails loudly.
    */
  def nearTopKPositional(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, terms: Seq[String],
                         slop: Int, k: Int,
                         io: graft.io.TableIO = graft.io.ParquetDirIO,
                         meta: graft.io.MetaIO = graft.io.LocalMetaIO): DataFrame = {
    require(slop >= 1, "nearTopKPositional: slop must be >= 1")
    require(terms.length >= 2 && terms.distinct == terms,
      "nearTopKPositional: need >= 2 distinct terms")
    positionalKernelTopK(spark, indexDir, terms, k, "near_tf", io, meta)(
      nearKernelCount(slop))
  }

  /** Per-doc unordered-NEAR kernel over slot position arrays: anchors p of
    * slot 0 where every follower slot has an occurrence in [p-slop, p+slop].
    * Shared by the single-query and batched serving paths.
    */
  private[query] def nearKernelCount(slop: Int): Array[Array[Long]] => Long = {
    (slotPos: Array[Array[Long]]) =>
      val anchors = slotPos(0)
      var cnt = 0L
      var i = 0
      while (i < anchors.length) {
        val p = anchors(i)
        var ok = true
        var j = 1
        while (ok && j < slotPos.length) {
          val arr = slotPos(j)
          // first occurrence >= p - slop; in-window iff it is <= p + slop
          val r = java.util.Arrays.binarySearch(arr, p - slop)
          val lo = if (r >= 0) r else -r - 1
          ok = lo < arr.length && arr(lo) <= p + slop
          j += 1
        }
        if (ok) cnt += 1
        i += 1
      }
      cnt
  }

  /** Docs whose postings contain EVERY distinct phrase term (conjunctive
    * candidate set). The term IN-filter pushes to the postings source; the
    * aggregation emits doc ids only.
    */
  def candidates(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    val distinctTerms = phrase.distinct
    postings.filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === distinctTerms.size)
      .select(col("doc_id"))
  }

  /** Conjunctive candidates straight from a PACKED index dir: the term
    * IN-filter pushes to the postings parquet, block headers prune nothing
    * here (all blocks of a matching term decode), but only the phrase
    * terms' lists are ever read — the production shape for phrase search
    * against the stored index. Honors tombstones.
    */
  def candidatesPacked(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, phrase: Seq[String],
                       io: graft.io.TableIO = graft.io.ParquetDirIO,
                       meta: graft.io.MetaIO = graft.io.LocalMetaIO): DataFrame = {
    import spark.implicits._
    val distinctTerms = phrase.distinct
    val tomb = graft.index.PackedIndex.loadTombstones(indexDir, meta)
    val bcTomb = spark.sparkContext.broadcast(tomb)
    val pairs = graft.index.PackedIndex.loadPostings(spark, indexDir, io, meta)
      .filter(col("term").isin(distinctTerms: _*))
      .flatMap { pp =>
        val t = bcTomb.value
        pp.blocks.iterator.flatMap(_.toCodec.decodeDocIds.iterator)
          .filter(d => java.util.Arrays.binarySearch(t, d) < 0)
          .map(d => (d, pp.term))
      }.toDF("doc_id", "term")
    pairs.groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === distinctTerms.size)
      .select(col("doc_id"))
  }

  /** Top-k docs by sliding phrase count. `tokenized` is (doc_id, terms);
    * `postings` is unused (kept for source compatibility) — see
    * [[proximityTopK]] for the candidate-generation change.
    */
  def topK(tokenized: DataFrame, postings: DataFrame,
           phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "topK: empty phrase")
    rescanTopK(tokenized, phrase.toArray, "phrase_tf", k)(phraseKernelCount)
  }

  /** Shared corpus-rescan top-k: narrow `array_contains` conjunctive
    * prefilter (the same candidate set the old postings semi-join produced,
    * with zero shuffles — guide §2.4 "remove shuffles outright"), then the
    * SAME per-doc position-array kernels the positional index arm runs
    * (count-identical by PhraseSpec/the shared DuckDB oracles; the previous
    * Catalyst higher-order-function folds evaluated interpreted, measured
    * as the dominant cost of these queries). One narrow stage up to the
    * bounded top-k.
    */
  private def rescanTopK(tokenized: DataFrame, slots: Array[String],
                         countCol: String, k: Int)(
      countFn: Array[Array[Long]] => Long): DataFrame = {
    val spark = tokenized.sparkSession
    import spark.implicits._
    val pre = slots.distinct.map(t => array_contains(col("terms"), t))
      .reduce(_ && _)
    val counted = tokenized
      .filter(pre)
      .select(col("doc_id"), col("terms"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.flatMap { case (id, toks) =>
          val cnt = countFn(slotPositionsOf(toks, slots))
          if (cnt > 0) Iterator.single((id, cnt)) else Iterator.empty
        }
      }
      .toDF("doc_id", countCol)
    val bounded = counted
      .orderBy(col(countCol).desc, col("doc_id").asc).limit(k)
    graft.index.InvertedIndex.rankBounded(bounded, col("doc_id"),
      col(countCol).desc, col("doc_id").asc)
  }

  /** 1-based occurrence positions of each slot term in one doc's token
    * sequence, shaped exactly like the positional index's per-slot arrays
    * (repeated slot terms share one array) so the positional kernels apply
    * unchanged. One pass over the tokens.
    */
  private[query] def slotPositionsOf(toks: Seq[String],
                                     slots: Array[String]): Array[Array[Long]] = {
    val distinct = slots.distinct
    val builders = new java.util.HashMap[String, scala.collection.mutable.ArrayBuilder.ofLong]()
    distinct.foreach(t => builders.put(t, new scala.collection.mutable.ArrayBuilder.ofLong))
    var p = 1L
    val it = toks.iterator
    while (it.hasNext) {
      val b = builders.get(it.next())
      if (b != null) b += p
      p += 1
    }
    val byTerm = distinct.map(t => t -> builders.get(t).result()).toMap
    slots.map(byTerm)
  }

  /** Top-k phrase search from the POSITIONAL index arm alone — no corpus
    * rescan (the production shape once [[graft.index.PositionalIndex]] is
    * built): the phrase terms' positional rows are pulled with a pushed-down
    * term filter, co-located per doc-shard (every term of a doc lives in
    * the same shard by construction), and a per-shard kernel intersects the
    * terms' sorted doc lists and counts adjacency runs by binary-searching
    * each follower term's position array. Identical counts to the sliding
    * verify ([[topK]]) — pinned by PhraseSpec property tests and the shared
    * q_phrase DuckDB oracle. Honors tombstones.
    *
    * Scale shape: only the phrase terms' postings move (one shard
    * repartition of those rows), candidates never materialize globally, and
    * per shard the work is |rarest term's postings| binary searches.
    */
  def topKPositional(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String, phrase: Seq[String], k: Int,
                     io: graft.io.TableIO = graft.io.ParquetDirIO,
                     meta: graft.io.MetaIO = graft.io.LocalMetaIO): DataFrame =
    positionalKernelTopK(spark, indexDir, phrase, k, "phrase_tf", io, meta)(
      phraseKernelCount)

  /** Per-doc exact-phrase kernel over slot position arrays: leader position
    * p matches iff slot j holds p + j for every j. Shared by the
    * single-query and batched serving paths.
    */
  private[query] val phraseKernelCount: Array[Array[Long]] => Long = {
    (slotPos: Array[Array[Long]]) =>
      val leader = slotPos(0)
      var cnt = 0L
      var li = 0
      while (li < leader.length) {
        val p = leader(li)
        var ok = true
        var j = 1
        while (ok && j < slotPos.length) {
          if (java.util.Arrays.binarySearch(slotPos(j), p + j) < 0) ok = false
          j += 1
        }
        if (ok) cnt += 1
        li += 1
      }
      cnt
  }

  /** Positional rows for `distinctTerms` behind the staleness gate: a
    * queried term whose positional posting count no longer matches the
    * scoring df table means the arm missed an append — fail loudly. df
    * lookups ride the same version-invalidated cache the WAND serving path
    * uses (no per-query df scan for bounded vocabularies). Returns the
    * term-filtered positional rows plus df per queried term.
    */
  private def loadGated(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, distinctTerms: Seq[String],
                        io: graft.io.TableIO, meta: graft.io.MetaIO):
      (org.apache.spark.sql.Dataset[graft.index.PosPostings], Map[String, Long]) = {
    val dfCounts: Map[String, Long] =
      IndexCache.dfMap(spark, indexDir, io, meta) match {
        case Some(full) =>
          distinctTerms.iterator.flatMap(t => full.get(t).map(t -> _)).toMap
        case None =>
          graft.index.PackedIndex.loadDf(spark, indexDir, io, meta)
            .filter(col("term").isin(distinctTerms: _*))
            .select(col("term"), col("df"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    val posRows = graft.index.PositionalIndex.load(spark, indexDir, io, meta)
      .filter(col("term").isin(distinctTerms: _*))
    val posCounts = posRows.groupBy(col("term"))
      .agg(sum(col("nPostings")).as("np"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    distinctTerms.foreach { t =>
      val want = dfCounts.getOrElse(t, 0L)
      val got = posCounts.getOrElse(t, 0L)
      require(got == want,
        s"positionalKernelTopK: positional arm is stale for term '$t' " +
          s"($got positional postings vs df=$want) — run " +
          "PositionalIndex.append for the missed batch (or build to reset)")
    }
    (posRows, dfCounts)
  }

  /** Batched positional serving — the Retriever-shaped entry point: many
    * [[PositionalQuery]] specs answered in ONE pass over the positional
    * arm. Returns (query_id, doc_id, score, rank), score = the query's
    * match count (an exact integer in a double — rank order is therefore
    * SQL-replicable, which is what lets WAND+positional ensembles carry an
    * exact DuckDB oracle, q_ensemble_phrase).
    *
    * Scale shape (flat in batch size, like the WAND batch kernel): the
    * UNION of the batch's terms is pulled with one pushed-down IN filter
    * and one shard repartition; per shard every term is decoded ONCE and
    * shared by all queries touching it; per (shard, query) a k-bounded
    * heap emits at most k rows, so the final per-query rank window sees
    * <= shards x k rows — matched-doc counts never materialize globally.
    */
  def search(spark: org.apache.spark.sql.SparkSession, indexDir: String,
             queries: Seq[(Long, PositionalQuery)], k: Int,
             io: graft.io.TableIO = graft.io.ParquetDirIO,
             meta: graft.io.MetaIO = graft.io.LocalMetaIO): DataFrame = {
    import spark.implicits._
    require(k > 0, "Phrase.search: k must be > 0")
    def empty = spark.emptyDataset[(Long, Long, Double)]
      .toDF("query_id", "doc_id", "score")
      .withColumn("rank", lit(1)).limit(0)
    if (queries.isEmpty) return empty
    val allTerms = queries.flatMap(_._2.slotTerms).distinct
    val (posRows, dfCounts) = loadGated(spark, indexDir, allTerms, io, meta)
    // conjunctive semantics: a query naming an unindexed term matches nothing
    val live = queries.filter(
      _._2.slotTerms.forall(t => dfCounts.getOrElse(t, 0L) > 0L)).toArray
    if (live.isEmpty) return empty
    val tomb = graft.index.PackedIndex.loadTombstones(indexDir, meta)
    val bcTomb = spark.sparkContext.broadcast(tomb)
    val bcQueries = spark.sparkContext.broadcast(live)
    // capped at the shard count — see Wand.searchPrepared (r7)
    val parts = math.max(math.min(spark.sparkContext.defaultParallelism * 4,
      graft.index.PackedIndex.numShardsBound(indexDir, meta)), 1)
    val hits = posRows
      .repartition(parts, col("shard"))
      .sortWithinPartitions(col("shard"), col("term"))
      .mapPartitions { it =>
        val qs = bcQueries.value
        val tombArr = bcTomb.value
        // ONE bounded heap per query for the whole task (all its shard
        // groups) — the global rank receives numTasks x k rows per query
        // instead of numShards x k, mirroring the WAND kernel's r7
        // task-level merge; results identical (a doc in the global top-k
        // is in every covering subset's top-k, same tie order)
        val heaps = new Array[BoundedCountHeap](qs.length)
        val buf = it.buffered
        while (buf.hasNext) {
          val shard = buf.head.shard
          val rows = scala.collection.mutable.ArrayBuffer.empty[graft.index.PosPostings]
          while (buf.hasNext && buf.head.shard == shard) rows += buf.next()
          val decoded = decodeShard(rows.toSeq)
          var qi = 0
          while (qi < qs.length) {
            val (_, pq) = qs(qi)
            val matches = intersectCounts(decoded, pq.slotTerms.toArray,
              tombArr, pq.kernel)
            if (matches.hasNext) {
              if (heaps(qi) == null) heaps(qi) = new BoundedCountHeap(k)
              matches.foreach { case (doc, cnt) => heaps(qi).offer(doc, cnt) }
            }
            qi += 1
          }
        }
        qs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
          val h = heaps(qi)
          if (h == null) Iterator.empty
          else h.drain().map { case (doc, cnt) => (qid, doc, cnt) }
        }
      }
      .toDF("query_id", "doc_id", "cnt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cnt").desc, col("doc_id").asc)
    hits.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("cnt").cast("double").as("score"), col("rank"))
  }

  /** Dataset-typed positional query batch: (query_id, text) rows parsed by
    * `mode`, served in deterministic staged chunks through the same
    * chunked-batch machinery as [[Wand.searchDs]] (one staging pass, loud
    * accounting, per-chunk sinks). Parity with [[search]] on the same batch
    * is pinned in RetrieverSpec.
    */
  def searchDs(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               queries: DataFrame, mode: PositionalMode, k: Int,
               chunkSize: Int = 10000,
               io: graft.io.TableIO = graft.io.ParquetDirIO,
               stagingDir: Option[String] = None,
               meta: graft.io.MetaIO = graft.io.LocalMetaIO): DataFrame =
    ChunkedServe.serve(spark, queries, chunkSize, io, stagingDir, meta,
      "Phrase.searchDs") { chunk =>
      search(spark, indexDir,
        chunk.map { case (id, text) => id -> mode.parse(text) }, k, io, meta)
    }

  /** Bounded top-k accumulator by (count desc, doc_id asc) — the per-query
    * task-level heap that keeps the batch path's global rank input at
    * <= numTasks x k rows per query (see the r7 merge note in [[search]]).
    */
  private[query] final class BoundedCountHeap(k: Int) {
    // worst-first ordering: head = smallest count, then largest doc_id
    private val ord = Ordering.by[(Long, Long), (Long, Long)] {
      case (doc, cnt) => (-cnt, doc)
    }
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
    def offer(doc: Long, cnt: Long): Unit = {
      val e = (doc, cnt)
      if (heap.size < k) heap.enqueue(e)
      else if (ord.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
    }
    def drain(): Iterator[(Long, Long)] = heap.iterator
  }

  /** Shared positional-kernel plumbing for phrase/proximity top-k:
    * staleness gate, pushed-down term filter, shard-local doc-list
    * intersection, tombstone check, then `countFn` over the per-SLOT
    * position arrays (slot i = occurrences of `slotTerms(i)` in the doc;
    * repeated terms share their array) — docs with count > 0 rank by
    * (count desc, doc_id asc).
    */
  private def positionalKernelTopK(spark: org.apache.spark.sql.SparkSession,
                                   indexDir: String, slotTerms: Seq[String],
                                   k: Int, countCol: String,
                                   io: graft.io.TableIO = graft.io.ParquetDirIO,
                                   meta: graft.io.MetaIO = graft.io.LocalMetaIO)(
      countFn: Array[Array[Long]] => Long): DataFrame = {
    import spark.implicits._
    require(slotTerms.nonEmpty, "positionalKernelTopK: no terms")
    val distinctTerms = slotTerms.distinct
    val (posRows, dfCounts) = loadGated(spark, indexDir, distinctTerms, io, meta)
    if (distinctTerms.exists(t => dfCounts.getOrElse(t, 0L) == 0L))
      return spark.emptyDataset[(Long, Long)].toDF("doc_id", countCol)
        .withColumn("rank", lit(1)).limit(0)
    val tomb = graft.index.PackedIndex.loadTombstones(indexDir, meta)
    val bcTomb = spark.sparkContext.broadcast(tomb)
    val bcSlots = spark.sparkContext.broadcast(slotTerms.toArray)
    // capped at the shard count — see Wand.searchPrepared (r7)
    val parts = math.max(math.min(spark.sparkContext.defaultParallelism * 4,
      graft.index.PackedIndex.numShardsBound(indexDir, meta)), 1)
    val counted = posRows
      .repartition(parts, col("shard"))
      .sortWithinPartitions(col("shard"), col("term"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[Iterator[(Long, Long)]] {
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[(Long, Long)] = {
            val shard = buf.head.shard
            val rows = scala.collection.mutable.ArrayBuffer.empty[graft.index.PosPostings]
            while (buf.hasNext && buf.head.shard == shard) rows += buf.next()
            shardSlotCounts(rows.toSeq, bcSlots.value, bcTomb.value, countFn)
          }
        }.flatten
      }
      .toDF("doc_id", countCol)
      .filter(col(countCol) > 0)
    val bounded = counted
      .orderBy(col(countCol).desc, col("doc_id").asc).limit(k)
    graft.index.InvertedIndex.rankBounded(bounded, col("doc_id"),
      col(countCol).desc, col("doc_id").asc)
  }

  /** Per-shard positional kernel: decode each slot term's (docId ->
    * positions) within the shard, intersect the DISTINCT terms' sorted doc
    * lists with a k-way merge, and for every surviving doc apply `countFn`
    * to the per-slot position arrays. A (shard, term) may span multiple
    * rows (appends land in new groups) — block lists are concatenated in
    * base order like the WAND kernel does.
    */
  private[query] def shardSlotCounts(rows: Seq[graft.index.PosPostings],
                                     phrase: Array[String],
                                     tomb: Array[Long],
                                     countFn: Array[Array[Long]] => Long): Iterator[(Long, Long)] =
    intersectCounts(decodeShard(rows), phrase, tomb, countFn)

  /** Decode one shard's positional rows ONCE per term: sorted doc ids +
    * per-doc position arrays. A (shard, term) may span multiple rows
    * (appends land in new groups) — block lists are concatenated in base
    * order like the WAND kernel does. In the batch path this decode is
    * shared by every query touching the term.
    */
  private[query] def decodeShard(rows: Seq[graft.index.PosPostings]):
      collection.Map[String, (Array[Long], Array[Array[Long]])] = {
    val byTerm = scala.collection.mutable.HashMap.empty[String, Array[graft.index.PackedPosBlock]]
    rows.foreach { r =>
      byTerm.get(r.term) match {
        case None => byTerm.update(r.term, r.blocks)
        case Some(existing) =>
          byTerm.update(r.term, (existing ++ r.blocks).sortBy(_.base))
      }
    }
    byTerm.map { case (t, blocks) =>
      val docs = Array.newBuilder[Long]
      val poss = Array.newBuilder[Array[Long]]
      blocks.foreach { b =>
        val cb = b.toCodec
        docs ++= cb.decodeDocIds
        poss ++= cb.decodePositions
      }
      t -> (docs.result(), poss.result())
    }
  }

  /** Intersect the DISTINCT slot terms' sorted doc lists with a k-way merge
    * and apply `countFn` to each surviving doc's per-slot position arrays,
    * emitting (doc_id, count) for counts > 0.
    */
  private[query] def intersectCounts(decodedAll: collection.Map[String, (Array[Long], Array[Array[Long]])],
                                     phrase: Array[String],
                                     tomb: Array[Long],
                                     countFn: Array[Array[Long]] => Long): Iterator[(Long, Long)] = {
    val distinctTerms = phrase.distinct
    if (!distinctTerms.forall(decodedAll.contains)) return Iterator.empty
    val decoded = distinctTerms.map(t => t -> decodedAll(t)).toMap
    // k-way sorted intersection over the distinct terms' doc lists
    val lists = distinctTerms.map(decoded)
    val cursors = new Array[Int](lists.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var done = false
    while (!done) {
      // candidate = max of current heads; advance all lists to it
      var cand = Long.MinValue
      var i = 0
      while (i < lists.length && !done) {
        if (cursors(i) >= lists(i)._1.length) done = true
        else if (lists(i)._1(cursors(i)) > cand) cand = lists(i)._1(cursors(i))
        i += 1
      }
      if (!done) {
        var aligned = true
        i = 0
        while (i < lists.length) {
          val docsArr = lists(i)._1
          var c = cursors(i)
          while (c < docsArr.length && docsArr(c) < cand) c += 1
          cursors(i) = c
          if (c >= docsArr.length) { aligned = false; done = true }
          else if (docsArr(c) != cand) aligned = false
          i += 1
        }
        if (aligned) {
          if (java.util.Arrays.binarySearch(tomb, cand) < 0) {
            // positions per phrase slot (repeated terms share their array)
            val slotPos: Array[Array[Long]] = phrase.map { t =>
              val (docsArr, possArr) = decoded(t)
              val idx = cursors(distinctTerms.indexOf(t))
              // cursor of t's list is aligned at cand
              possArr(idx)
            }
            val cnt = countFn(slotPos)
            if (cnt > 0) out += ((cand, cnt))
          }
          // advance every list past the candidate
          i = 0
          while (i < lists.length) { cursors(i) += 1; i += 1 }
        }
      }
    }
    out.iterator
  }
}
