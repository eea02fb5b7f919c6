package graft.core

/** BM25 (Okapi) scoring semantics, matching the reference's BM25 path.
  *
  * The reference (`/root/reference/src/retrievals/models/retrieval_auto.py:384,391`)
  * delegates to the public `rank_bm25.BM25Okapi` implementation, whose published
  * semantics are:
  *
  *   idf(t)   = ln(N - df(t) + 0.5) - ln(df(t) + 0.5)
  *   eps-floor: terms with idf < 0 get `epsilon * average_idf` where average_idf
  *              is the mean raw idf over the WHOLE vocabulary (may itself be
  *              negative; the floor is applied verbatim, not clamped).
  *   score(q, d) = sum over query term occurrences t of
  *       idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * dl(d)/avgdl))
  *   unseen query terms contribute 0; repeated query terms count once per
  *   occurrence (the reference loops over the raw token list).
  *
  * Library defaults in rank_bm25 are k1=1.5, b=0.75, epsilon=0.25; this engine's
  * operative configuration (BASELINE.json north rule) pins k1=1.2, b=0.75.
  * All three are configurable here; the oracle tests fix one setting.
  *
  * All arithmetic is Double end-to-end for rank parity (the reference computes
  * in float64 numpy).
  */
final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75, epsilon: Double = 0.25)

object Bm25 {

  /** Raw (un-floored) idf. */
  def rawIdf(n: Long, df: Long): Double =
    math.log(n - df + 0.5) - math.log(df + 0.5)

  /** Per-(term,doc) BM25 contribution. */
  def termScore(idf: Double, tf: Long, dl: Long, avgdl: Double, p: Bm25Params): Double =
    idf * tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))

  /** Upper bound of a term's contribution for any document: tf -> inf limit is
    * idf*(k1+1); the true max over a posting block uses the block's (tf, dl)
    * pairs. For block-max WAND we store the exact per-block max of
    * `termScore`, so this is only the global fallback bound.
    */
  def termScoreUpperBound(idf: Double, p: Bm25Params): Double =
    idf * (p.k1 + 1.0)

  /** Vocabulary-average raw idf (the epsilon-floor base), defined
    * order-independently: rawIdf depends only on df, so the average is
    * computed over the (df -> termCount) histogram in ascending-df order.
    * rank_bm25 sums in Python-dict insertion order, which no distributed
    * engine can reproduce bit-for-bit; this engine PINS the histogram
    * definition (mathematically equal, deterministic at any parallelism) and
    * uses it in both the in-JVM oracle and the distributed build, so
    * engine == oracle is exact down to the ulp.
    */
  def avgRawIdfFromHistogram(histogram: Seq[(Long, Long)], n: Long): Double = {
    var sum = 0.0
    var terms = 0L
    histogram.sortBy(_._1).foreach { case (df, cnt) =>
      sum += cnt * rawIdf(n, df)
      terms += cnt
    }
    if (terms == 0) 0.0 else sum / terms
  }

  /** In-memory exhaustive BM25 index over a small corpus — the test oracle.
    * Mirrors rank_bm25.BM25Okapi construction order exactly (single process,
    * vocabulary in first-seen order is irrelevant because average_idf is a sum).
    */
  final class Oracle(docs: IndexedSeq[Array[String]], p: Bm25Params = Bm25Params()) {
    val n: Int = docs.length
    val docLen: Array[Long] = docs.map(_.length.toLong).toArray
    val avgdl: Double = if (n == 0) 0.0 else docLen.sum.toDouble / n

    // tf maps per doc
    private val tf: Array[scala.collection.Map[String, Long]] =
      docs.map { d =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        d.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
        m
      }.toArray

    private val df: Map[String, Long] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      tf.foreach(_.keysIterator.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L)))
      m.toMap
    }

    val idf: Map[String, Double] = {
      val raw = df.map { case (t, f) => t -> rawIdf(n, f) }
      val hist = df.valuesIterator.toSeq.groupBy(identity)
        .map { case (d, xs) => d -> xs.size.toLong }.toSeq
      val eps = p.epsilon * avgRawIdfFromHistogram(hist, n)
      raw.map { case (t, v) => t -> (if (v < 0) eps else v) }
    }

    /** Score vector over ALL docs, like BM25Okapi.get_scores. */
    def scores(query: Seq[String]): Array[Double] = {
      val out = new Array[Double](n)
      query.foreach { q =>
        val qidf = idf.getOrElse(q, 0.0)
        if (qidf != 0.0) {
          var i = 0
          while (i < n) {
            val f = tf(i).getOrElse(q, 0L)
            if (f > 0L)
              out(i) += termScore(qidf, f, docLen(i), avgdl, p)
            i += 1
          }
        }
      }
      out
    }

    /** Top-k (docId, score), score desc, docId asc on ties — the pinned
      * deterministic tiebreak (reference relies on Python stable sort over
      * input order; with docIds == input positions the order is identical).
      * k < 0 means "all docs" like the reference's `[:top_k]` with top_k=-1...
      * actually Python list[:-1] drops the last element; the reference default
      * top_k=-1 is a caller bug we do NOT replicate — our k<=0 returns all.
      */
    def topK(query: Seq[String], k: Int): IndexedSeq[(Long, Double)] = {
      val s = scores(query)
      val all = Array.tabulate(n)(i => (i.toLong, s(i)))
        .sortBy { case (id, sc) => (-sc, id) }
      if (k <= 0) all.toIndexedSeq else all.take(k).toIndexedSeq
    }
  }
}
