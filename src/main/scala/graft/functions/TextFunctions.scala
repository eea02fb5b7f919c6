package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar/array functions + chunking from SURVEY §2.2/§2.8 that are pure
  * column expressions (codegen'd, no UDFs).
  */
object TextFunctions {

  /** P2: instruction-prefix projection ('{}'.format(q), dataset.py:123-124,
    * embedding_auto.py:244-249).
    */
  def withInstruction(text: Column, instruction: String): Column =
    concat(lit(instruction), text)

  /** P3: title + separator + text concat (dataset.py:129,149). */
  def titleText(title: Column, text: Column, sep: String = " "): Column =
    concat_ws(sep, title, text)

  /** P4: stopword removal over a token array (retrieval_auto.py:362-373).
    * Order- and duplicate-preserving: `array_except` would return DISTINCT
    * elements, collapsing repeated non-stopword tokens to tf=1 and
    * corrupting BM25 term frequencies / doc lengths.
    */
  def removeStopwords(terms: Column, stopwords: Seq[String]): Column =
    filter(terms, t => !array_contains(lit(stopwords.toArray), t))

  /** P7: citation extraction — regex `\[([\d, ]+)\]` -> array of ints
    * (pipelines/rag.py:102-109; the reference splits on comma and casts).
    */
  def citations(text: Column): Column =
    array_distinct(filter(
      transform(
        flatten(transform(
          regexp_extract_all(text, lit("\\[([\\d, ]+)\\]"), lit(1)),
          g => split(g, ","))),
        s => trim(s).cast("int")),
      x => x.isNotNull))

  /** F7: dot-score with temperature + nan_to_num(0)
    * (retrieval_auto.py:258-266).
    */
  def dotWithTemperature(a: Column, b: Column, temperature: Double): Column =
    nanvl(graft.ann.Ann.dot(a, b) / lit(temperature), lit(0.0))

  /** F8: sigmoid normalization (base.py:241-242). */
  def sigmoid(score: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-score))

  /** A10: segment mean pooling — elementwise mean of vectors per segment id
    * (`_unsorted_segment_mean`, embedding_auto.py:570-579). Input frame:
    * (segment_id, vec ARRAY<DOUBLE>); output (segment_id, mean_vec).
    * Shuffle on segment_id only.
    *
    * Determinism: floating-point addition is not associative, so a plain
    * `avg()` (partial aggregation in partition order) drifts by ulps with
    * partitioning and cannot hash-match a sequential oracle. Here each
    * (segment, dim) group's values are sorted ascending and left-folded, a
    * partitioning-independent summation order any oracle can replicate
    * (`list_reduce(list_sort(list(x)), ...)` in DuckDB). The collect_list is
    * bounded by segment cardinality; for segments too large for one buffer,
    * sum in two deterministic levels (fixed key-range sub-buckets, then the
    * same sorted fold over sub-sums).
    */
  def segmentMean(df: DataFrame, segCol: String = "segment_id",
                  vecCol: String = "vec"): DataFrame =
    df.select(col(segCol), posexplode(col(vecCol)))
      .groupBy(col(segCol), col("pos"))
      .agg((aggregate(array_sort(collect_list(col("col"))), lit(0.0),
        (a, v) => a + v) / count(lit(1))).as("m"))
      .groupBy(col(segCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mean_vec"))

  /** F10: MaxSim late interaction (ColBERT shape, `models/rerank.py:448-466`):
    * for token-vector arrays q, d (ARRAY<ARRAY<DOUBLE>>):
    * mean over query tokens of (max over doc tokens of dot(qt, dt)).
    * Pure array expressions — shape parity for the reference's
    * `einsum(...).max(2).sum(1)/len(q)`; the token vectors themselves come
    * from whatever encoder the caller provides (model-free here).
    */
  def maxSim(qTokens: Column, dTokens: Column): Column = {
    val perQ = transform(qTokens, qt =>
      array_max(transform(dTokens, dt => graft.ann.Ann.dot(qt, dt))))
    when(size(qTokens) > 0,
      aggregate(perQ, lit(0.0), (a, v) => a + v) / size(qTokens))
      .otherwise(0.0)
  }

  /** F13 pooling family (models/pooling.py): reduce ARRAY<ARRAY<DOUBLE>>
    * token vectors to one vector. mean/cls(first)/last/sum — the mask-aware
    * variants collapse to these once padding is gone (Spark arrays are
    * unpadded).
    */
  def poolMean(tokens: Column): Column = {
    val sum = aggregate(tokens, lit(null).cast("array<double>"),
      (acc, v) => when(acc.isNull, v).otherwise(zip_with(acc, v, (x, y) => x + y)))
    when(size(tokens) > 0, transform(sum, x => x / size(tokens)))
      .otherwise(lit(null).cast("array<double>"))
  }
  def poolCls(tokens: Column): Column = element_at(tokens, 1)
  def poolLast(tokens: Column): Column = element_at(tokens, -1)
  def poolSum(tokens: Column): Column =
    aggregate(tokens, lit(null).cast("array<double>"),
      (acc, v) => when(acc.isNull, v).otherwise(zip_with(acc, v, (x, y) => x + y)))

  /** GeM text pooling (`GeMText`, pooling.py:121-145): per dimension,
    * (mean over tokens of clamp(x, eps)^p)^(1/p). Mask-free form — Spark
    * arrays are unpadded, so attention_mask == all-ones.
    */
  def poolGem(tokens: Column, p: Double = 3.0, eps: Double = 1e-6): Column = {
    val sums = aggregate(tokens, lit(null).cast("array<double>"),
      (acc, v) => {
        val vp = transform(v, x => pow(greatest(x, lit(eps)), lit(p)))
        when(acc.isNull, vp).otherwise(zip_with(acc, vp, (a, b) => a + b))
      })
    when(size(tokens) > 0,
      transform(sums, s => pow(s / size(tokens), lit(1.0 / p))))
      .otherwise(lit(null).cast("array<double>"))
  }

  /** Weighted-layer pooling (`WeightedLayerPooling`, pooling.py:100-118):
    * weighted mean over an array of per-layer vectors,
    * sum(w_i * layer_i) / sum(w). `layers` is ARRAY<ARRAY<DOUBLE>> ordered
    * from layer_start; `weights` must match its length.
    */
  def poolWeightedLayer(layers: Column, weights: Seq[Double]): Column = {
    val weighted = zip_with(layers, lit(weights.toArray),
      (v, wi) => transform(v, x => x * wi))
    val summed = aggregate(weighted, lit(null).cast("array<double>"),
      (acc, v) => when(acc.isNull, v).otherwise(zip_with(acc, v, (a, b) => a + b)))
    transform(summed, x => x / lit(weights.sum))
  }

  /** FM (factorization-machine) pooling (`FMPooling`, pooling.py:209-222):
    * per dimension, 0.5 * ((sum x)^2 - sum(x^2)) — the second-order
    * interaction term.
    */
  def poolFm(tokens: Column): Column = {
    val s = poolSum(tokens)
    val sq = poolSum(transform(tokens, v => transform(v, x => x * x)))
    zip_with(s, sq, (a, b) => lit(0.5) * (a * a - b))
  }

  /** Token-window chunking with overlap + chunk->parent map — the
    * DocumentSplitter shape (`models/utils.py:136-167`): window size
    * `chunkTokens`, stride `chunkTokens - overlap`, short docs pass through
    * as one chunk. Emits (parent fields..., chunk_id, chunk_pos, chunk_text).
    * Pure array ops: a narrow flatMap-shaped transform+posexplode, no UDF,
    * no shuffle.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = graft.tokenize.PyTokenize.asciiSplit(col(textCol))
    val nChunksExpr =
      when(size(toks) <= chunkTokens, lit(1))
        .otherwise(ceil((size(toks) - lit(chunkTokens)).cast("double") / stride) + 1)
    docs
      .withColumn("__toks", toks)
      .withColumn("__n", nChunksExpr.cast("int"))
      .select(col("*"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => concat_ws(" ", slice(col("__toks"), i * stride + lit(1), lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_pos")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("chunk_id",
        col(idCol).cast("long") * lit(1 << 16) + col("chunk_pos"))
      .drop("__toks", "__n")
  }
}
