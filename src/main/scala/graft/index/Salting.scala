package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling: salted repartitioning for hot-key aggregations
  * and joins (north rule: "salted repartitioning plus long-posting-list
  * splitting").
  *
  * Where the engine needs it structurally, skew is already designed out:
  * the pack shuffle keys on doc-shard (uniform ranges — a stopword's
  * postings split across every shard), and posting lists split further into
  * fixed blocks. This module provides the salting primitives for the
  * remaining shapes — term-keyed aggregations over raw postings (e.g. a df
  * computed straight off an explode) and joins against a skewed key — and
  * is exercised by the salted df aggregation below.
  */
object Salting {

  /** Two-phase salted aggregation: count rows per key without any reducer
    * seeing a hot key whole. Phase 1 groups by (key, salt) — hot keys fan
    * out over `salts` reducers; phase 2 sums the per-salt partials (at most
    * `salts` rows per key). Equivalent to groupBy(key).count() but bounded
    * per-reducer even under adversarial skew beyond what partial
    * aggregation absorbs.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 64,
                  outCol: String = "cnt"): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(outCol))

  /** Salted broadcast-style join for a skewed build side: replicate each
    * small-side row `salts` times with a salt column, salt the big side by
    * hash of its row, then equi-join on (key, salt). Spreads a hot key's
    * big-side rows across `salts` tasks. Small side must actually be small
    * (it is replicated).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Split rows of hot keys into sub-keys ("term#k") before a per-key
    * merge, keyed by a frequency table; re-merge groups the sub-keys back.
    * Returns the input with a `salted_key` column: cold keys keep their
    * key, hot keys (freq > threshold) get key + '#' + hash-derived suffix.
    */
  def splitHotKeys(df: DataFrame, keyCol: String, freq: DataFrame,
                   threshold: Long, salts: Int = 16): DataFrame = {
    val hot = freq.filter(col("cnt") > threshold).select(col(keyCol), lit(1).as("__hot"))
    df.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("salted_key",
        when(col("__hot").isNotNull,
          concat(col(keyCol), lit("#"),
            pmod(xxhash64(monotonically_increasing_id()), lit(salts))))
          .otherwise(col(keyCol)))
      .drop("__hot")
  }
}
