package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Monotone, zipWithIndex-free docId assignment (SURVEY §4 item 5).
  *
  * `monotonically_increasing_id()` is Catalyst-native (no shuffle, no RDD):
  * it packs `partitionId << 33 | rowInPartition`. Dense ids are then derived
  * by replacing the partition base with the exclusive prefix sum of partition
  * counts — one tiny aggregation (numPartitions rows) collected to the driver
  * and broadcast back as a join against a literal map.
  *
  * Determinism: dense ids are stable for a fixed input file layout (same
  * files, same splits) — the same condition the reference's positional ids
  * rely on. At 10^12 docs the counts table is ~#partitions rows (≤ millions),
  * still driver-safe; the data itself is never shuffled.
  */
object DocIds {

  /** Adds a dense `doc_id` column (0..N-1). */
  def assignDense(df: DataFrame, idName: String = "doc_id"): DataFrame = {
    val withMid = df.withColumn("__mid", monotonically_increasing_id())
    val pidCol = (col("__mid") / lit(1L << 33)).cast("long")
    val counts = withMid.groupBy(pidCol.as("__pid")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__pid")).collect()
    val offsets = new java.util.HashMap[Long, Long]()
    var acc = 0L
    counts.foreach { r =>
      offsets.put(r.getLong(0), acc)
      acc += r.getLong(1)
    }
    val spark = df.sparkSession
    val offsetsDf = {
      import spark.implicits._
      offsets.entrySet().toArray.map { e =>
        val kv = e.asInstanceOf[java.util.Map.Entry[Long, Long]]
        (kv.getKey, kv.getValue)
      }.toSeq.toDF("__pid", "__offset")
    }
    withMid
      .withColumn("__pid", pidCol)
      .join(broadcast(offsetsDf), "__pid")
      .withColumn(idName,
        col("__offset") + (col("__mid") % lit(1L << 33)))
      .drop("__mid", "__pid", "__offset")
  }

  /** Fast non-dense variant: partition-bit-packed ids directly (no count
    * pass). Monotone per partition; use when density is not required.
    */
  def assignPacked(df: DataFrame, idName: String = "doc_id"): DataFrame =
    df.withColumn(idName, monotonically_increasing_id())
}
