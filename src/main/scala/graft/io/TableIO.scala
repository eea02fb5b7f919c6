package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-format boundary for every persistent artifact the engine writes
  * (staged docs, packed postings groups, df tables).
  *
  * SURVEY §1.2 specifies Iceberg tables for pages/postings; this container
  * has no Iceberg jars (verified: /opt/spark/jars, offline resolver), so the
  * shipped implementation is parquet directories with _SUCCESS markers and
  * JSON sidecar manifests. Everything format-specific is behind this trait:
  * on a real cluster an `IcebergIO` maps `write` to a table commit
  * (snapshot), `committed` to table existence, and the engine's group
  * manifests become snapshot metadata — no call-site changes.
  */
trait TableIO extends Serializable {

  /** Write a table, replacing any previous content at the location. */
  def write(df: DataFrame, location: String, partitionBy: Seq[String] = Nil): Unit

  def read(spark: SparkSession, location: String): DataFrame

  /** True iff a COMPLETE write exists at the location (atomicity marker). */
  def committed(location: String): Boolean
}

/** Parquet-directory implementation: the directory is the table, the
  * _SUCCESS file its commit marker.
  */
object ParquetDirIO extends TableIO {

  override def write(df: DataFrame, location: String,
                     partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(location)
  }

  override def read(spark: SparkSession, location: String): DataFrame =
    spark.read.parquet(location)

  override def committed(location: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(location, "_SUCCESS"))
}
