package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque BINARY columns with typed metadata, decoded/feature-extracted in
  * executor-side batches.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder]] produces deterministic fake features derived
  * from the payload bytes, so every piece of Spark-side plumbing — schema,
  * batching shape, partitioning, join-back — is real and testable, and a
  * production decoder (JNI/ONNX/javacv) drops in behind [[MediaDecoder]]
  * without touching the plan. The batch shape mirrors a vectorized
  * (mapInPandas-style) UDF: one kernel call per `batchSize` rows per
  * partition, amortizing per-call model/codec setup.
  */
final case class Asset(asset_id: Long, mime: String, payload: Array[Byte],
                       source_url: String)

final case class AssetFeatures(asset_id: Long, kind: String, width: Int,
                               height: Int, n_frames: Int,
                               features: Array[Float])

final case class Frame(asset_id: Long, frame_idx: Int, payload: Array[Byte])

/** Batched decode kernel contract. Implementations must be deterministic
  * per payload for resumable pipelines.
  */
trait MediaDecoder extends Serializable {
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures]
}

/** Deterministic fake decoder: "dimensions" and a 16-dim "embedding" are
  * pure functions of the payload bytes (FNV-1a rolling hash). Replaces
  * `???` so pipelines run end-to-end; clearly NOT a real codec.
  */
object StubDecoder extends MediaDecoder {
  private def fnv(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFF; h *= 0x100000001b3L; i += 1 }
    h
  }
  override def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      val kind = a.mime.takeWhile(_ != '/')
      val h = fnv(a.payload, 0)
      val feats = Array.tabulate(16)(i =>
        ((fnv(a.payload, i + 1) >>> 11).toDouble / (1L << 53).toDouble).toFloat)
      AssetFeatures(a.asset_id, kind,
        width = 64 + (h & 0x3FF).toInt,
        height = 64 + ((h >>> 10) & 0x3FF).toInt,
        n_frames = if (kind == "video") 1 + ((h >>> 20) & 0xFF).toInt else 1,
        features = feats)
    }
}

object Multimodal {

  /** Feature extraction over asset batches — one decoder call per
    * `batchSize` rows per partition (vectorized-UDF shape). Narrow: no
    * shuffle; the BINARY column never leaves its partition.
    */
  def extractFeatures(assets: Dataset[Asset], decoder: MediaDecoder = StubDecoder,
                      batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap(b => decoder.decodeBatch(b)))
  }

  /** Frame sampling plumbing for video assets: emits every `stride`-th frame
    * index with a (stubbed) per-frame payload slice. Real decoders replace
    * the slice with an actual frame grab; the fan-out shape (row -> n_frames/
    * stride rows, still narrow) is the part that matters at scale.
    */
  def sampleFrames(assets: Dataset[Asset], decoder: MediaDecoder = StubDecoder,
                   stride: Int = 10): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.grouped(64).flatMap { batch =>
      val metas = decoder.decodeBatch(batch)
      batch.zip(metas).flatMap { case (a, m) =>
        (0 until m.n_frames by stride).map { fi =>
          val len = math.min(32, a.payload.length)
          Frame(a.asset_id, fi, a.payload.take(len))
        }
      }
    })
  }

  /** Deterministic synthetic asset table (binary payloads from a seeded
    * generator), distributed like PagesGen.
    */
  def genAssets(spark: SparkSession, n: Long, partitions: Int = 8,
                seed: Long = 42): Dataset[Asset] = {
    import spark.implicits._
    val mimes = Array("image/jpeg", "image/png", "audio/mpeg", "video/mp4")
    spark.range(0L, n, 1L, partitions).map { i =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + i)
      val payload = new Array[Byte](128 + rnd.nextInt(896))
      rnd.nextBytes(payload)
      Asset(i, mimes(rnd.nextInt(mimes.length)), payload,
        s"http://media.example.test/a/$i")
    }
  }
}
