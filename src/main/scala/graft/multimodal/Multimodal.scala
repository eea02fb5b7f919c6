package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque BINARY columns with typed metadata, decoded/feature-extracted in
  * executor-side batches.
  *
  * Decode is REAL for the uncompressed, header-parseable formats a pure JVM
  * can handle without codec libraries:
  *   - `audio/wav`                RIFF/PCM 16-bit — rms / zero-crossing /
  *                                peak / mean-abs over the actual samples
  *   - `image/x-portable-pixmap`  netpbm P6 — per-channel means + luma
  *                                mean/stddev over the actual pixels
  *   - `video/x-yuv4mpeg`         YUV4MPEG2 (C420) — frame count from FRAME
  *                                markers, first/last-frame luma means
  * Compressed formats (jpeg/mp4/mp3...) fall back to [[StubDecoder]] — this
  * container has no codec libraries, so that path stays an HONEST
  * deterministic fake; a production decoder (JNI/ONNX/javacv) drops in
  * behind [[MediaDecoder]] without touching the plan. The batch shape
  * mirrors a vectorized (mapInPandas-style) UDF: one kernel call per
  * `batchSize` rows per partition, amortizing per-call codec/model setup.
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

/** Deterministic fake decoder for formats the JVM cannot decode without
  * codec libraries: "dimensions" and a 16-dim "embedding" are pure functions
  * of the payload bytes (FNV-1a rolling hash). Clearly NOT a real codec;
  * kept only as the fallback arm of [[HeaderCodecs]].
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

/** Real pure-JVM decode for uncompressed header-parseable media. Feature
  * layout is fixed at 16 floats (zero-padded) so downstream columns are
  * uniform across kinds:
  *   audio/wav:  [rms, zcr, peak, meanAbs, sampleRate/1e5, channels, 0...]
  *   ppm image:  [meanR, meanG, meanB, meanLuma, stdLuma, 0...]
  *   y4m video:  [meanY(first), meanY(last), lastMinusFirst, 0...]
  * Malformed payloads fail LOUDLY (IllegalArgumentException) — silently
  * emitting zeros would poison training features downstream.
  */
object HeaderCodecs extends MediaDecoder {

  val FeatureDim = 16

  private def pad(fs: Array[Float]): Array[Float] =
    java.util.Arrays.copyOf(fs, FeatureDim)

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)

  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** RIFF/WAVE with 16-bit PCM: walk the chunk list for `fmt ` and `data`. */
  private[multimodal] def decodeWav(a: Asset): AssetFeatures = {
    val b = a.payload
    require(b.length >= 44 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", s"asset ${a.asset_id}: not RIFF/WAVE")
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = leInt(b, off + 4)
      require(size >= 0, s"asset ${a.asset_id}: negative RIFF chunk size")
      if (id == "fmt ") {
        require(leShort(b, off + 8) == 1, s"asset ${a.asset_id}: non-PCM wav")
        channels = leShort(b, off + 10)
        sampleRate = leInt(b, off + 12)
        bits = leShort(b, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(dataOff > 0 && sampleRate > 0 && bits == 16,
      s"asset ${a.asset_id}: missing fmt/data or not 16-bit (bits=$bits)")
    val nSamples = math.min(dataLen, b.length - dataOff) / 2
    var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0; var zc = 0
    var prev = 0.0
    var i = 0
    while (i < nSamples) {
      val s = leShort(b, dataOff + 2 * i).toShort.toDouble / 32768.0
      sumSq += s * s; sumAbs += math.abs(s)
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s > 0 && prev <= 0) || (s < 0 && prev >= 0))) zc += 1
      prev = s
      i += 1
    }
    val n = math.max(1, nSamples)
    AssetFeatures(a.asset_id, "audio", width = 0, height = 0,
      n_frames = nSamples / math.max(1, channels),
      features = pad(Array(
        math.sqrt(sumSq / n).toFloat, (zc.toDouble / math.max(1, n - 1)).toFloat,
        peak.toFloat, (sumAbs / n).toFloat,
        sampleRate / 1e5f, channels.toFloat)))
  }

  /** netpbm P6 (binary RGB, maxval <= 255). */
  private[multimodal] def decodePpm(a: Asset): AssetFeatures = {
    val b = a.payload
    require(b.length > 2 && b(0) == 'P' && b(1) == '6', s"asset ${a.asset_id}: not P6")
    var off = 2
    def nextInt(): Int = {
      while (off < b.length &&
        (Character.isWhitespace(b(off)) || b(off) == '#')) {
        if (b(off) == '#') while (off < b.length && b(off) != '\n') off += 1
        else off += 1
      }
      var v = 0
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        v = v * 10 + (b(off) - '0'); off += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    off += 1 // single whitespace after maxval
    require(w > 0 && h > 0 && maxv > 0 && maxv <= 255 &&
      off + 3L * w * h <= b.length, s"asset ${a.asset_id}: bad P6 header/payload")
    var sr = 0.0; var sg = 0.0; var sb2 = 0.0; var sl = 0.0; var sl2 = 0.0
    val n = w * h
    var i = 0
    while (i < n) {
      val r = (b(off + 3 * i) & 0xFF).toDouble / maxv
      val g = (b(off + 3 * i + 1) & 0xFF).toDouble / maxv
      val bl = (b(off + 3 * i + 2) & 0xFF).toDouble / maxv
      val luma = 0.299 * r + 0.587 * g + 0.114 * bl
      sr += r; sg += g; sb2 += bl; sl += luma; sl2 += luma * luma
      i += 1
    }
    val meanL = sl / n
    AssetFeatures(a.asset_id, "image", w, h, n_frames = 1,
      features = pad(Array((sr / n).toFloat, (sg / n).toFloat, (sb2 / n).toFloat,
        meanL.toFloat, math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)).toFloat)))
  }

  /** YUV4MPEG2, C420 (the default chroma mode): plain-text stream header,
    * then FRAME marker lines each followed by w*h luma + 2*(w/2)*(h/2)
    * chroma bytes.
    */
  private[multimodal] def decodeY4m(a: Asset): AssetFeatures = {
    val b = a.payload
    val headEnd = b.indexOf('\n'.toByte)
    require(headEnd > 0, s"asset ${a.asset_id}: no y4m header line")
    val head = new String(b, 0, headEnd, "US-ASCII")
    require(head.startsWith("YUV4MPEG2"), s"asset ${a.asset_id}: not YUV4MPEG2")
    val params = head.split(' ').drop(1)
    def param(tag: Char): Option[String] =
      params.find(_.headOption.contains(tag)).map(_.tail)
    val w = param('W').map(_.toInt).getOrElse(0)
    val h = param('H').map(_.toInt).getOrElse(0)
    require(w > 0 && h > 0, s"asset ${a.asset_id}: y4m missing W/H")
    val frameBytes = w * h + 2 * ((w + 1) / 2) * ((h + 1) / 2)
    var off = headEnd + 1
    var nFrames = 0
    var firstMean = 0.0; var lastMean = 0.0
    while (off < b.length) {
      val lineEnd = b.indexOf('\n'.toByte, off)
      require(lineEnd > 0 &&
        new String(b, off, math.min(5, lineEnd - off), "US-ASCII") == "FRAME",
        s"asset ${a.asset_id}: expected FRAME marker at $off")
      val dataOff = lineEnd + 1
      require(dataOff + frameBytes <= b.length,
        s"asset ${a.asset_id}: truncated y4m frame")
      var s = 0.0
      var i = 0
      while (i < w * h) { s += (b(dataOff + i) & 0xFF) / 255.0; i += 1 }
      val mean = s / (w * h)
      if (nFrames == 0) firstMean = mean
      lastMean = mean
      nFrames += 1
      off = dataOff + frameBytes
    }
    require(nFrames > 0, s"asset ${a.asset_id}: y4m has no frames")
    AssetFeatures(a.asset_id, "video", w, h, nFrames,
      features = pad(Array(firstMean.toFloat, lastMean.toFloat,
        (lastMean - firstMean).toFloat)))
  }

  override def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      a.mime match {
        case "audio/wav"               => decodeWav(a)
        case "image/x-portable-pixmap" => decodePpm(a)
        case "video/x-yuv4mpeg"        => decodeY4m(a)
        case _                         => StubDecoder.decodeBatch(Seq(a)).head
      }
    }
}

object Multimodal {

  /** Feature extraction over asset batches — one decoder call per
    * `batchSize` rows per partition (vectorized-UDF shape). Narrow: no
    * shuffle; the BINARY column never leaves its partition.
    */
  def extractFeatures(assets: Dataset[Asset], decoder: MediaDecoder = HeaderCodecs,
                      batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap(b => decoder.decodeBatch(b)))
  }

  /** Frame sampling for video assets: emits every `stride`-th frame index.
    * For y4m the payload slice is the ACTUAL frame (header + FRAME chunk);
    * other kinds emit a bounded prefix (real decoders replace it with a
    * frame grab). The fan-out shape (row -> n_frames/stride rows, still
    * narrow) is the part that matters at scale.
    */
  def sampleFrames(assets: Dataset[Asset], decoder: MediaDecoder = HeaderCodecs,
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

  // ---- deterministic synthetic assets (REAL formats) --------------------

  private def wavBytes(rnd: scala.util.Random): Array[Byte] = {
    val sampleRate = 8000
    val nSamples = 200 + rnd.nextInt(600)
    val freq = 220.0 + rnd.nextInt(16) * 55.0
    val amp = 0.3 + rnd.nextDouble() * 0.6
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (amp * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w4(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF) }
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    w4("RIFF"); le32(36 + data.length); w4("WAVE")
    w4("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate * 2); le16(2); le16(16)
    w4("data"); le32(data.length); bos.write(data)
    bos.toByteArray
  }

  private def ppmBytes(rnd: scala.util.Random): Array[Byte] = {
    val w = 4 + rnd.nextInt(28); val h = 4 + rnd.nextInt(28)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    val rb = rnd.nextInt(256); val gb = rnd.nextInt(256); val bb = rnd.nextInt(256)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { // deterministic gradient, distinct per asset
        bos.write((rb + x * 7 + y * 3) & 0xFF)
        bos.write((gb + x * 5 + y * 11) & 0xFF)
        bos.write((bb + x * 13 + y * 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    bos.toByteArray
  }

  private def y4mBytes(rnd: scala.util.Random): Array[Byte] = {
    val w = 8; val h = 8
    val nFrames = 2 + rnd.nextInt(4)
    val base = rnd.nextInt(200)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    var f = 0
    while (f < nFrames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var i = 0
      while (i < w * h) { bos.write((base + f * 10 + i) & 0xFF); i += 1 } // Y
      i = 0
      while (i < 2 * (w / 2) * (h / 2)) { bos.write(128); i += 1 } // U,V neutral
      f += 1
    }
    bos.toByteArray
  }

  /** Deterministic synthetic asset table in REAL formats (PCM wav, P6 ppm,
    * YUV4MPEG2) plus a compressed-format arm (`video/mp4` with opaque bytes)
    * that exercises the documented stub fallback. Distributed like PagesGen.
    */
  def genAssets(spark: SparkSession, n: Long, partitions: Int = 8,
                seed: Long = 42): Dataset[Asset] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + i)
      (i % 4) match {
        case 0 => Asset(i, "audio/wav", wavBytes(rnd),
          s"http://media.example.test/a/$i.wav")
        case 1 => Asset(i, "image/x-portable-pixmap", ppmBytes(rnd),
          s"http://media.example.test/a/$i.ppm")
        case 2 => Asset(i, "video/x-yuv4mpeg", y4mBytes(rnd),
          s"http://media.example.test/a/$i.y4m")
        case _ =>
          val payload = new Array[Byte](128 + rnd.nextInt(896))
          rnd.nextBytes(payload)
          Asset(i, "video/mp4", payload, s"http://media.example.test/a/$i.mp4")
      }
    }
  }
}
