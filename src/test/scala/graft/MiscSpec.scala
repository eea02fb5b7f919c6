package graft

import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** TextFunctions + streaming + multimodal plumbing semantics. */
class MiscSpec extends SparkSpec {
  import spark.implicits._

  test("citations parse bracketed id lists like the reference regex") {
    val df = Seq((1L, "see [1, 2] then [34] and [not, numbers] done"))
      .toDF("doc_id", "text")
    val got = df.select(explode(TextFunctions.citations(col("text"))).as("c"))
      .as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2, 34))
  }

  test("chunkDocs windows with overlap and preserves short docs") {
    val df = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")), // 50 toks -> 3 chunks @20/5
      (2L, "a b c")).toDF("doc_id", "text")
    val got = TextFunctions.chunkDocs(df, "doc_id", "text", 20, 5)
      .select("doc_id", "chunk_pos", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 3) // ceil((50-20)/15)+1 = 3
    assert(d1(0)._3.startsWith("t1 ") && d1(0)._3.endsWith(" t20"))
    assert(d1(1)._3.startsWith("t16 ") && d1(1)._3.endsWith(" t35")) // overlap 5
    assert(d1(2)._3.startsWith("t31 ") && d1(2)._3.endsWith(" t50"))
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2(0)._3 == "a b c")
  }

  test("segmentMean is the elementwise per-segment mean") {
    val df = Seq(
      (1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (2L, Seq(10.0, 20.0)))
      .toDF("segment_id", "vec")
    val got = TextFunctions.segmentMean(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(2.0, 3.0))
    assert(got(2L) == Seq(10.0, 20.0))
  }

  test("RAG pipeline assembles rank-ordered context and extracts citations") {
    val docs = Seq(
      (0L, "alpha doc [1, 2]"), (1L, "beta doc [3]"), (2L, "gamma [2]"),
      (3L, "never retrieved [9]")).toDF("doc_id", "text")
    val fixed = new graft.query.Retriever {
      override def search(sp: org.apache.spark.sql.SparkSession,
                          queries: Seq[(Long, String)], k: Int) = {
        import sp.implicits._
        Seq((7L, 1L, 3.0, 1), (7L, 0L, 2.0, 2), (7L, 2L, 1.0, 3))
          .toDF("query_id", "doc_id", "score", "rank")
      }
    }
    val out = graft.pipelines.Rag
      .processQueries(spark, fixed, Seq(7L -> "q"), docs, topK = 3)
      .collect()
    assert(out.length == 1)
    // _prepare_context: "\n".join in rank order (rag.py:99-101)
    assert(out.head.getAs[String]("context") ==
      "beta doc [3]\nalpha doc [1, 2]\ngamma [2]")
    // extract_citations: distinct ints from bracket groups (rag.py:103-109)
    assert(out.head.getSeq[Int](2).sorted == Seq(1, 2, 3))
  }

  test("RAG chunk-rerank max-merges chunk scores back to parents") {
    val docs = Seq(
      (0L, (1 to 30).map(i => s"a$i").mkString(" ") + " needle"),
      (1L, (1 to 30).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    val fixed = new graft.query.Retriever {
      override def search(sp: org.apache.spark.sql.SparkSession,
                          queries: Seq[(Long, String)], k: Int) = {
        import sp.implicits._
        Seq((1L, 1L, 2.0, 1), (1L, 0L, 1.0, 2)).toDF("query_id", "doc_id", "score", "rank")
      }
    }
    // chunk score: 1 if the chunk contains "needle" else 0 -> doc 0 wins
    val rerank: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      graft.pipelines.Rag.chunkRerank(10, 2)(
        c => when(c.contains("needle"), 1.0).otherwise(0.0))
    val out = graft.pipelines.Rag
      .processQueries(spark, fixed, Seq(1L -> "q"), docs, topK = 2, reranker = rerank)
      .collect().head
    assert(out.getAs[String]("context").startsWith("a1 ")) // doc 0 re-ranked first
  }

  test("streaming windowed agg equals the batch plan on events") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStream.windowedAgg(
      spark.read.parquet(s"$dir/events.parquet")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val streamed = EventStream.runAsStream(spark, s"$dir/events.parquet")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("wav decode: exact features from hand-built PCM") {
    // samples +0.5, -0.5, +0.5, -0.5 -> rms 0.5, zcr 1.0, peak 0.5, meanAbs 0.5
    val bos = new java.io.ByteArrayOutputStream()
    def w4(s: String) = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF) }
    def le16(v: Int) = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    w4("RIFF"); le32(36 + 8); w4("WAVE")
    w4("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    w4("data"); le32(8)
    Seq(16384, -16384, 16384, -16384).foreach(le16)
    val f = graft.multimodal.HeaderCodecs.decodeBatch(
      Seq(graft.multimodal.Asset(1L, "audio/wav", bos.toByteArray, "u"))).head
    assert(f.kind == "audio" && f.n_frames == 4)
    assert(math.abs(f.features(0) - 0.5f) < 1e-6, s"rms ${f.features(0)}")
    assert(f.features(1) == 1.0f, s"zcr ${f.features(1)}")   // every step crosses
    assert(math.abs(f.features(2) - 0.5f) < 1e-6)             // peak
    assert(math.abs(f.features(3) - 0.5f) < 1e-6)             // meanAbs
    assert(f.features(4) == 0.08f && f.features(5) == 1.0f)   // 8kHz mono
  }

  test("ppm decode: exact channel means from hand-built pixels") {
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0) // red, green
    val f = graft.multimodal.HeaderCodecs.decodeBatch(
      Seq(graft.multimodal.Asset(2L, "image/x-portable-pixmap", bytes, "u"))).head
    assert(f.kind == "image" && f.width == 2 && f.height == 1)
    assert(math.abs(f.features(0) - 0.5f) < 1e-6)  // meanR
    assert(math.abs(f.features(1) - 0.5f) < 1e-6)  // meanG
    assert(f.features(2) == 0.0f)                  // meanB
    val lumaMean = (0.299 + 0.587) / 2
    assert(math.abs(f.features(3) - lumaMean) < 1e-6)
    assert(math.abs(f.features(4) - math.abs(0.587 - 0.299) / 2) < 1e-6)
  }

  test("y4m decode: frame count and luma trajectory from hand-built frames") {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W2 H2 F25:1 C420\n".getBytes("US-ASCII"))
    Seq(0, 51, 102).foreach { y =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      (0 until 4).foreach(_ => bos.write(y)) // Y plane
      (0 until 2).foreach(_ => bos.write(128)) // U+V (1 each at 2x2 C420)
    }
    val f = graft.multimodal.HeaderCodecs.decodeBatch(
      Seq(graft.multimodal.Asset(3L, "video/x-yuv4mpeg", bos.toByteArray, "u"))).head
    assert(f.kind == "video" && f.width == 2 && f.height == 2 && f.n_frames == 3)
    assert(f.features(0) == 0.0f)
    assert(math.abs(f.features(1) - 102f / 255f) < 1e-6)
  }

  test("multimodal decode is real for generated wav/ppm/y4m, stub for mp4") {
    val assets = Multimodal.genAssets(spark, 100, 4)
    val f1 = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, batchSize = 7)
      .collect().sortBy(_.asset_id)
    assert(f1.length == 100)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.asset_id == b.asset_id && a.width == b.width &&
        a.features.sameElements(b.features)
    }) // batch size must not change results
    assert(f1.forall(_.features.length == 16))
    // every real-format asset decodes through the real path: a sine wave has
    // rms in (0.1, 0.8); images carry their true (small) dimensions; y4m
    // frame counts are the generated 2..5
    f1.foreach { f =>
      f.asset_id % 4 match {
        case 0 => assert(f.kind == "audio" && f.features(0) > 0.1f && f.features(0) < 0.8f)
        case 1 => assert(f.kind == "image" && f.width >= 4 && f.width <= 31)
        case 2 => assert(f.kind == "video" && f.n_frames >= 2 && f.n_frames <= 5)
        case _ => assert(f.kind == "video" && f.width >= 64) // stub fallback
      }
    }
    val frames = Multimodal.sampleFrames(assets, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    // malformed payloads fail loudly, not silently as zeros
    intercept[IllegalArgumentException] {
      graft.multimodal.HeaderCodecs.decodeBatch(Seq(
        graft.multimodal.Asset(9L, "audio/wav", Array[Byte](1, 2, 3), "u")))
    }
  }
}
