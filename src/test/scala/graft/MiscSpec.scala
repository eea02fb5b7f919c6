package graft

import graft.functions.TextFunctions
import graft.multimodal.{Multimodal, StubDecoder}
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

  test("multimodal stub decode is deterministic, batched, and narrow") {
    val assets = Multimodal.genAssets(spark, 100, 4)
    val f1 = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, StubDecoder, batchSize = 7)
      .collect().sortBy(_.asset_id)
    assert(f1.length == 100)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.asset_id == b.asset_id && a.width == b.width &&
        a.features.sameElements(b.features)
    }) // batch size must not change results
    assert(f1.forall(_.features.length == 16))
    val frames = Multimodal.sampleFrames(assets, stride = 10).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 10 == 0))
  }
}
