package graft

import java.nio.file.Files
import graft.io.{HadoopMetaIO, HadoopTableIO, LocalMetaIO, ParquetDirIO}
import org.apache.spark.sql.functions._

/** Cluster-portable IO pair: HadoopMetaIO/HadoopTableIO must behave
  * identically to the Local/ParquetDir pair on local paths (the parity that
  * makes "swap one IO pair for a cluster deployment" a tested claim, not a
  * comment).
  */
class HadoopIoSpec extends SparkSpec {
  import spark.implicits._

  private val hMeta = new HadoopMetaIO()

  test("HadoopMetaIO primitives round-trip and match LocalMetaIO semantics") {
    val dir = Files.createTempDirectory("graft-hmeta").toString
    // mkdirs + exists
    hMeta.mkdirs(s"$dir/a/b")
    assert(hMeta.exists(s"$dir/a/b") && LocalMetaIO.exists(s"$dir/a/b"))
    // writeAtomic + readString, including overwrite of existing content
    hMeta.writeAtomic(s"$dir/a/x.json", """{"v":1}""")
    assert(hMeta.readString(s"$dir/a/x.json") == """{"v":1}""")
    assert(LocalMetaIO.readString(s"$dir/a/x.json") == """{"v":1}""")
    hMeta.writeAtomic(s"$dir/a/x.json", """{"v":2,"wider":true}""")
    assert(hMeta.readString(s"$dir/a/x.json") == """{"v":2,"wider":true}""")
    // no .tmp residue from the atomic publish
    assert(!hMeta.exists(s"$dir/a/x.json.tmp"))
    // list: names only, absent dir -> empty
    hMeta.writeAtomic(s"$dir/a/y.txt", "y")
    assert(hMeta.list(s"$dir/a").toSet == Set("b", "x.json", "y.txt"))
    assert(hMeta.list(s"$dir/nope").isEmpty)
    // createTempDir yields a fresh empty dir
    val t1 = hMeta.createTempDir("graft-hio")
    val t2 = hMeta.createTempDir("graft-hio")
    assert(t1 != t2 && hMeta.list(t1).isEmpty)
    // deleteRecursively removes trees and is a no-op on absent paths
    hMeta.deleteRecursively(s"$dir/a")
    assert(!hMeta.exists(s"$dir/a/x.json") && !hMeta.exists(s"$dir/a"))
    hMeta.deleteRecursively(s"$dir/a") // absent: must not throw
    hMeta.deleteRecursively(t1); hMeta.deleteRecursively(t2)
  }

  test("index lifecycle through the Hadoop pair == Local pair bit-for-bit") {
    def tok(rows: (Long, String)*) = graft.index.InvertedIndex.tokenize(
      rows.toDF("doc_id", "text"), "doc_id", "text")
    val base = Seq(0L -> "alpha beta gamma", 1L -> "alpha delta epsilon",
      2L -> "beta beta zeta", 3L -> "gamma alpha beta")
    val extra = Seq(4L -> "omega alpha", 5L -> "omega beta gamma")
    val batch = Seq(0L -> "alpha beta", 1L -> "omega gamma")

    def buildAndSearch(io: graft.io.TableIO, meta: graft.io.MetaIO): Set[(Long, Long, Double, Int)] = {
      val dir = Files.createTempDirectory("graft-hio-idx").toString
      graft.index.PackedIndex.build(tok(base: _*), dir, shardBits = 2,
        groups = 2, io = io, meta = meta)
      graft.index.PackedIndex.append(tok(extra: _*), dir, io = io, meta = meta)
      graft.query.IndexCache.invalidateAll()
      graft.query.Wand.search(spark, dir, batch, 10, meta = meta).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    val viaLocal = buildAndSearch(ParquetDirIO, LocalMetaIO)
    val viaHadoop = buildAndSearch(HadoopTableIO, hMeta)
    assert(viaHadoop == viaLocal && viaLocal.nonEmpty)
  }

  test("positional phrase/NEAR search through the Hadoop pair == local pair") {
    def tok(rows: (Long, String)*) = graft.index.InvertedIndex.tokenize(
      rows.toDF("doc_id", "text"), "doc_id", "text")
    val docs = Seq(0L -> "x table deep scan y table scan",
      1L -> "table scan query z", 2L -> "scan table q table scan query")
    def run(io: graft.io.TableIO, meta: graft.io.MetaIO) = {
      val dir = Files.createTempDirectory("graft-hio-pos").toString
      val t = tok(docs: _*)
      graft.index.PackedIndex.build(t, dir, shardBits = 2, groups = 1,
        io = io, meta = meta)
      graft.index.PositionalIndex.build(t, dir, io = io, meta = meta)
      graft.query.IndexCache.invalidateAll()
      def rows3(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      (rows3(graft.query.Phrase.topKPositional(spark, dir,
        Seq("table", "scan"), 10, io = io, meta = meta)),
        rows3(graft.query.Phrase.nearTopKPositional(spark, dir,
          Seq("table", "scan", "query"), slop = 4, k = 10, io = io, meta = meta)))
    }
    val viaLocal = run(ParquetDirIO, LocalMetaIO)
    val viaHadoop = run(HadoopTableIO, hMeta)
    assert(viaHadoop == viaLocal && viaLocal._1.nonEmpty && viaLocal._2.nonEmpty)
  }

  test("searchDs cleans stale hits through the TableIO boundary on a reused staging dir") {
    val dir = Files.createTempDirectory("graft-hio-ds").toString
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, 200, 4).toDF(), dir, shardBits = 6, groups = 2)
    val staging = Files.createTempDirectory("graft-hio-stage").toString
    // big batch: 30 queries over chunkSize 7 -> 5 chunk partitions land in hits/
    val big = Bench.queryBatch(30)
    val bigRows = graft.query.Wand.searchDs(spark, dir,
      big.toDF("query_id", "text"), 10, chunkSize = 7,
      io = HadoopTableIO, stagingDir = Some(staging)).collect()
    assert(bigRows.nonEmpty)
    // smaller reuse of the SAME staging dir: fewer chunks — any stale
    // hits/chunk=N partition from the big batch unioned into this result
    // would surface extra query_ids
    val small = Bench.queryBatch(15)
    val smallIds = graft.query.Wand.searchDs(spark, dir,
      small.toDF("query_id", "text"), 10, chunkSize = 7,
      io = HadoopTableIO, stagingDir = Some(staging))
      .select(col("query_id")).distinct().as[Long].collect().toSet
    val wantIds = small.map(_._1).toSet
    assert(smallIds.subsetOf(wantIds),
      s"stale chunk partitions leaked into the reused staging dir: ${smallIds -- wantIds}")
  }

  test("zero-idf terms (df == N/2) stay retrievable and count toward msm") {
    // N=4, df("even")=2 -> raw idf = ln(2.5) - ln(2.5) = 0 EXACTLY; the
    // eps floor only applies to NEGATIVE raw idf, so "even" scores 0 but
    // must still match (DuckDB tf-join oracle includes its docs; ES msm
    // counts any matched term)
    def tok(rows: (Long, String)*) = graft.index.InvertedIndex.tokenize(
      rows.toDF("doc_id", "text"), "doc_id", "text")
    val dir = Files.createTempDirectory("graft-zidf").toString
    graft.index.PackedIndex.build(
      tok(0L -> "even alpha", 1L -> "even beta", 2L -> "gamma delta",
        3L -> "epsilon zeta"),
      dir, shardBits = 2, groups = 1)
    val stats = graft.index.PackedIndex.readStats(dir)
    assert(stats.idf(2L) == 0.0, "fixture: df=N/2 must give idf exactly 0")
    graft.query.IndexCache.invalidateAll()
    // msm=2: doc 0 matches BOTH query terms (even counts despite idf 0)
    val msm = graft.query.Wand.search(spark, dir, Seq(0L -> "even alpha"), 10,
      minShouldMatch = 2).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(msm.keySet == Set(0L), s"msm=2 result: $msm")
    // the qualifying doc's score is the alpha contribution alone
    val alphaIdf = stats.idf(1L)
    val want = graft.core.Bm25.termScore(alphaIdf, 1L, 2L, stats.avgdl, stats.params)
    assert(msm(0L) == want)
    // plain retrieval: docs matched ONLY by the zero-idf term appear with
    // score 0.0 (the exhaustive-oracle semantics)
    val plain = graft.query.Wand.search(spark, dir, Seq(0L -> "even"), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(plain == Map(0L -> 0.0, 1L -> 0.0), s"plain zero-idf result: $plain")
  }
}
