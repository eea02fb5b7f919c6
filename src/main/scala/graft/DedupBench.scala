package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dedup-family throughput at the ScalingBench corpus scale (2M pages),
  * xxhash64 production family, with explicit dropped-hot-bucket accounting
  * (the "log what was dropped" rule: a frequency cap silently bounds
  * candidate generation, so the artifact must show HOW MUCH it dropped).
  *
  * Usage: runMain graft.DedupBench <pagesPath> [cores]
  * Emits one JSON line per family: wall seconds, docs/sec, pair counts, and
  * (buckets_dropped, rows_dropped) for each capped bucketing stage. Drop
  * accounting runs OUTSIDE the timed section (it is evidence, not part of
  * the operator).
  *
  * Parameter note: the synthetic corpus draws from a ~5k-word vocabulary,
  * far denser than real web text, so shingles are less discriminative than
  * the real-world case. 5-gram shingles + a tight frequency cap is the
  * web-realistic operating point (real 5-gram shingles are near-unique);
  * the drop columns make the cap's effect visible instead of hidden.
  */
object DedupBench {

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val cores = if (args.length > 1) args(1) else "32"
    // which families to run (comma list) — reruns after a failed family
    // skip the completed ones
    val families: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set("exact", "minhash", "simhash", "simhash_wide", "jaccard",
        "embed", "components")
    Bench.cleanOwnScratch() // never measure under prior runs' scratch pressure
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      // x4 over-decomposition keeps per-task shuffle state small on the
      // shingle-join stages (memory headroom matters more than task count)
      .config("spark.sql.shuffle.partitions", cores.toInt * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val calib0 = Bench.calibMops()
    // stage extracted text once (same shape as the index build's docs_raw);
    // dedup operators time AGAINST THE STAGED TABLE — extraction is the
    // build pipeline's cost, benched separately
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedupbench").toString
    val docsPath = s"$tmp/docs"
    val (extractSec, _) = timed {
      corpus.PagesPipeline.docs(spark.read.parquet(pagesPath))
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
    val nDocs = docs.count()

    def line(name: String, sec: Double, extra: String): Unit =
      println(s"""{"family":"$name","sec":${f"$sec%.2f"},"docs_per_sec":${f"${nDocs / sec}%.0f"},$extra,"n_docs":$nDocs}""")

    val shingleN = 5
    val simCap = 200

    if (families("exact")) {
      val (exactSec, nDup) = timed {
        Dedup.exact(docs).filter(col("doc_id") =!= col("canonical_id")).count()
      }
      line("exact", exactSec, s""""dup_rows":$nDup""")
    }

    if (families("minhash")) {
      // MinHash + LSH (xx family), 5-gram shingles
      val minhashCap = 200
      val (mhSec, mhPairs) = timed {
        Dedup.minhashLshPairs(docs, shingleN = shingleN, numHashes = 16,
          bands = 8, maxBucketSize = minhashCap, family = Dedup.XxFamily).count()
      }
      // drop accounting (untimed): band buckets over the cap
      val mhSig = Dedup.minhashSignatures(
        Dedup.shingles(docs, shingleN), 16, Dedup.XxFamily)
      val mhBuckets = mhSig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(7)),
          b => xxhash64(b, slice(col("sig"), b * lit(2) + lit(1), lit(2))))))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("bsz"))
      val mhDrop = mhBuckets.filter(col("bsz") > minhashCap)
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("bsz")), lit(0L))).first()
      line("minhash_lsh_xx", mhSec,
        s""""pairs":$mhPairs,"bucket_cap":$minhashCap,"buckets_dropped":${mhDrop.getLong(0)},"rows_dropped":${mhDrop.getLong(1)}""")
    }

    if (families("simhash")) {
      // SimHash fingerprints + chunk-bucket near-dup pairs (xx family)
      val (shSec, shPairs) = timed {
        Dedup.simhashPairs(docs, maxHamming = 3, maxBucketSize = simCap,
          family = Dedup.XxFamily).count()
      }
      val shChunks = Dedup.simhash(docs, family = Dedup.XxFamily)
        .select(col("doc_id"), posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 15).bitwiseAND(0x7FFFL)): _*)))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("bsz"))
      val shDrop = shChunks.filter(col("bsz") > simCap)
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("bsz")), lit(0L))).first()
      line("simhash_pairs_xx", shSec,
        s""""pairs":$shPairs,"bucket_cap":$simCap,"buckets_dropped":${shDrop.getLong(0)},"rows_dropped":${shDrop.getLong(1)}""")
    }

    if (families("simhash_wide")) {
      // WIDE SimHash (120-bit print, 30-bit chunk keys): the chunk key
      // space tracks log2(N), so bucket drops collapse vs the 60-bit form
      // at this scale — the 100 TB operating point
      val (shwSec, shwPairs) = timed {
        Dedup.simhashPairsWide(docs, maxHamming = 3, maxBucketSize = simCap).count()
      }
      val shwChunks = Dedup.simhashWide(docs)
        .select(col("doc_id"), posexplode(array((0 until 4).map { c =>
          val word = element_at(col("simhash"), c / 2 + 1)
          shiftright(word, (c % 2) * 30).bitwiseAND((1L << 30) - 1)
        }: _*)))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("bsz"))
      val shwDrop = shwChunks.filter(col("bsz") > simCap)
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("bsz")), lit(0L))).first()
      line("simhash_pairs_wide_xx", shwSec,
        s""""pairs":$shwPairs,"bucket_cap":$simCap,"buckets_dropped":${shwDrop.getLong(0)},"rows_dropped":${shwDrop.getLong(1)}""")
    }

    if (families("jaccard")) {
      // n-gram Jaccard pairs: rare-shingle equi-join, tight web-realistic
      // cap, HASHED shingle keys (the string form's shuffle OOM-ed at 2M)
      val jacCap = 50
      val (jacSec, jacPairs) = timed {
        Dedup.jaccardPairs(docs, n = shingleN, threshold = 0.5,
          maxShingleFreq = jacCap, hashedShingles = true).count()
      }
      val jacFreq = Dedup.shingles(docs, shingleN)
        .select(xxhash64(col("shingle")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("freq"))
      val jacDrop = jacFreq.filter(col("freq") > jacCap)
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("freq")), lit(0L))).first()
      val jacTotal = jacFreq.agg(count(lit(1)), sum(col("freq"))).first()
      line("jaccard_pairs_hashed", jacSec,
        s""""pairs":$jacPairs,"shingle_cap":$jacCap,"shingles_dropped":${jacDrop.getLong(0)},"instances_dropped":${jacDrop.getLong(1)},"shingles_total":${jacTotal.getLong(0)},"instances_total":${jacTotal.getLong(1)}""")
    }

    if (families("embed")) {
      // Embedding near-dup at corpus scale. The pages corpus has no real
      // embedding column, so one is SYNTHESIZED deterministically from the
      // text (16-dim hashed random projection: one xxhash64 per token, dim i
      // sums +-1 by bit i of the digest — template-near-dup docs get
      // near-identical vectors, the shape the operator exists for). The
      // embedding build is untimed staging; the timed section is the
      // capped multi-table sign-LSH candidate join + exact cosine re-check.
      val dims = 16
      val embPath = s"$tmp/emb"
      val toks = graft.tokenize.PyTokenize.asciiSplit(lower(col("text")))
      val sums = (0 until dims).map(i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1.0)
          .otherwise(-1.0)).as(s"d$i"))
      docs.select(col("doc_id"), explode(toks).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
        .groupBy(col("doc_id"))
        .agg(sums.head, sums.tail: _*)
        .select(col("doc_id").as("vec_id"),
          array((0 until dims).map(i => col(s"d$i")): _*).as("embedding"))
        .write.mode("overwrite").parquet(embPath)
      val emb = spark.read.parquet(embPath)
      val nVec = emb.count()
      val embCap = 200
      val embTables = 8
      val bits = Dedup.signLshBits(nVec)
      val (embSec, embPairs) = timed {
        Dedup.embeddingCosinePairs(emb, threshold = 0.9,
          maxBucketSize = embCap, numTables = embTables, bits = bits).count()
      }
      // drop accounting (untimed): (table, bucket) groups over the cap —
      // same bucketing code the operator ran
      val v = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      val embBuckets = Dedup.embeddingLshBuckets(v, bits, embTables)
        .groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("bsz"))
      val embDrop = embBuckets.filter(col("bsz") > embCap)
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("bsz")), lit(0L))).first()
      println(s"""{"family":"embed_neardup_lsh","sec":${f"$embSec%.2f"},"vecs_per_sec":${f"${nVec / embSec}%.0f"},"pairs":$embPairs,"lsh_bits":$bits,"num_tables":$embTables,"bucket_cap":$embCap,"buckets_dropped":${embDrop.getLong(0)},"rows_dropped":${embDrop.getLong(1)},"n_vecs":$nVec}""")
    }

    if (families("components")) {
      // pairs -> clusters -> canonical survivors: large-star/small-star
      // connected components over the wide-simhash pair graph (the at-scale
      // near-dup family), then survivor accounting — the dedup OUTPUT step.
      // Pairs are staged untimed (their generation is the simhash_wide
      // family's own row); the timed section is the component computation.
      val pairsPath = s"$tmp/cc-pairs"
      Dedup.simhashPairsWide(docs, maxHamming = 3, maxBucketSize = simCap)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(pairsPath)
      val pairs = spark.read.parquet(pairsPath)
      val nPairs = pairs.count()
      val (ccSec, labels) = timed {
        val l = Dedup.connectedComponents(pairs).localCheckpoint()
        l.count()
        l
      }
      val acct = labels.agg(count(lit(1)),
        countDistinct(col("component_id"))).first()
      val nMembers = acct.getLong(0)
      val nClusters = acct.getLong(1)
      println(s"""{"family":"components","sec":${f"$ccSec%.2f"},"docs_per_sec":${f"${nDocs / ccSec}%.0f"},"pairs":$nPairs,"paired_docs":$nMembers,"clusters":$nClusters,"docs_removed":${nMembers - nClusters},"n_docs":$nDocs}""")
    }

    val calib1 = Bench.calibMops()
    println(s"""{"family":"meta","extract_sec":${f"$extractSec%.2f"},"n_docs":$nDocs,"cpu_calib_start_mops":${f"$calib0%.0f"},"cpu_calib_end_mops":${f"$calib1%.0f"}}""")
    spark.stop()
  }
}
