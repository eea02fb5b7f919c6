package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.SpellCorrect

/** Throughput probe for the query-assist family over a LARGE synthetic
  * dictionary (the contract corpus's vocabulary is tiny; a web-scale term
  * dictionary is millions of distinct tokens — typos, ids, domains):
  *
  *   1. stage a deterministic (term, df) dictionary of `vocab` unique terms
  *      (hash-derived 8-13 char word-shapes, zipf-ish dfs);
  *   2. build + persist the SymSpell deletion index (the offline artifact
  *      that ships beside the packed index) — one explode + one capped
  *      window over (variant), all distributed;
  *   3. serve a typo'd suggest batch (one seeded edit per query term:
  *      insert/delete/substitute) against the PERSISTED index, and an
  *      expandBatch (fuzzy-rewrite) pass over the same batch.
  *
  * Run at two core counts for the north-rule scaling evidence — every
  * phase is a scan + broadcast-join + partial-agg plan with no driver
  * loop, so throughput should track cores.
  *
  * Usage: runMain graft.SpellProbe [vocab] [cores] [nQueries] [stageDir]
  */
object SpellProbe {

  private val Letters = "abcdefghijklmnopqrstuvwxyz"

  /** Unique word-shaped term for an id: 3-8 hashed chars + the id in
    * base-26 (uniqueness by construction — collisions would silently
    * shrink the vocabulary).
    */
  private def term(id: Long): String = {
    var x = id * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    def next(): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      ((x >>> 33) & 0x7fffffff).toInt
    }
    val sb = new java.lang.StringBuilder(14)
    val n = 3 + next() % 6
    var i = 0
    while (i < n) { sb.append(Letters(next() % 26)); i += 1 }
    var rest = id
    do { sb.append(Letters((rest % 26).toInt)); rest /= 26 } while (rest > 0)
    sb.toString
  }

  /** One seeded edit of a term (the typo'd query side). */
  private def typo(t: String, seed: Long): String = {
    var x = seed * 0xD6E8FEB86659FD93L + 1
    def next(): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      ((x >>> 33) & 0x7fffffff).toInt
    }
    val pos = next() % t.length
    (next() % 3) match {
      case 0 => t.substring(0, pos) + Letters(next() % 26) + t.substring(pos) // insert
      case 1 if t.length > 1 => t.substring(0, pos) + t.substring(pos + 1)     // delete
      case _ => t.substring(0, pos) + Letters(next() % 26) + t.substring(pos + 1) // substitute
    }
  }

  def main(args: Array[String]): Unit = {
    val vocab = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = args.lift(1).getOrElse("32")
    val nQueries = args.lift(2).map(_.toInt).getOrElse(2000)
    val stageDir = args.lift(3).getOrElse("/dev/shm/graft-tmp/spellprobe")
    val spark = SparkSession.builder().master(s"local[$cores]")
      // over-decomposed x4: the pack window's shuffle stage is
      // compute-bound per row, and straggler smoothing needs more splits
      // than cores (same tuning as the packed-index build)
      .config("spark.sql.shuffle.partitions", cores.toInt * 4)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .appName("graft-spell-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val calib0 = Bench.calibMops()

    // dictionary: unique terms, zipf-ish dfs; FIXED partition count so
    // every core level reads identical input splits
    val dictPath = s"$stageDir/dict-$vocab"
    val fs = new org.apache.hadoop.fs.Path(dictPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dictPath/_SUCCESS")))
      spark.range(vocab)
        .repartition(64)
        .map(id => (term(id), vocab / (id + 1))) // zipf-ish df by id rank
        .toDF("term", "df")
        .write.mode("overwrite").parquet(dictPath)
    val dict = spark.read.parquet(dictPath)
    // term() aims for uniqueness (hashed prefix + base-26 id suffix) but a
    // variable-length prefix is not provably injective — fail loudly
    // instead of silently benchmarking a shrunken vocabulary (verified
    // collision-free at 2M; this pins larger vocab args)
    val distinctTerms = dict.select(col("term")).distinct().count()
    require(distinctTerms == vocab,
      s"SpellProbe: term() collided — $distinctTerms distinct of $vocab")

    // offline: fused one-shuffle build (range-clustered + sorted by
    // variant so small-batch pushdown prunes row groups)
    val idxPath = s"$stageDir/didx-$vocab-$cores"
    val t0 = System.nanoTime()
    SpellCorrect.buildDeletionIndex(dict, idxPath)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val didx = spark.read.parquet(idxPath)
    val variants = didx.count()

    // serving: typo'd suggest batch against the persisted index
    val queries = (0 until nQueries).map { i =>
      // sample across the df range deterministically
      val id = (i.toLong * 0x9E3779B97F4A7C15L >>> 33) % vocab
      (i.toLong, typo(term(id), seed = i + 7L))
    }
    def runSuggest(): Long =
      SpellCorrect.suggest(queries.toDF("query_id", "term"), didx, k = 5).count()
    def runExpand(): Long =
      SpellCorrect.expandBatch(spark,
        queries.map { case (id, t) => id -> Seq(t) }, didx).size.toLong
    runSuggest(); runExpand() // warm
    var bestS = Double.MaxValue; var rowsS = 0L
    var bestE = Double.MaxValue; var rowsE = 0L
    for (_ <- 1 to 3) {
      val t1 = System.nanoTime(); rowsS = runSuggest()
      bestS = math.min(bestS, (System.nanoTime() - t1) / 1e9)
      val t2 = System.nanoTime(); rowsE = runExpand()
      bestE = math.min(bestE, (System.nanoTime() - t2) / 1e9)
    }
    // interactive arm: an 8-term batch rides the variant-IN pushdown into
    // the range-clustered scan (row-group pruning) — the did-you-mean
    // latency path. Verified structurally: the plan must carry the In
    // predicate at the parquet scan.
    val small = queries.take(8)
    val smallDf = SpellCorrect.suggest(
      small.toDF("query_id", "term"), didx, k = 5)
    val planStr = smallDf.queryExecution.executedPlan.toString
    require(planStr.contains("In(variant"),
      s"interactive suggest plan lost the variant pushdown:\n$planStr")
    var bestI = Double.MaxValue; var rowsI = 0L
    for (_ <- 1 to 5) {
      val t3 = System.nanoTime()
      rowsI = SpellCorrect.suggest(
        small.toDF("query_id", "term"), didx, k = 5).count()
      bestI = math.min(bestI, (System.nanoTime() - t3) / 1e9)
    }
    val calib1 = Bench.calibMops()
    println(f"[spellprobe] vocab=$vocab cores=$cores variants=$variants " +
      f"build=$buildSec%.1fs nq=$nQueries " +
      f"suggest_best=$bestS%.2fs suggest_qps=${nQueries / bestS}%.0f rows=$rowsS " +
      f"expand_best=$bestE%.2fs expand_qps=${nQueries / bestE}%.0f hit=$rowsE " +
      f"interactive8_best=$bestI%.3fs rows=$rowsI " +
      f"calib=${calib0}%.0f/${calib1}%.0f")
    require(rowsS > 0 && rowsE > 0 && rowsI > 0,
      "spell probe found no suggestions")
    spark.stop()
  }
}
