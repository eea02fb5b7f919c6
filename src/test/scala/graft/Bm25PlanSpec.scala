package graft

import graft.plans.Bm25TopKPlan
import graft.query.Wand
import java.nio.file.Files

/** The strategy-planned WAND operator must be plan-visible and
  * bit-identical to the library path.
  */
class Bm25PlanSpec extends SparkSpec {

  test("Bm25TopKPlan.search == Wand.search, and the exec shows in the plan") {
    val dir = Files.createTempDirectory("graft-planop").toString
    corpus.PagesPipeline.buildIndex(
      corpus.PagesGen.pages(spark, 300, 4).toDF(), dir, shardBits = 7, groups = 2)
    val queries = Seq(1L -> "the w3 w17", 2L -> "w100 w2000", 3L -> "absent_only")

    val viaPlan = Bm25TopKPlan.search(spark, dir, queries, 10)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    val a = rows(viaPlan) // execute first so AQE finalizes the plan
    val planStr = viaPlan.queryExecution.executedPlan.toString
    assert(planStr.contains("Bm25TopK"), planStr.take(600))
    val b = rows(Wand.search(spark, dir, queries, 10))
    assert(a == b, "plan-integrated operator diverged from library path")
    assert(a.nonEmpty)
  }
}
