package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared accessors for the driver test tables under an sf dir, plus the
  * tokenization used by oracle-checked queries.
  *
  * Oracle note: the DuckDB side tokenizes with
  * `list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')`; the Spark
  * side uses the same ASCII-regex split (codegen'd). Both equal Python
  * `str.split()` on ASCII-whitespace text (the synthetic corpora qualify);
  * the exact Unicode-parity splitter is [[graft.tokenize.PyTokenize.split]]
  * and is exercised by the ScalaTest vectors instead (not SQL-expressible).
  */
object DocsCorpus {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  /** (doc_id, terms) for the documents table. exact=false: these queries
    * are DuckDB-oracle-checked, so tokenization must equal the oracle's
    * regexp_split (identical to the exact tokenizer on this ASCII corpus,
    * but the contract is pinned to the regex form).
    */
  def tokenized(spark: SparkSession, sfDir: String): DataFrame =
    graft.index.InvertedIndex.tokenize(documents(spark, sfDir), "doc_id", "text",
      exact = false)

  /** The fixed benchmark/oracle query-term battery (present in the synthetic
    * vocabulary at every sf; includes a term absent from the corpus).
    */
  val fixedQuery: Seq[String] = Seq("spark", "table", "query", "vector", "zzz_absent")

  /** A small deterministic multi-query batch derived from the corpus vocab. */
  def fixedQueryBatch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "spark table query"),
      (2L, "fast scan filter value"),
      (3L, "window agg group sort"),
      (4L, "customer stream zzz_absent"),
      (5L, "the a big small slow")
    ).toDF("query_id", "text")
  }

  /** SQL fragment shared by all DuckDB oracles that need the tokenized
    * corpus, document lengths, corpus stats, postings, df and eps-floored
    * idf. Kept as one WITH-prefix so every oracle states identical
    * semantics.
    */
  val oracleCorpusCtes: String =
    """WITH tok AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS terms
      |  FROM documents
      |),
      |dl AS (SELECT doc_id, CAST(len(terms) AS BIGINT) AS dl FROM tok),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
      |post AS (SELECT doc_id, unnest(terms) AS term FROM tok),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM post GROUP BY 1, 2),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |rawidf AS (SELECT term, df, ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS raw_idf FROM df),
      |eps AS (SELECT 0.25 * avg(raw_idf) AS e FROM rawidf),
      |idf AS (SELECT term, df, CASE WHEN raw_idf < 0 THEN (SELECT e FROM eps) ELSE raw_idf END AS idf FROM rawidf),
      |q(term) AS (VALUES ('spark'), ('table'), ('query'), ('vector'), ('zzz_absent')),
      |qt AS (SELECT term, CAST(count(*) AS BIGINT) AS q_mult FROM q GROUP BY 1)
      |""".stripMargin

  /** Same CTE chain but over a row-filtered corpus — every derived stat
    * (n, avgdl, df, eps floor) is recomputed over the filtered docs,
    * exactly the semantics of an index built (or compacted) over that
    * subset. `where` is a SQL predicate over the documents columns.
    */
  def oracleCorpusCtesWhere(where: String): String = {
    val out =
      oracleCorpusCtes.replace("  FROM documents\n", s"  FROM documents WHERE $where\n")
    // fail loudly if a reformat of oracleCorpusCtes breaks the anchor — a
    // silent no-op would hand the caller full-corpus stats
    require(out != oracleCorpusCtes,
      "oracleCorpusCtesWhere: anchor '  FROM documents' not found in oracleCorpusCtes")
    out
  }
}
