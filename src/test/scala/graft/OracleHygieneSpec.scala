package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL hygiene: every `round(...)` in the DuckDB oracle SQL must be
  * followed by `+ 0.0`.
  *
  * Why: DuckDB's `round()` on DOUBLE preserves IEEE `-0.0`, while Spark's
  * `round` goes through BigDecimal and normalizes it to `+0.0`. The driver
  * hash-compares the textual/binary representation, so a single `-0.0` cell
  * fails the whole query (this cost q_segment_mean and q_pooling two rounds).
  * `round(x, n) + 0.0` maps `-0.0` to `+0.0` under IEEE round-to-nearest
  * without changing any other value; `* 1.0` does NOT (it preserves the sign
  * bit). Rather than rely on the data never producing a negative underflow,
  * this spec makes the guard structural: any rounded oracle column missing
  * the normalizer fails the build.
  */
class OracleHygieneSpec extends AnyFunSuite {

  /** Index just past the paren that closes the `round(` opened at `open`. */
  private def closeOf(sql: String, open: Int): Int = {
    var depth = 1
    var i = open + 1
    while (i < sql.length && depth > 0) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, s"unbalanced parens after offset $open")
    i
  }

  test("every oracle round() is -0.0-normalized with '+ 0.0'") {
    val normalizer = """\s*\+\s*0\.0""".r
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      open <- "round\\(".r.findAllMatchIn(sql).map(_.end - 1)
      after = sql.substring(closeOf(sql, open))
      if normalizer.findPrefixOf(after).isEmpty
    } yield s"$name @offset $open: ...${sql.slice(math.max(0, open - 30), open + 40)}..."
    assert(offenders.isEmpty,
      s"oracle round() without '+ 0.0' normalizer:\n${offenders.mkString("\n")}")
  }

  test("oracle map covers exactly the SQL-expressible queries") {
    // every oracle key must have a query; rows-only queries are the known trio
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    val rowsOnly = qs -- os
    assert(rowsOnly == Set("q_pages_wand", "q_ann_ivf_topk",
      "q_ann_ivf_sweep", "q_ann_ivf_clustered", "q_ann_ivf_persisted",
      "q_multimodal_features"),
      s"unexpected rows-only set: $rowsOnly")
  }
}
