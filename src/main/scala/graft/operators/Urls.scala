package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL analysis for web-corpus pipelines: component extraction via
  * Spark's `parse_url` (codegen'd, scan-side) and the per-registered-
  * domain rollup that C4-style filtering ranks and blocklists by.
  *
  * 100 TB: `urlParts` is a narrow projection; `domainStats` is one
  * partial-aggregatable groupBy on the registered domain — domain
  * cardinality is web-scale small (~10^7), so the aggregate output
  * broadcasts back for filter decisions.
  */
object Urls {
  /** host / registered domain / path / one query parameter per row.
    * Registered domain = last two host labels (sufficient for .com-like
    * suffixes; a public-suffix list lookup slots in the same place).
    */
  def urlParts(docs: DataFrame, urlCol: String, idCol: String,
               param: String = "id"): DataFrame = {
    val host = parse_url(col(urlCol), lit("HOST"))
    docs.select(
      col(idCol).as("doc_id"),
      host.as("host"),
      substring_index(host, ".", -2).as("reg_domain"),
      parse_url(col(urlCol), lit("PATH")).as("path"),
      parse_url(col(urlCol), lit("QUERY"), lit(param)).as("q_param"))
  }

  /** Docs and token volume per registered domain. */
  def domainStats(parts: DataFrame, docsWithText: DataFrame,
                  textCol: String): DataFrame =
    parts.join(docsWithText.select(col("doc_id"),
        size(split(lower(col(textCol)), "\\s+")).as("n_tok")), "doc_id")
      .groupBy("reg_domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
}
