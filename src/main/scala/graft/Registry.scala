package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL text the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases must match between the two — the
  * driver sorts columns by name and hashes values.
  *
  * Determinism rules for oracle parity (applied throughout):
  *  - money/double aggregates are summed as `decimal(18,2)` per-element
  *    casts (exact, associative — immune to float summation-order drift
  *    between Spark's partial aggregation and DuckDB's);
  *  - every query with a LIMIT carries a total deterministic ORDER BY
  *    (unique-key tiebreaker);
  *  - double ratios are `round(x, 4)` on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  /** All registered queries, in registration order. */
  def all: Seq[Q] =
    reports.Reports.qs ++
      reports.Tpch.qs ++
      reports.Reshape.qs ++
      operators.FilterQueries.qs ++
      etl.EtlQueries.qs ++
      text.TextQueries.qs ++
      streaming.EventQueries.qs ++
      similarity.SimilarityQueries.qs ++
      multimodal.MultimodalQueries.qs ++
      dsl.SearchQueries.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
