package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Queries => Q}

/**
 * Driver contract (see SURVEY.md §7 + the builder prompt): one flagship
 * query, the per-operator query catalog, and the DuckDB oracle SQL for every
 * SQL-expressible entry. The catalog itself lives in
 * [[graft.queries.Queries]].
 */
object SparkEntry {

  /** Flagship (SURVEY §7.2): PageRank over the PP package graph mined from
    * the synthetic repo-file table at sf=0.001 scale. */
  def entry(spark: SparkSession): DataFrame =
    Q.minedPageRank(spark, "sf0.001", iters = 10, topK = 20)

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.9 graft
    * extensions and the training-data-pipeline operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Q.queries

  /** DuckDB-runnable ANSI SQL equivalents, column-name and type aligned. */
  def oracleSql: Map[String, String] = Q.oracleSql
}
