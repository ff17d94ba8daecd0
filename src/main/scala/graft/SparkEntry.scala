package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QuerySpec
import graft.queries.{AnalyticsOps, EventOps, GeoOps, Relational, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY §2 is exposed here as a named query over the
  * driver testdata, paired (where SQL-expressible) with the exact DuckDB oracle
  * the driver hash-compares against. Query specs live next to their domain:
  * [[graft.queries.Relational]], [[graft.queries.EventOps]],
  * [[graft.queries.GeoOps]], [[graft.queries.TextOps]],
  * [[graft.queries.SimilarityOps]].
  */
object SparkEntry {

  def specs: Seq[QuerySpec] =
    Relational.all ++ EventOps.all ++ GeoOps.all ++ TextOps.all ++ SimilarityOps.all ++
      AnalyticsOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
