package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SalesFixture
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and must be deterministic: ordered by an
  * explicit key and free of wall-clock/random values, so the driver's DuckDB
  * hash-compare is stable. Oracle SQL twins live in [[oracleSql]] with
  * matching column names and ORDER BY.
  */
object SparkEntry {

  /** Flagship pipeline (reference job end-to-end: dirty sales → F1→P1→P2→P3→P4)
    * on sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    SalesClean.clean(SalesFixture.fromLineitem(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SalesQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ EventQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ CurationQueries.queries ++
      WebQueries.queries

  def oracleSql: Map[String, String] =
    SalesQueries.oracle ++ RelationalQueries.oracle ++
      TextQueries.oracle ++ EventQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++
      MultimodalQueries.oracle ++ CurationQueries.oracle ++
      WebQueries.oracle
}
