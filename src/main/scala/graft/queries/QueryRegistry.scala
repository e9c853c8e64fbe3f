package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregates every query group's `queries`/`oracle` maps into the single
  * registry exposed through [[graft.SparkEntry]]. */
object QueryRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    AggQueries.oracle ++ RelationalQueries.oracle ++ PipelineQueries.oracle
}
