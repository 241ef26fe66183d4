package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries: Spark implementation plus
  * (where SQL-expressible) the equivalent DuckDB oracle SQL. SparkEntry
  * concatenates all packs. */
final case class QueryPack(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String]) {
  def ++(other: QueryPack): QueryPack =
    QueryPack(queries ++ other.queries, oracles ++ other.oracles)
}

object QueryPack {
  val empty: QueryPack = QueryPack(Map.empty, Map.empty)
}
